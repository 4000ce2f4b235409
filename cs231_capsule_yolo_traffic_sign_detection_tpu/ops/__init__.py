from . import boxes  # noqa: F401
from . import polar  # noqa: F401
from . import capsule  # noqa: F401
from . import decode  # noqa: F401
