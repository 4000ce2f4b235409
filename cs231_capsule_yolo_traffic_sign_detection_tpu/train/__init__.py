from .plateau import ReduceLROnPlateau  # noqa: F401
from .checkpoint import save_checkpoint, load_checkpoint  # noqa: F401
from .steps import TrainState, make_train_step, make_eval_step, init_state  # noqa: F401
from .driver import train_and_evaluate  # noqa: F401
