"""Experiment hyper-parameter container.

Same JSON-per-experiment schema as the reference (utils.py:14-31,
experiments/*/params.json), merged with CLI overrides in the driver
(reference main.py:227-241).  Unlike the reference — which mutates the
params object from inside the loss as a side channel for avg_iou
(reference loss_fns.py:141) — our losses return auxiliary outputs, so
Params stays a plain, picklable config bag.
"""

import json


class Params:
    """Loads hyperparameters from a JSON file into attributes.

    Reference parity: utils.py:14-31 (`Params`).
    """

    def __init__(self, json_path=None, **kwargs):
        if json_path is not None:
            with open(json_path) as f:
                self.__dict__.update(json.load(f))
        self.__dict__.update(kwargs)

    def save(self, json_path):
        with open(json_path, "w") as f:
            json.dump(self._jsonable(), f, indent=4)

    def update(self, json_path):
        with open(json_path) as f:
            self.__dict__.update(json.load(f))

    def _jsonable(self):
        out = {}
        for k, v in self.__dict__.items():
            try:
                json.dumps(v)
                out[k] = v
            except TypeError:
                pass  # skip non-serializable runtime attachments
        return out

    @property
    def dict(self):
        return self.__dict__

    def get(self, key, default=None):
        return self.__dict__.get(key, default)

    def __contains__(self, key):
        return key in self.__dict__

    def __repr__(self):
        return "Params(" + ", ".join(
            f"{k}={v!r}" for k, v in sorted(self._jsonable().items())
        ) + ")"
