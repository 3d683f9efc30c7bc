from .probing_mlp import init_params, forward, param_count
from .train import TrainState, make_train_state, train_epoch, evaluate, infer
from .metrics import probing_metrics

__all__ = [
    "init_params",
    "forward",
    "param_count",
    "TrainState",
    "make_train_state",
    "train_epoch",
    "evaluate",
    "infer",
    "probing_metrics",
]
