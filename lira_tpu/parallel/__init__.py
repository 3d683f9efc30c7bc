from .mesh import make_mesh
from .train_dp import make_dp_train_step, dp_train_epoch
from .sharded_engine import ShardedQueryEngine

__all__ = ["make_mesh", "make_dp_train_step", "dp_train_epoch", "ShardedQueryEngine"]
