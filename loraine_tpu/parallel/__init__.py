from . import distributed
from .mesh import auto_mesh, make_mesh, shard_problem, shard_state

__all__ = ["auto_mesh", "make_mesh", "shard_problem", "shard_state", "distributed"]
