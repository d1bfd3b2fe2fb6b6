"""Mesh construction, sharding rules, and distributed bring-up."""

from .mesh import (  # noqa: F401
    MODEL_PARALLEL_RULES,
    distributed_init,
    make_mesh,
    params_sharding,
    replicated,
    shard_tree,
    state_sharding,
)
