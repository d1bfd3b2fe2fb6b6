"""Mesh construction, sharding rules, and distributed bring-up."""

from .mesh import (  # noqa: F401
    MODEL_PARALLEL_RULES,
    distributed_init,
    force_cpu_host_devices,
    make_mesh,
    params_sharding,
    replicated,
    shard_tree,
    state_sharding,
)
