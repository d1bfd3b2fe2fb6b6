"""Device mesh construction + sharding rules.

The reference has no distributed layer at all -- scale came from running N
plugin instances on N DAW tracks (SURVEY.md 2.6).  The TPU framework's
scaling axes:

  'streams'  data parallelism over concurrent utterance streams: every
             [capacity, ...] state/IO leaf shards here.  This is the core
             axis (thousands of independent streams, zero cross-stream
             communication -- collectives only appear if XLA needs them for
             replicated-weight gradient sums in training).
  'model'    tensor parallelism for weight matrices when they exceed one
             chip's HBM headroom: matmul-sharded via PartitionSpec rules
             below; XLA inserts the (reduce-)scatter/all-gather collectives
             over ICI.

Multi-host: `distributed_init` wraps `jax.distributed.initialize`; the mesh
spans all processes' devices, stream slots land host-local by construction
(jax.make_mesh orders devices process-major), so audio ingest never crosses
DCN.

Pipeline parallelism across the three sub-models is deliberately absent:
the whole chain is ~10 MFLOP/frame/stream, far below one chip -- fusing it
into one program (no pipeline bubbles, no inter-stage transfers) is the
performant design (SURVEY.md 2.6).  Sequence parallelism is likewise
unnecessary for streaming (state is O(1) scan carries); for offline long
utterances, chunked scan with carry handoff covers it (runtime/offline.py).
"""

from __future__ import annotations

import re

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def force_cpu_host_devices(n: int) -> bool:
    """Best-effort in-process switch to the CPU host platform with >= n
    virtual devices.  Returns True on success.

    Constraint (jax 0.9): XLA_FLAGS is parsed once at first backend
    initialization, so this only works if either (a) no backend has been
    initialized yet, or (b) the flag was already in the environment when
    the first backend initialized.  Callers that cannot guarantee that
    must re-exec in a subprocess instead (see __graft_entry__).
    """
    import os

    flag = f"--xla_force_host_platform_device_count={n}"
    if flag not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " " + flag).strip()
    import jax.extend.backend as jax_backend

    jax.config.update("jax_platforms", "cpu")
    try:
        jax_backend.clear_backends()
    except Exception:
        return False
    return len(jax.devices()) >= n


def distributed_init(coordinator_address=None, num_processes=None, process_id=None):
    """Multi-host bring-up (call once per host before device use)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def make_mesh(streams: int = None, model: int = 1, devices=None) -> Mesh:
    """Build a ('streams', 'model') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if streams is None:
        streams = n // model
    if streams * model != n:
        raise ValueError(f"mesh {streams}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(streams, model)
    return Mesh(arr, ("streams", "model"))


# Weight partition rules for tensor parallelism: path regex -> PartitionSpec.
# Column-parallel on expanding matmuls, row-parallel on contracting ones
# (Megatron-style pairing keeps a single psum per block).  Anything unmatched
# is replicated.
MODEL_PARALLEL_RULES = (
    (r"mlp_in/w$", P(None, "model")),
    (r"mlp_in/b$", P("model")),
    (r"mlp_out/w$", P("model", None)),
    (r"up/\d+/conv/w$", P(None, None, "model")),
    (r"up/\d+/conv/b$", P("model")),
    (r"pitch_emb$", P(None, "model")),
    (r"logits/w$", P(None, "model")),
    (r"logits/b$", P("model")),
)


def _tree_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    paths = []
    for keypath, leaf in flat:
        parts = []
        for k in keypath:
            if hasattr(k, "key"):
                parts.append(str(k.key))
            elif hasattr(k, "idx"):
                parts.append(str(k.idx))
            else:
                parts.append(str(k))
        paths.append(("/".join(parts), leaf))
    return paths, treedef


def params_sharding(params, mesh: Mesh, rules=MODEL_PARALLEL_RULES,
                    model_parallel: bool = False):
    """Pytree of NamedShardings for model weights.

    With model_parallel=False (the default: weights are ~5M params, far
    under HBM), everything replicates.  With True, the rules above shard
    the big matmuls over the 'model' axis.
    """
    paths, treedef = _tree_paths(params)
    shardings = []
    for path, leaf in paths:
        spec = P()
        if model_parallel:
            for pattern, p in rules:
                if re.search(pattern, path):
                    # only shard if the dimension divides evenly
                    axis_sizes = mesh.shape
                    ok = True
                    for dim, name in enumerate(p):
                        if name is not None and leaf.shape[dim] % axis_sizes[name]:
                            ok = False
                    if ok:
                        spec = p
                    break
        shardings.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, shardings)


def state_sharding(state, mesh: Mesh, capacity: int | None = None):
    """Per-stream state: leaves whose stream axis is divisible by the mesh
    are sharded over 'streams'; shared tables (the KV slot bank, anything
    not divisible) replicate.  With `capacity`, the stream axis is the
    first axis whose size equals it (ring-major conv states [R, B, C] put
    the stream axis second -- layers.causal_conv_state); without, the
    legacy leading-axis heuristic applies."""
    ns = mesh.shape["streams"]

    def rule(path, leaf):
        shared = any(
            getattr(p, "key", None) == "kv_slots" for p in path
        )
        if shared or leaf.ndim < 1:
            return NamedSharding(mesh, P())
        if capacity is not None:
            for axis, size in enumerate(leaf.shape):
                if size == capacity and size % ns == 0:
                    spec = [None] * leaf.ndim
                    spec[axis] = "streams"
                    return NamedSharding(mesh, P(*spec))
            return NamedSharding(mesh, P())
        if leaf.shape[0] >= ns and leaf.shape[0] % ns == 0:
            return NamedSharding(mesh, P("streams", *([None] * (leaf.ndim - 1))))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, state)


def replicated(tree, mesh: Mesh):
    return jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), tree)


def shard_tree(tree, shardings):
    """Place a pytree according to a sharding pytree."""
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)
