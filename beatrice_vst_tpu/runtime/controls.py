"""Per-stream control tensors + host-side staging.

The reference stages host parameter changes in `unreflected_params_` and
drains them at the top of each audio callback
(`/root/reference/src/vst/processor.cc:104-127,143-161`).  The batched
equivalent: every control is a [capacity]-shaped device tensor; host-side
edits accumulate in a `ControlStage` and are applied before the next tick
as one jitted scatter per field -- thousands of per-stream knobs cost one
fused update regardless of how many streams changed.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..constants import MAX_N_SPEAKERS, SPH_AVG_MAX_N_SPEAKERS, VersionSpec


def init_controls(spec: VersionSpec, capacity: int):
    """Default control tensors (defaults mirror kSchema,
    parameter_schema.cc:229-424)."""
    b = (capacity,)
    return {
        "active": jnp.zeros(b, jnp.bool_),
        "target_speaker": jnp.zeros(b, jnp.int32),
        "formant_index": jnp.full(b, 4, jnp.int32),  # formant 0.0 -> slot 4
        "pitch_shift": jnp.zeros(b, jnp.float32),
        "average_source_pitch": jnp.full(b, 52.0, jnp.float32),
        "intonation_intensity": jnp.ones(b, jnp.float32),
        "pitch_correction": jnp.zeros(b, jnp.float32),
        "pitch_correction_type": jnp.zeros(b, jnp.int32),
        "min_q": jnp.ones(b, jnp.int32),
        "max_q": jnp.full(b, spec.pitch_bins - 1, jnp.int32),
        "vq_num_neighbors": jnp.zeros(b, jnp.int32),
        "input_gain_db": jnp.zeros(b, jnp.float32),
        "output_gain_db": jnp.zeros(b, jnp.float32),
        "morph_weights": jnp.zeros((capacity, MAX_N_SPEAKERS), jnp.float32),
        "morph_top_idx": jnp.zeros((capacity, SPH_AVG_MAX_N_SPEAKERS), jnp.int32),
        # slots-mode KV selector: index into [n_speakers + n_morph_slots)
        # (engine.py kv_cache_mode="slots"); defaults to base speaker 0,
        # matching target_speaker's default
        "kv_slot": jnp.zeros(b, jnp.int32),
    }


class ControlStage:
    """Host-side accumulator of per-stream control edits.

    `stage(idx, field, value)` records an edit; `drain()` returns
    {field: (indices, values)} ready for the engine's scatter update and
    clears the stage.  Last write per (stream, field) wins -- matching the
    reference's last-point-per-buffer rule (processor.cc:104-127).
    """

    def __init__(self):
        self._edits: dict[str, dict[int, np.ndarray]] = {}

    def stage(self, idx: int, field: str, value) -> None:
        self._edits.setdefault(field, {})[int(idx)] = np.asarray(value)

    def pending(self) -> bool:
        return bool(self._edits)

    def drain(self):
        out = {}
        for field, per_stream in self._edits.items():
            idx = np.fromiter(per_stream.keys(), np.int32, len(per_stream))
            vals = np.stack([per_stream[int(i)] for i in idx])
            out[field] = (idx, vals)
        self._edits.clear()
        return out
