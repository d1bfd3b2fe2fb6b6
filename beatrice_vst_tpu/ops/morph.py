"""Voice-morph pad weight math, batched.

Reimplements the 2-D morph pad model of the reference
(`/root/reference/src/common/voice_morph_state.h:50-104`): up to 8 markers
(voice_id, x, y) plus a cursor and a falloff; marker weights are
1/(d^2+eps)^falloff normalized, accumulated per voice, folded at the
speaker-count boundary and thresholded at 0.01.

Everything is vectorizable over a batch of streams: marker arrays are fixed
shape [8] per stream and weights come out as dense [max_n_speakers] vectors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import (
    MAX_N_SPEAKERS,
    MAX_N_VOICE_MORPH_MARKERS,
    VOICE_MORPH_WEIGHT_THRESHOLD,
)

_EPSILON = 0.0008


def calculate_marker_weights(cursor_x, cursor_y, falloff, marker_x, marker_y, marker_count):
    """Per-marker weights (voice_morph_state.h:50-73).

    Args:
      cursor_x, cursor_y, falloff: [...] scalars per stream.
      marker_x, marker_y: [..., 8] marker positions.
      marker_count: [...] int number of active markers (1..8).

    Returns: [..., 8] normalized weights (inactive markers get 0).
    """
    idx = jnp.arange(MAX_N_VOICE_MORPH_MARKERS)
    active = idx < marker_count[..., None]
    dx = cursor_x[..., None] - marker_x
    dy = cursor_y[..., None] - marker_y
    d2 = dx * dx + dy * dy
    w = (d2 + _EPSILON) ** -falloff[..., None]
    w = jnp.where(active, w, 0.0)
    total = jnp.sum(w, axis=-1, keepdims=True)
    w = w / jnp.maximum(total, 1e-30)
    # falloff <= 0: uniform over active markers (voice_morph_state.h:54-58).
    uniform = active.astype(w.dtype) / jnp.maximum(
        marker_count[..., None].astype(w.dtype), 1.0
    )
    return jnp.where(falloff[..., None] <= 0.0, uniform, w)


def calculate_voice_weights(
    cursor_x, cursor_y, falloff, marker_voice_id, marker_x, marker_y, marker_count,
    max_n_speakers: int = MAX_N_SPEAKERS,
):
    """Accumulate marker weights per voice id (voice_morph_state.h:75-85).

    marker_voice_id: [..., 8] int voice ids (clamped to the speaker range).
    Returns: [..., max_n_speakers] dense per-voice weights.
    """
    mw = calculate_marker_weights(
        cursor_x, cursor_y, falloff, marker_x, marker_y, marker_count
    )
    vid = jnp.clip(marker_voice_id, 0, max_n_speakers - 1)
    # scatter-add via one-hot matmul: [..., 8] x [..., 8, S] -> [..., S]
    oh = (vid[..., None] == jnp.arange(max_n_speakers)).astype(mw.dtype)
    return jnp.einsum("...m,...ms->...s", mw, oh)


def prepare_voice_morph_weights(weights, speaker_count):
    """Fold out-of-range weights into the last speaker and threshold
    (voice_morph_state.h:87-104).

    Args:
      weights: [..., S] dense voice weights.
      speaker_count: [...] int actual model speaker count.
    Returns: [..., S] pruned weights.
    """
    s = weights.shape[-1]
    idx = jnp.arange(s)
    count = jnp.minimum(speaker_count, s)[..., None]
    in_range = idx < count
    excess = jnp.sum(jnp.where(in_range, 0.0, weights), axis=-1, keepdims=True)
    last = idx == count - 1
    w = jnp.where(in_range, weights, 0.0) + jnp.where(last, excess, 0.0)
    w = jnp.where(w < VOICE_MORPH_WEIGHT_THRESHOLD, 0.0, w)
    return jnp.where(count > 0, w, 0.0)


def prune_top_k(weights, k: int):
    """Keep the k largest weights, zero the rest; return (pruned, indices).

    Mirrors ApplySpeakerMorphingWeights' argsort pruning
    (processor_core_2.cc:507-532): at most kSphAvgMaxNSpeakers (=8) speakers
    participate in morphing; indices are returned most-weighted-first so the
    codebook lottery can walk them in order.
    """
    if weights.shape[-1] < k:
        raise ValueError(
            f"weights must have >= {k} entries (pad to MAX_N_SPEAKERS first); "
            f"got {weights.shape[-1]}"
        )
    topv, topi = jax.lax.top_k(weights, k)
    s = weights.shape[-1]
    oh = (topi[..., None] == jnp.arange(s)).astype(weights.dtype)
    mask = jnp.einsum("...km,...k->...m", oh, jnp.ones_like(topv))
    return weights * jnp.minimum(mask, 1.0), topi
