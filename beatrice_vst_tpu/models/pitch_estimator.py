"""PitchEstimator: streaming neural pitch tracker.

TPU-native replacement for `Beatrice*_EstimatePitch1`
(`/root/reference/lib/beatricelib/beatrice.h:88-93,266-271`): 160 raw
samples per frame in; out comes one quantized pitch bin (96 bins/octave,
bin 0 = 55 Hz / MIDI 33, 384 or 448 bins by version) plus 4 continuous
pitch features (periodicity/aperiodicity-style), with a clampable
[min, max] bin range (`SetMin/MaxQuantizedPitch`, beatrice.h:80-87).

Design: a wider analysis window (1024 samples, 64 ms -- enough for ~3.5
periods at 55 Hz) through the matmul-DFT mel front end, then a small causal
conv stack with two heads: bin logits (classification over the version's
pitch bins) and the 4 features.  The min/max clamp is a per-stream mask on
the logits before the argmax, so 2000 streams with different vocal ranges
share one program.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..constants import VersionSpec
from ..ops.frontend import MelFrontend
from . import layers


@dataclasses.dataclass(frozen=True)
class PitchEstimatorConfig:
    pitch_bins: int
    n_mels: int = 128
    win: int = 1024
    hidden: int = 256
    kernel: int = 4
    dilations: tuple = (1, 2, 4, 1)
    mlp_ratio: int = 2
    n_features: int = 4

    @classmethod
    def for_version(cls, spec: VersionSpec) -> "PitchEstimatorConfig":
        return cls(pitch_bins=spec.pitch_bins)

    @property
    def frontend(self) -> MelFrontend:
        # fmax 4 kHz: pitch information lives low; keeps mel resolution dense
        return MelFrontend(win=self.win, n_mels=self.n_mels, fmax=4000.0)


def init(key, cfg: PitchEstimatorConfig, dtype=jnp.float32):
    keys = jax.random.split(key, len(cfg.dilations) + 3)
    return {
        "prenet": layers.linear_init(keys[0], cfg.n_mels, cfg.hidden, dtype),
        "blocks": [
            layers.conv_block_init(
                keys[i + 1], cfg.hidden, cfg.kernel, d, cfg.mlp_ratio, dtype
            )
            for i, d in enumerate(cfg.dilations)
        ],
        "out_ln": layers.layer_norm_init(cfg.hidden, dtype),
        "logits": layers.linear_init(keys[-2], cfg.hidden, cfg.pitch_bins, dtype),
        "features": layers.linear_init(keys[-1], cfg.hidden, cfg.n_features, dtype),
    }


def init_state(cfg: PitchEstimatorConfig, batch_shape=(), dtype=jnp.float32,
               ring=False):
    fe = cfg.frontend
    return {
        "audio": (fe.ring_state(batch_shape, dtype) if ring else
                  jnp.zeros((*batch_shape, fe.history), dtype)),
        "blocks": [
            layers.conv_block_state(batch_shape, cfg.hidden, cfg.kernel, d,
                                    dtype, ring=ring)
            for d in cfg.dilations
        ],
    }


def apply(params, cfg: PitchEstimatorConfig, audio, state,
          min_quantized_pitch=None, max_quantized_pitch=None,
          compute_dtype=None, t_index=None, with_logits: bool = False,
          shared_ring=None, mel=None):
    """audio: [B, T*160] -> (quantized_pitch [B,T] int32, features [B,T,4]).

    min/max_quantized_pitch: [B] int per-stream bin clamps (default full
    range), matching SetMin/MaxQuantizedPitch semantics: the argmax is
    restricted to [min, max] inclusive.

    with_logits=True appends the pre-argmax bin logits [B, T, bins] to the
    return tuple -- the supervision point for pitch distillation (the
    argmax itself is non-differentiable and saturates as a target).
    """
    fe = cfg.frontend
    if mel is not None:
        # precomputed by the chain's fused dual-frontend read
        new_audio_hist = None
    elif shared_ring is not None and t_index is not None:
        # merged audio ring (chain-owned, already written this frame)
        mel = fe.mel_read_ring(shared_ring, t_index)
        new_audio_hist = None
    elif t_index is not None and state["audio"].shape[-1] == fe.ring_len:
        mel, new_audio_hist = fe.mel_from_ring(state["audio"], audio, t_index)
    else:
        windows, new_audio_hist = fe.frames_from_chunk(state["audio"], audio)
        mel = fe(windows)
    h = layers.linear(params["prenet"], mel, compute_dtype)
    new_block_states = []
    for p, s, d in zip(params["blocks"], state["blocks"], cfg.dilations):
        h, ns = layers.conv_block(p, h, s, d, compute_dtype, ring_pos=t_index)
        new_block_states.append(ns)
    h = layers.layer_norm(params["out_ln"], h)
    # f32 emission: the bin argmax should not round near-tied logits
    # through bf16 (the heads are tiny, [B, bins] + [B, 4])
    logits = layers.linear(params["logits"], h, compute_dtype,
                           out_dtype=jnp.float32)
    features = layers.linear(params["features"], h, compute_dtype,
                             out_dtype=jnp.float32)

    bins = jnp.arange(cfg.pitch_bins)
    if min_quantized_pitch is None:
        min_quantized_pitch = jnp.asarray(1)
    if max_quantized_pitch is None:
        max_quantized_pitch = jnp.asarray(cfg.pitch_bins - 1)
    lo = jnp.asarray(min_quantized_pitch)[..., None, None]  # [B,1,1]
    hi = jnp.asarray(max_quantized_pitch)[..., None, None]
    allowed = (bins >= lo) & (bins <= hi)
    masked = jnp.where(allowed, logits, -jnp.inf)
    qp = jnp.argmax(masked, axis=-1).astype(jnp.int32)
    new_state = {"blocks": new_block_states}
    if new_audio_hist is not None:
        new_state["audio"] = new_audio_hist
    if with_logits:
        return qp, features, new_state, logits
    return qp, features, new_state


def expected_bin(logits, min_quantized_pitch=None, max_quantized_pitch=None,
                 *, pitch_bins: int):
    """Softmax expectation over the clamp-masked bin logits -> [B, T] f32.

    The soft (differentiable) counterpart of the argmax above, used by
    chain.apply(soft_pitch=True): conditioning the vocoder on E[bin]
    instead of argmax lets waveform losses shape the pitch logits during
    training (the argmax blocks all gradient flow), and removes the
    discrete bin-disagreement discontinuity that limits teacher-student
    behavioral parity (docs/DISTILL_PARITY_REPORT.json limiting_factor).
    Uses the same min/max clamp mask as the argmax so both modes restrict
    to the identical bin span (SetMin/MaxQuantizedPitch semantics).
    """
    bins = jnp.arange(logits.shape[-1])
    if min_quantized_pitch is None:
        min_quantized_pitch = jnp.asarray(1)
    if max_quantized_pitch is None:
        max_quantized_pitch = jnp.asarray(pitch_bins - 1)
    lo = jnp.asarray(min_quantized_pitch)[..., None, None]
    hi = jnp.asarray(max_quantized_pitch)[..., None, None]
    masked = jnp.where((bins >= lo) & (bins <= hi), logits, -jnp.inf)
    probs = jax.nn.softmax(masked, axis=-1)
    return jnp.sum(probs * bins.astype(jnp.float32), axis=-1)
