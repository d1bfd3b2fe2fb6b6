"""Offline (whole-utterance) conversion -- BASELINE.json config #1.

Runs the same chain as the real-time engine but over the full utterance in
one chunked call (or `lax.scan` for bounded memory), with the same edge
resamplers.  Used by the CLI, the golden-parity harness, and benchmarks.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import IN_HOP_LENGTH, OUT_HOP_LENGTH, V20RC0, VersionSpec
from ..models import chain
from ..models.chain import VoiceConverterConfig
from ..ops.resample import make_resampler
from ..speakers import morpher
from ..ops.morph import prepare_voice_morph_weights, prune_top_k


@dataclasses.dataclass
class ConversionSettings:
    """Host-side per-utterance settings (the Set* parameters as plain data)."""

    target_speaker: int = 0
    formant_shift: float = 0.0
    pitch_shift: float = 0.0
    average_source_pitch: float = 52.0
    intonation_intensity: float = 1.0
    pitch_correction: float = 0.0
    pitch_correction_type: int = 0
    min_source_pitch: float = 33.125
    max_source_pitch: float = 80.875
    vq_num_neighbors: int = 0
    morph_weights: np.ndarray | None = None  # dense [n_speakers] -> morph mode
    # condition the vocoder on E[bin] over the pitch logits instead of the
    # argmax (chain.apply soft_pitch) -- the training-time configuration,
    # also usable at inference; default off = reference-parity argmax
    soft_pitch: bool = False


def build_cond(cfg: VoiceConverterConfig, bank, settings: ConversionSettings,
               batch: int = 1):
    """Resolve a ConversionSettings into the chain's cond dict."""
    spec = cfg.spec
    n = bank["additive"].shape[0]
    target = settings.target_speaker
    morph_mode = settings.morph_weights is not None
    if morph_mode:
        target = n
        w = jnp.asarray(settings.morph_weights, jnp.float32)[None]
        from ..constants import MAX_N_SPEAKERS

        if w.shape[1] < MAX_N_SPEAKERS:  # weights are always 256-wide
            w = jnp.pad(w, ((0, 0), (0, MAX_N_SPEAKERS - w.shape[1])))
        pruned = prepare_voice_morph_weights(w, jnp.asarray([n]))
        pruned, top_idx = prune_top_k(pruned, 8)
        morphed = morpher.update_morphed_embeddings(bank, pruned, top_idx)
    else:
        from ..constants import MAX_N_SPEAKERS

        pruned = jnp.zeros((1, MAX_N_SPEAKERS), jnp.float32)
        top_idx = jnp.zeros((1, 8), jnp.int32)
        morphed = {"additive": jnp.zeros((1, bank["additive"].shape[1]))}
        if "kv" in bank:
            morphed["kv"] = jnp.zeros((1, *bank["kv"].shape[1:]))

    t_spk = jnp.full((batch,), target, jnp.int32)
    formant_idx = jnp.full(
        (batch,), int(round(np.clip(settings.formant_shift, -2, 2) * 2 + 4)), jnp.int32
    )
    morphed_b = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (batch, *x.shape[1:])), morphed
    )
    additive, kv, cb_idx = morpher.select_conditioning(
        bank, t_spk, morphed_b, formant_idx,
        frame_counter=jnp.zeros((batch,), jnp.uint32) if "codebook" in bank else None,
        pruned_weights=jnp.broadcast_to(pruned, (batch, pruned.shape[1])),
        top_idx=jnp.broadcast_to(top_idx, (batch, 8)),
    )
    bins = spec.pitch_bins

    def q(midi):
        return int(np.clip(round((np.clip(midi, 0, 128) - 33.0) * 8.0), 1, bins - 1))

    cond = {
        "speaker_embedding": additive,
        "vq_num_neighbors": jnp.full((batch,), settings.vq_num_neighbors, jnp.int32),
        "min_q": jnp.full((batch,), q(settings.min_source_pitch), jnp.int32),
        "max_q": jnp.full((batch,), q(settings.max_source_pitch), jnp.int32),
        "average_source_pitch": jnp.full((batch,), settings.average_source_pitch, jnp.float32),
        "intonation_intensity": jnp.full((batch,), settings.intonation_intensity, jnp.float32),
        "pitch_shift": jnp.full((batch,), np.clip(settings.pitch_shift, -24, 24), jnp.float32),
        "pitch_correction": jnp.full((batch,), np.clip(settings.pitch_correction, 0, 1), jnp.float32),
        "pitch_correction_type": jnp.full((batch,), settings.pitch_correction_type, jnp.int32),
    }
    if spec.has_kv:
        cond["kv"] = kv
    if spec.has_vq:
        cond["codebook"] = bank["codebook"][cb_idx]
    return cond


@functools.cache
def _jitted_apply(cfg: VoiceConverterConfig, compute_dtype,
                  soft_pitch: bool = False):
    """Cached jit of the chain forward (eager op-by-op execution is
    catastrophic on remote backends -- one dispatch per op)."""
    return jax.jit(
        lambda params, audio16, state, cond: chain.apply(
            params, cfg, audio16, state, cond, compute_dtype=compute_dtype,
            soft_pitch=soft_pitch,
        )
    )


@functools.cache
def _jitted_resample(rs):
    return jax.jit(rs.apply_offline)


def convert_utterance(params, cfg: VoiceConverterConfig, bank, audio,
                      sample_rate: float, settings: ConversionSettings = None,
                      out_sample_rate: float = None, compute_dtype=None,
                      chunk_frames: int = None):
    """Convert one utterance (or a batch) offline.

    audio: [n] or [B, n] at `sample_rate`.  Returns converted audio at
    `out_sample_rate` (default: the input rate), numpy float32.

    chunk_frames > 0 processes the utterance in fixed-size chunks with the
    streaming state carried between them -- bounded memory and a
    fixed-shape (cached-compile) program for arbitrarily long audio.  This
    carry handoff is the framework's sequence-parallel story (SURVEY.md
    2.6): temporal dependence is O(1) state, so sequence shards chain by
    passing the carry, no ring attention required.  Default (None): auto
    -- long utterances chunk at 256 frames; chunk_frames=0 forces a single
    whole-utterance program.
    """
    if chunk_frames is None:
        chunk_frames = 256 if audio_longer_than(audio, sample_rate, 384) else 0
    settings = settings or ConversionSettings()
    out_sample_rate = out_sample_rate or sample_rate
    x = jnp.asarray(audio, jnp.float32)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    b = x.shape[0]

    # edge resampling to the model rates
    if sample_rate != 16000:
        rs = make_resampler(sample_rate, 16000, _block_for(sample_rate, 16000))
        x16 = _jitted_resample(rs)(x)
    else:
        x16 = x
    # pad to whole frames
    n16 = x16.shape[-1]
    t = -(-n16 // IN_HOP_LENGTH)
    x16 = jnp.pad(x16, ((0, 0), (0, t * IN_HOP_LENGTH - n16)))

    cond = build_cond(cfg, bank, settings, batch=b)
    state = chain.init_state(cfg, (b,))
    if chunk_frames and chunk_frames < t:
        n_pad_frames = (-t) % chunk_frames
        if n_pad_frames:
            x16 = jnp.pad(x16, ((0, 0), (0, n_pad_frames * IN_HOP_LENGTH)))
        parts = []
        fn = _jitted_apply(cfg, compute_dtype, settings.soft_pitch)
        for c in range(x16.shape[-1] // (chunk_frames * IN_HOP_LENGTH)):
            seg = x16[:, c * chunk_frames * IN_HOP_LENGTH:(c + 1) * chunk_frames * IN_HOP_LENGTH]
            y_seg, state = fn(params, seg, state, cond)
            parts.append(y_seg)
        y24 = jnp.concatenate(parts, axis=-1)[:, : t * OUT_HOP_LENGTH]
    else:
        y24, _ = _jitted_apply(cfg, compute_dtype, settings.soft_pitch)(
            params, x16, state, cond)

    if out_sample_rate != 24000:
        rs_out = make_resampler(24000, out_sample_rate, _block_for(24000, out_sample_rate))
        y = _jitted_resample(rs_out)(y24)
    else:
        y = y24
    y = np.asarray(y, np.float32)
    return y[0] if squeeze else y


def audio_longer_than(audio, sample_rate: float, frames: int) -> bool:
    n = np.shape(audio)[-1]
    return n / sample_rate > frames * 0.010


def _block_for(rate_in: float, rate_out: float) -> int:
    from ..ops.resample import rational_rate_ratio

    _, m = rational_rate_ratio(rate_in, rate_out)
    return m * max(1, 4096 // m)
