"""Sequence-parallel offline conversion (the SP/CP axis, SURVEY.md 2.6).

The reference never materializes sequences -- all temporal dependence lives
in O(1) streaming contexts (`/root/reference/lib/beatricelib/beatrice.h:56-120`,
ring buffers in `src/common/resample.h:48-73`), so there is nothing to port;
this is the TPU-native *sequence parallel* design for long offline
utterances: shard the frame axis over devices instead of (or in addition
to) the stream axis.

Why it can be exact, not approximate: every stage of the chain is FIR --
the mel front ends keep <= win-hop raw samples, the conv stacks keep
(k-1)*dilation rows per block -- so a segment that replays `warmup` frames
of left context from a zero state produces *bitwise* the same outputs as
the sequential scan once the warmup covers the chain's receptive field
(layer i's output at offset t is exact as soon as every window below it
has refilled; induction over the stack).  The ONLY unbounded carry is the
harmonic source phase (waveform_generator._source_phases accumulates
2*pi*f0/sr forever) plus the noise counter:

  * the noise counter is positional -- inject `segment_start - warmup`
    (uint32 wrap makes the synthetic left-pad of segment 0 consistent too);
  * the phase is an *associative prefix sum* of per-frame increments, so it
    parallelizes: pass A runs only the pitch stage per segment (cheap, ~15%
    of chain FLOPs) and returns increments computed ON DEVICE by the
    vocoder's own f32 ops (waveform_generator.frame_increments -- bitwise
    what pass B will integrate); a host-side float64 prefix over them
    yields each segment's boundary phase, and pass B runs the full chain
    per segment with the phase injected.  Pass B's internal pitch path
    recomputes the same qp deterministically, so warmup increments cancel
    exactly even where the warmup is too short for the pitch stage itself.

Both passes are embarrassingly parallel over segments: jit with the
segment axis sharded over a mesh axis runs them with zero collectives --
the scaling story for "convert this hour of audio now" as opposed to the
engine's thousands-of-live-streams DP axis.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import IN_HOP_LENGTH, OUT_HOP_LENGTH
from ..models import chain, pitch_estimator, waveform_generator
from ..models.chain import VoiceConverterConfig
from ..ops.pitch_math import transform_pitch
from .offline import ConversionSettings, build_cond, _block_for, _jitted_resample


def chain_receptive_field_frames(cfg: VoiceConverterConfig) -> int:
    """Frames of left context after which a zero-state replay is exact.

    phone/pitch stacks: sum (k-1)*d per block + raw-history frames of the
    mel front end; the waveform generator's frame-rate blocks stack on top
    of the phone/pitch outputs (its sub-frame upsampler states add < 1
    frame, counted in the +2 slack)."""
    def stack_rf(c):
        fe_frames = -(-c.frontend.history // IN_HOP_LENGTH)
        return fe_frames + sum((c.kernel - 1) * d for d in c.dilations)

    wg_rf = (cfg.wg.kernel - 1) * cfg.wg.n_blocks
    return max(stack_rf(cfg.phone), stack_rf(cfg.pitch)) + wg_rf + 2


@functools.cache
def _jitted_pitch_pass(cfg: VoiceConverterConfig, compute_dtype,
                       soft_pitch: bool = False):
    def pitch_pass(params, seg16, cond):
        n = seg16.shape[0]
        state = pitch_estimator.init_state(cfg.pitch, (n,))
        pe_out = pitch_estimator.apply(
            params["pitch"], cfg.pitch, seg16, state,
            cond["min_q"], cond["max_q"], compute_dtype,
            with_logits=soft_pitch,
        )
        if soft_pitch:
            # mirror chain.apply(soft_pitch=True): expectation over the
            # clamp-masked logits, un-rounded transform -- pass B
            # integrates bitwise the same float-bin increments
            qp_raw = pitch_estimator.expected_bin(
                pe_out[3], cond["min_q"], cond["max_q"],
                pitch_bins=cfg.spec.pitch_bins)
        else:
            qp_raw = pe_out[0]
        qp = transform_pitch(
            qp_raw,
            average_source_pitch=cond["average_source_pitch"][:, None],
            intonation_intensity=cond["intonation_intensity"][:, None],
            pitch_shift=cond["pitch_shift"][:, None],
            pitch_correction=cond["pitch_correction"][:, None],
            pitch_correction_type=cond["pitch_correction_type"][:, None],
            pitch_bins=cfg.spec.pitch_bins,
            round_output=not soft_pitch,
        )
        # increments computed ON DEVICE with the vocoder's own f32 ops
        # (waveform_generator.frame_increments): the host prefix sum then
        # runs over bitwise the values pass B will integrate
        return waveform_generator.frame_increments(qp)

    return jax.jit(pitch_pass)


@functools.cache
def _jitted_chain_pass(cfg: VoiceConverterConfig, compute_dtype,
                       soft_pitch: bool = False):
    def chain_pass(params, seg16, cond, phase0, counter0):
        n = seg16.shape[0]
        state = chain.init_state(cfg, (n,))
        state["wg"]["phase"] = phase0.astype(jnp.float32)
        state["wg"]["noise_counter"] = counter0.astype(jnp.uint32)
        y24, _ = chain.apply(params, cfg, seg16, state, cond,
                             compute_dtype=compute_dtype,
                             soft_pitch=soft_pitch)
        return y24

    return jax.jit(chain_pass)


def convert_utterance_sp(params, cfg: VoiceConverterConfig, bank, audio,
                         sample_rate: float,
                         settings: ConversionSettings | None = None,
                         n_segments: int = 8, warmup_frames: int | None = None,
                         out_sample_rate: float | None = None,
                         compute_dtype=None, mesh=None, axis: str = "streams"):
    """Convert one utterance (or batch) with the frame axis split into
    `n_segments` independent segments (sequence parallelism).

    audio: [n] or [B, n] at `sample_rate`.  Returns numpy float32 at
    `out_sample_rate` (default: input rate), matching
    offline.convert_utterance to float32 round-off (tests/test_seqpar.py).

    With `mesh`, the segment-major work axis is sharded over `axis` so the
    segments run on separate devices with no collectives (pass A's [B, T]
    prefix sum happens on host between the passes).
    """
    settings = settings or ConversionSettings()
    out_sample_rate = out_sample_rate or sample_rate
    if warmup_frames is None:
        warmup_frames = chain_receptive_field_frames(cfg)
    w = int(warmup_frames)

    x = jnp.asarray(audio, jnp.float32)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    b = x.shape[0]

    if sample_rate != 16000:
        from ..ops.resample import make_resampler

        rs = make_resampler(sample_rate, 16000, _block_for(sample_rate, 16000))
        x16 = _jitted_resample(rs)(x)
    else:
        x16 = x
    n16 = x16.shape[-1]
    t_real = -(-n16 // IN_HOP_LENGTH)

    # a segment must be at least `warmup` frames long, or segment si's halo
    # would reach before frame 0 (si*f - w < 0), where no real left context
    # exists -- cap the segment count so every halo is real audio
    s = max(1, min(int(n_segments), t_real // max(w, 1)))
    f = -(-t_real // s)  # frames per segment (>= w by the cap)
    t_pad = s * f
    x16 = jnp.pad(x16, ((0, 0), (0, t_pad * IN_HOP_LENGTH - n16)))

    # Segment 0 has no halo: it starts from the true zero state (a W-frame
    # zero-audio replay would NOT reproduce "fresh state" -- the model's
    # response to silence is not zero state).  Segments 1..S-1 carry a
    # W-frame halo of real left context, which converges to the sequential
    # state exactly (FIR), stacked segment-major [(S-1)*B, (W+F)*hop].
    cond1 = build_cond(cfg, bank, settings, batch=b)
    seg0 = x16[:, : f * IN_HOP_LENGTH]
    segs = None
    if s > 1:
        segs = jnp.stack(
            [
                jax.lax.dynamic_slice_in_dim(
                    x16, (si * f - w) * IN_HOP_LENGTH,
                    (w + f) * IN_HOP_LENGTH, axis=-1,
                )
                for si in range(1, s)
            ]
        ).reshape((s - 1) * b, (w + f) * IN_HOP_LENGTH)
        cond = jax.tree_util.tree_map(
            lambda v: jnp.tile(v, (s - 1,) + (1,) * (v.ndim - 1)), cond1
        )
        if mesh is not None and ((s - 1) * b) % mesh.shape[axis] != 0:
            mesh = None  # fall back to single-device placement
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(mesh, P(axis))
            segs = jax.device_put(segs, sh)

    zeros0 = jnp.zeros((b,), jnp.float32)
    if s == 1:
        # degenerate: one segment == the sequential program (no pass A)
        y0 = _jitted_chain_pass(cfg, compute_dtype,
                                settings.soft_pitch)(
            params, seg0, cond1, zeros0, zeros0
        )
        y24 = y0[:, : t_real * OUT_HOP_LENGTH]
    else:
        # ---- pass A: pitch only, per segment (exact for real frames) ----
        pitch_pass = _jitted_pitch_pass(cfg, compute_dtype,
                                        settings.soft_pitch)
        inc0 = np.asarray(pitch_pass(params, seg0, cond1), np.float64)
        # ---- the one non-FIR carry: phase prefix on host (float64) ----
        inc_seg = np.asarray(pitch_pass(params, segs, cond),
                             np.float64).reshape(s - 1, b, w + f)
        inc_real = np.concatenate(
            [inc0, inc_seg[:, :, w:].transpose(1, 0, 2).reshape(b, (s - 1) * f)],
            axis=-1,
        )  # [B, T_pad]
        prefix = np.concatenate(
            [np.zeros((b, 1)), np.cumsum(inc_real, axis=-1)], axis=-1
        )  # [B, T+1]
        # sequential phase at the start of each segment's first real frame
        seg_start_phase = prefix[:, ::f][:, 1:s].T  # [S-1, B]
        # subtract what pass B's own warmup will (deterministically) add, so
        # the phase lands on the sequential value at the segment boundary
        warm_sum = inc_seg[:, :, :w].sum(axis=-1)  # [S-1, B]
        phase0 = np.mod(seg_start_phase - warm_sum, 2.0 * np.pi)
        phase0 = jnp.asarray(phase0.astype(np.float32).reshape((s - 1) * b))
        counter0 = jnp.asarray(np.repeat(
            (np.arange(1, s, dtype=np.int64) * f - w).astype(np.uint32), b
        ))
        if mesh is not None:
            phase0 = jax.device_put(phase0, sh)
            counter0 = jax.device_put(counter0, sh)

        # ---- pass B: full chain per segment, warmup discarded ----
        chain_pass = _jitted_chain_pass(cfg, compute_dtype,
                                        settings.soft_pitch)
        y0 = chain_pass(params, seg0, cond1, zeros0, zeros0)  # [B, F*240]
        y = chain_pass(params, segs, cond, phase0, counter0)
        y = y[:, w * OUT_HOP_LENGTH:]
        rest = jnp.transpose(
            y.reshape(s - 1, b, f * OUT_HOP_LENGTH), (1, 0, 2)
        ).reshape(b, (s - 1) * f * OUT_HOP_LENGTH)
        y24 = jnp.concatenate([y0, rest], axis=-1)[:, : t_real * OUT_HOP_LENGTH]

    if out_sample_rate != 24000:
        from ..ops.resample import make_resampler

        rs_out = make_resampler(
            24000, out_sample_rate, _block_for(24000, out_sample_rate)
        )
        out = _jitted_resample(rs_out)(y24)
    else:
        out = y24
    out = np.asarray(out, np.float32)
    return out[0] if squeeze else out
