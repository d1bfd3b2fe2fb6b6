"""Pitch post-processing math as pure, batched jnp functions.

Reimplements (vectorized, branchless) the per-frame pitch transform of the
reference cores -- shift / intonation / correction
(`/root/reference/src/common/processor_core_0.cc:58-120`,
`processor_core_2.cc:190-252`):

    tmp = avg_src + (q - avg_src) * intonation + 8 * pitch_shift
    if correction > 0: snap toward the nearest semitone (two curve types)
    q_out = clamp(round(tmp), 1, pitch_bins - 1)

All inputs are per-stream tensors so 2000 streams process in one VPU pass.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import PITCH_BINS_PER_SEMITONE

_EPS_DELTA = 1e-4


def pitch_correction_type0(pitch, correction):
    """Snap curve ``x|x|^-p`` around semitone centers (core_0.cc:69-91).

    nearest is the *bin-center* semitone (floor + 0.5 semitones); delta is
    normalized to [-1, 1] over the semitone; the curve pushes |delta| toward
    1 (i.e. toward the semitone boundaries adjacent to the center).
    """
    bps = PITCH_BINS_PER_SEMITONE
    nearest = (jnp.floor(pitch / bps) + 0.5) * bps
    delta = (pitch - nearest) * (2.0 / bps)
    absd = jnp.abs(delta)
    safe = jnp.maximum(absd, _EPS_DELTA)
    corrected = nearest + delta * safe**-correction * (bps / 2.0)
    return jnp.where(absd < _EPS_DELTA, nearest, corrected)


def pitch_correction_type1(pitch, correction):
    """Snap curve ``sgn(x)|x|^{1/(1-p)}`` around semitones (core_0.cc:92-113)."""
    bps = PITCH_BINS_PER_SEMITONE
    nearest = jnp.round(pitch / bps) * bps
    delta = (pitch - nearest) * (2.0 / bps)
    # Guard the exponent when correction ~ 1 (reference snaps exactly).
    full_snap = correction > 1.0 - _EPS_DELTA
    exponent = 1.0 / jnp.maximum(1.0 - correction, _EPS_DELTA)
    corrected = nearest + jnp.sign(delta) * jnp.abs(delta) ** exponent * (bps / 2.0)
    return jnp.where(full_snap, nearest, corrected)


def transform_pitch(
    quantized_pitch,
    *,
    average_source_pitch,
    intonation_intensity,
    pitch_shift,
    pitch_correction,
    pitch_correction_type,
    pitch_bins: int,
    round_output: bool = True,
):
    """Full per-frame pitch transform -> int32 quantized pitch.

    Args:
      quantized_pitch: [...] int or float source pitch bins.
      average_source_pitch: [...] average source pitch in *bins* (the
        reference stores it in MIDI note units and converts; see
        ``source_pitch_midi_to_bins``).
      intonation_intensity / pitch_shift (semitones) /
        pitch_correction (0..1) / pitch_correction_type (0 or 1): [...].
      pitch_bins: static number of bins for the model version.

    Mirrors processor_core_0.cc:58-120 exactly (math reimplemented).
    """
    q = jnp.asarray(quantized_pitch, jnp.float32)
    tmp = (
        average_source_pitch
        + (q - average_source_pitch) * intonation_intensity
        + PITCH_BINS_PER_SEMITONE * pitch_shift
    )
    c0 = pitch_correction_type0(tmp, pitch_correction)
    c1 = pitch_correction_type1(tmp, pitch_correction)
    corrected = jnp.where(pitch_correction_type == 0, c0, c1)
    tmp = jnp.where(pitch_correction != 0.0, corrected, tmp)
    if not round_output:
        # soft-pitch path: keep the transformed bin continuous (float32)
        # so gradients flow through the expectation over bin logits into
        # the vocoder's source (see chain.apply soft_pitch)
        return jnp.clip(tmp, 1.0, float(pitch_bins - 1))
    return jnp.clip(jnp.round(tmp), 1, pitch_bins - 1).astype(jnp.int32)


def source_pitch_midi_to_bins(midi):
    """MIDI-note pitch parameter -> quantized bins (core_0.cc:316-318).

    The reference parameters AverageSourcePitch / Min / MaxSourcePitch are in
    MIDI units [0,128]; the cores map them to bins via (midi - 33) * 8.

    NOTE: AverageSourcePitch itself is used *directly in bin space* by
    Process1 (core_0.cc:61-65 uses average_source_pitch_ without conversion),
    so only Min/Max use this mapping in the reference.  We keep the same
    split: the engine converts Min/Max with this function and passes
    AverageSourcePitch through unchanged.
    """
    return (midi - 33.0) * PITCH_BINS_PER_SEMITONE


def min_max_pitch_to_bins(midi, pitch_bins: int):
    """Min/MaxSourcePitch MIDI -> clamped bin index (core_0.cc:310-331)."""
    bins = jnp.round(source_pitch_midi_to_bins(midi))
    return jnp.clip(bins, 1, pitch_bins - 1).astype(jnp.int32)
