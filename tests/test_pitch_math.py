"""Pitch post-processing vs a NumPy port of processor_core_0.cc:58-120."""

import numpy as np
import jax.numpy as jnp

from beatrice_vst_tpu.ops.pitch_math import (
    min_max_pitch_to_bins,
    transform_pitch,
)

BPS = 8.0  # bins per semitone


def reference_transform(q, avg, inton, shift, corr, ctype, bins):
    tmp = avg + (float(q) - avg) * inton + BPS * shift
    if corr != 0.0:
        if ctype == 0:
            nearest = (np.floor(tmp / BPS) + 0.5) * BPS
            delta = (tmp - nearest) * (2.0 / BPS)
            if abs(delta) < 1e-4:
                tmp = nearest
            else:
                tmp = nearest + delta * abs(delta) ** -corr * (BPS / 2.0)
        else:
            nearest = np.round(tmp / BPS) * BPS
            delta = (tmp - nearest) * (2.0 / BPS)
            if corr > 1 - 1e-4:
                tmp = nearest
            elif delta >= 0:
                tmp = nearest + delta ** (1.0 / (1.0 - corr)) * (BPS / 2.0)
            else:
                tmp = nearest - (-delta) ** (1.0 / (1.0 - corr)) * (BPS / 2.0)
    return int(np.clip(np.round(tmp), 1, bins - 1))


def test_matches_reference_grid():
    rng = np.random.default_rng(2)
    qs = rng.integers(1, 448, 200)
    avgs = rng.uniform(0, 128, 200)
    intons = rng.uniform(-1, 3, 200)
    shifts = rng.uniform(-24, 24, 200)
    corrs = rng.choice([0.0, 0.3, 0.7, 1.0], 200)
    ctypes = rng.integers(0, 2, 200)

    got = transform_pitch(
        jnp.asarray(qs),
        average_source_pitch=jnp.asarray(avgs, jnp.float32),
        intonation_intensity=jnp.asarray(intons, jnp.float32),
        pitch_shift=jnp.asarray(shifts, jnp.float32),
        pitch_correction=jnp.asarray(corrs, jnp.float32),
        pitch_correction_type=jnp.asarray(ctypes),
        pitch_bins=448,
    )
    got = np.asarray(got)
    mismatches = 0
    for i in range(200):
        want = reference_transform(
            qs[i], avgs[i], intons[i], shifts[i], corrs[i], ctypes[i], 448
        )
        # float32 vs float64 rounding at bin boundaries may differ by 1 bin
        if abs(int(got[i]) - want) > 0:
            mismatches += abs(int(got[i]) - want)
    assert mismatches <= 2, f"too many off-by-N bins: {mismatches}"


def test_correction_monotone_toward_semitone():
    """The reference asserts correction never moves pitch away from the
    nearest semitone (processor_core_0.cc:85-91,112-113)."""
    q = jnp.asarray(np.arange(32, 440), jnp.float32)
    for ctype in (0, 1):
        base = transform_pitch(
            q, average_source_pitch=60.0, intonation_intensity=1.0,
            pitch_shift=0.0, pitch_correction=0.0,
            pitch_correction_type=ctype, pitch_bins=448,
        )
        corrected = transform_pitch(
            q, average_source_pitch=60.0, intonation_intensity=1.0,
            pitch_shift=0.0, pitch_correction=1.0,
            pitch_correction_type=ctype, pitch_bins=448,
        )
        # full correction must land on semitone multiples (bins of 8)
        snapped = np.asarray(corrected)
        if ctype == 1:
            assert np.all(snapped % 8 == 0)
        dist_base = np.abs(np.asarray(base) - np.round(np.asarray(base) / 8) * 8)
        dist_corr = np.abs(snapped - np.round(snapped / 8) * 8)
        assert np.all(dist_corr <= dist_base + 1)


def test_min_max_pitch_mapping():
    # core_0.cc:310-331: MIDI 33 -> bin 0 -> clamped to 1
    assert int(min_max_pitch_to_bins(jnp.asarray(33.0), 448)) == 1
    assert int(min_max_pitch_to_bins(jnp.asarray(45.0), 448)) == 96
    assert int(min_max_pitch_to_bins(jnp.asarray(128.0), 448)) == 447
    assert int(min_max_pitch_to_bins(jnp.asarray(0.0), 384)) == 1
