"""The committed demo model must actually be a trained model.

Guard born of an r3 incident: a fresh training run re-initialized
models_demo/klatt8 in place and every downstream eval silently measured
a RANDOM model (pitch bin pinned at the top of the range, voicing gate
never opening, MCD 90+).  A random-weights chain fails these checks;
the shipped trained model passes them by a wide margin.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

MODEL_DIR = "models_demo/klatt8"


@pytest.fixture(scope="module")
def model():
    import os

    if not os.path.isdir(MODEL_DIR):
        pytest.skip("no shipped model in this checkout")
    from beatrice_vst_tpu.models.io import load_model_dir

    return load_model_dir(MODEL_DIR)


def test_shipped_model_tracks_and_voices_a_tone(model):
    from beatrice_vst_tpu.models import chain
    from beatrice_vst_tpu.runtime.offline import (ConversionSettings,
                                                  build_cond)

    _, cfg, params, bank = model
    t = np.arange(300 * 160) / 16000.0
    tone = (0.3 * np.sin(2 * np.pi * 150.0 * t)
            + 0.01 * np.random.default_rng(0).standard_normal(len(t))
            ).astype(np.float32)
    cond = build_cond(cfg, bank, ConversionSettings(target_speaker=1))
    state = chain.init_state(cfg, (1,))
    out, _, taps = jax.jit(
        lambda a, c: chain.apply(params, cfg, a, state, c, with_taps=True)
    )(jnp.asarray(tone[None]), cond)

    per = np.asarray(taps["pitch_feats"])[0, :, 0]
    qp = np.asarray(taps["qp_raw"])[0]
    # a trained voicing gate opens on a clean tone (random init: ~0)
    assert float((per > 0).mean()) > 0.3, "voicing gate never opens"
    # the estimator tracks ~150 Hz within a few semitones on most frames
    # (random init: argmax pinned at one arbitrary bin)
    from beatrice_vst_tpu.constants import quantized_pitch_to_hz

    hz = np.asarray(quantized_pitch_to_hz(qp[50:]))
    frac_near = float((np.abs(np.log2(hz / 150.0)) < 0.3).mean())
    assert frac_near > 0.5, f"pitch not tracked (only {frac_near:.0%} near)"
    # and the output is finite, non-silent audio.  Floor 0.005: the
    # probe is a PURE SINE (out of the speech corpus distribution) and
    # the r4 wide-register+GAN model renders it ~-40 dBFS while real
    # speech converts at -2..-3 dB vs input (docs/audio_demo RMS 0.03+);
    # the floor only needs to separate "trained" from "silent garbage"
    # (a random model fails the pitch/voicing asserts above anyway)
    out = np.asarray(out)[0]
    assert np.isfinite(out).all()
    assert 0.005 < float(np.sqrt((out ** 2).mean())) < 1.0
