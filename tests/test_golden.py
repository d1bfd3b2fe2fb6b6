"""Golden parity: JAX chain vs the independent NumPy float64 oracle
(allclose 1e-3 waveform gate, SURVEY.md section 4 strategy #2)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from beatrice_vst_tpu.constants import V20A2, V20RC0
from beatrice_vst_tpu.models import chain
from beatrice_vst_tpu.models.chain import VoiceConverterConfig
from beatrice_vst_tpu import reference_impl as ref
from beatrice_vst_tpu.params.normalize import denormalize, normalize
from beatrice_vst_tpu.params import SCHEMA, ParameterID


def _run_pair(spec, settings_overrides=None, seed=0, t=12):
    cfg = VoiceConverterConfig.for_version(spec)
    params = chain.init(jax.random.PRNGKey(seed), cfg)
    rng = np.random.default_rng(seed)
    audio = (0.3 * np.sin(2 * np.pi * 220 * np.arange(t * 160) / 16000)
             + 0.02 * rng.standard_normal(t * 160)).astype(np.float32)

    settings = {
        "speaker_embedding": rng.standard_normal(256).astype(np.float32) * 0.1,
        "vq_num_neighbors": 0,
        "min_q": 1,
        "max_q": spec.pitch_bins - 1,
        "average_source_pitch": 52.0,
        "intonation_intensity": 1.0,
        "pitch_shift": 0.0,
        "pitch_correction": 0.0,
        "pitch_correction_type": 0,
    }
    if spec.has_kv:
        settings["kv"] = rng.standard_normal((384, 128)).astype(np.float32) * 0.1
    if spec.has_vq:
        settings["codebook"] = rng.standard_normal((512, 128)).astype(np.float32)
    settings.update(settings_overrides or {})

    # oracle (float64 numpy)
    want = ref.chain_forward(params, cfg, audio, target_settings=settings)

    # JAX chain (float32), batch of 1
    cond = {
        "speaker_embedding": jnp.asarray(settings["speaker_embedding"])[None],
        "vq_num_neighbors": jnp.asarray([settings["vq_num_neighbors"]]),
        "min_q": jnp.asarray([settings["min_q"]]),
        "max_q": jnp.asarray([settings["max_q"]]),
        "average_source_pitch": jnp.asarray([settings["average_source_pitch"]], jnp.float32),
        "intonation_intensity": jnp.asarray([settings["intonation_intensity"]], jnp.float32),
        "pitch_shift": jnp.asarray([settings["pitch_shift"]], jnp.float32),
        "pitch_correction": jnp.asarray([settings["pitch_correction"]], jnp.float32),
        "pitch_correction_type": jnp.asarray([settings["pitch_correction_type"]]),
    }
    if spec.has_kv:
        cond["kv"] = jnp.asarray(settings["kv"])[None]
    if spec.has_vq:
        cond["codebook"] = jnp.asarray(settings["codebook"])[None]
    state = chain.init_state(cfg, (1,))
    got, _ = chain.apply(params, cfg, jnp.asarray(audio)[None], state, cond)
    return np.asarray(got)[0], want


@pytest.mark.parametrize("spec", [V20A2, V20RC0], ids=["20a2", "20rc0"])
def test_chain_matches_numpy_oracle(spec):
    got, want = _run_pair(spec)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_chain_matches_oracle_with_controls():
    got, want = _run_pair(
        V20RC0,
        {"vq_num_neighbors": 4, "pitch_shift": 7.0, "pitch_correction": 0.5,
         "pitch_correction_type": 1, "intonation_intensity": 1.5},
        seed=1,
    )
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_normalize_roundtrip():
    p = SCHEMA[int(ParameterID.PITCH_SHIFT)]
    assert normalize(p, 0.0) == 0.5
    assert denormalize(p, 0.5) == 0.0
    # step quantization: 48*8 divisions over [-24, 24] => 1/8 st steps
    assert abs(denormalize(p, normalize(p, 5.07)) - 5.125) < 1e-9
    voice = SCHEMA[int(ParameterID.VOICE)]
    assert denormalize(voice, 1.0) == 256
    assert denormalize(voice, 0.0) == 0
    assert isinstance(denormalize(voice, 0.5), int)
