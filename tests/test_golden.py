"""Golden parity: JAX chain vs the independent NumPy float64 oracle
(allclose 1e-3 waveform gate, SURVEY.md section 4 strategy #2)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from beatrice_vst_tpu.constants import MAX_N_SPEAKERS, V20A2, V20B1, V20RC0
from beatrice_vst_tpu.models import chain
from beatrice_vst_tpu.models.chain import VoiceConverterConfig
from beatrice_vst_tpu import reference_impl as ref
from beatrice_vst_tpu.params.normalize import denormalize, normalize
from beatrice_vst_tpu.params import SCHEMA, ParameterID


def _run_pair(spec, settings_overrides=None, seed=0, t=12,
              soft_pitch=False):
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
    want = ref.chain_forward(params, cfg, audio, target_settings=settings,
                             soft_pitch=soft_pitch)

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
    got, _ = chain.apply(params, cfg, jnp.asarray(audio)[None], state, cond,
                         soft_pitch=soft_pitch)
    return np.asarray(got)[0], want


@pytest.mark.parametrize("spec", [V20A2, V20B1, V20RC0],
                         ids=["20a2", "20b1", "20rc0"])
def test_chain_matches_numpy_oracle(spec):
    got, want = _run_pair(spec)
    np.testing.assert_allclose(got, want, atol=1e-3)


@pytest.mark.parametrize("spec", [V20A2, V20B1, V20RC0],
                         ids=["20a2", "20b1", "20rc0"])
def test_chain_soft_pitch_matches_oracle(spec):
    """soft_pitch mode (E[bin] conditioning, un-rounded transform,
    interpolated pitch embedding) against the float64 oracle's soft path.
    Random-init logits are nearly flat, so the expectation is a genuinely
    wide mixture -- a strong test of the softmax/interp agreement.  Also
    exercises the pitch transform un-rounded (shift + correction)."""
    got, want = _run_pair(
        spec, {"pitch_shift": 3.0, "intonation_intensity": 1.2},
        seed=3, soft_pitch=True)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_chain_matches_oracle_with_controls():
    got, want = _run_pair(
        V20RC0,
        {"vq_num_neighbors": 4, "pitch_shift": 7.0, "pitch_correction": 0.5,
         "pitch_correction_type": 1, "intonation_intensity": 1.5},
        seed=1,
    )
    np.testing.assert_allclose(got, want, atol=1e-3)


@pytest.mark.parametrize("spec", [V20A2, V20B1, V20RC0],
                         ids=["20a2", "20b1", "20rc0"])
def test_chain_matches_oracle_long_horizon(spec):
    """3 s / 300 frames: past every ring revolution in the conv carries and
    deep into harmonic-phase accumulation (the mod-scan's failure modes are
    invisible at 12 frames), with nontrivial controls, still at 1e-3."""
    overrides = {"pitch_shift": 5.0, "pitch_correction": 0.35,
                 "intonation_intensity": 1.2}
    if spec.has_vq:
        overrides["vq_num_neighbors"] = 2
    got, want = _run_pair(spec, overrides, seed=2, t=300)
    assert got.shape == (300 * 240,)
    np.testing.assert_allclose(got, want, atol=1e-3)
    # the tail (max phase accumulation) alone must also hold the gate
    np.testing.assert_allclose(got[-2400:], want[-2400:], atol=1e-3)


def test_chain_matches_oracle_morph_lottery():
    """The full morph path through the oracle: morph-pad weights -> fold +
    threshold + top-8 prune -> float64 spherical average (additive + KV) ->
    formant-shift add -> per-frame codebook lottery -> chain.  The JAX side
    runs the serving formulation (morpher.py + per-frame T=1 ticks with the
    shared codebook bank); the oracle side is reference_impl's independent
    float64 mirror."""
    import jax.numpy as jnp

    from beatrice_vst_tpu import reference_impl as oref
    from beatrice_vst_tpu.ops.morph import (
        prepare_voice_morph_weights, prune_top_k)
    from beatrice_vst_tpu.speakers import morpher

    spec = V20RC0
    cfg = VoiceConverterConfig.for_version(spec)
    params = chain.init(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(3)
    n_spk, t = 5, 48
    bank_np = {
        "additive": (rng.standard_normal((n_spk, 256)) * 0.5).astype(np.float32),
        "formant": (rng.standard_normal((9, 256)) * 0.1).astype(np.float32),
        "kv": (rng.standard_normal((n_spk, 384, 128)) * 0.5).astype(np.float32),
        "codebook": rng.standard_normal((n_spk, 512, 128)).astype(np.float32),
    }
    audio = (0.3 * np.sin(2 * np.pi * 185 * np.arange(t * 160) / 16000)
             + 0.02 * rng.standard_normal(t * 160)).astype(np.float32)
    dense = np.zeros(MAX_N_SPEAKERS, np.float32)
    dense[:n_spk] = [0.40, 0.30, 0.18, 0.005, 0.115]  # one below threshold
    formant_index = 6  # formant shift +1.0 st

    # ---- oracle ----
    add_o, kv_o, pruned_o, top8_o = oref.morph_conditioning(
        bank_np, dense, n_spk, formant_index)
    cb_idx_o = oref.codebook_lottery(
        pruned_o[top8_o], top8_o, n_spk, np.arange(t, dtype=np.uint32))
    want = oref.chain_forward(params, cfg, audio, target_settings={
        "speaker_embedding": add_o, "kv": kv_o,
        "codebook_bank": bank_np["codebook"], "codebook_idx": cb_idx_o,
        "vq_num_neighbors": 3, "pitch_shift": 2.0,
    })

    # ---- JAX serving formulation ----
    bank_j = {k: jnp.asarray(v) for k, v in bank_np.items()}
    w = jnp.asarray(dense)[None]
    pruned = prepare_voice_morph_weights(w, jnp.asarray([n_spk]))
    pruned, top_idx = prune_top_k(pruned, 8)
    morphed = morpher.update_morphed_embeddings(bank_j, pruned, top_idx)
    additive, kv, _ = morpher.select_conditioning(
        bank_j, jnp.asarray([n_spk]), morphed, jnp.asarray([formant_index]))

    # morphed conditioning itself holds a tight gate vs the f64 oracle
    np.testing.assert_allclose(np.asarray(additive)[0], add_o, atol=2e-3)
    np.testing.assert_allclose(np.asarray(kv)[0], kv_o, atol=2e-3)

    # per-frame lottery picks are identical
    counters = jnp.arange(t, dtype=jnp.uint32)[None]
    cb_idx_j = morpher.codebook_lottery(
        pruned, top_idx, jnp.asarray([n_spk]), counters)
    np.testing.assert_array_equal(np.asarray(cb_idx_j)[0], cb_idx_o)

    base = {
        "speaker_embedding": additive, "kv": kv,
        "codebook_bank": bank_j["codebook"],
        "vq_num_neighbors": jnp.asarray([3]),
        "min_q": jnp.asarray([1]), "max_q": jnp.asarray([spec.pitch_bins - 1]),
        "average_source_pitch": jnp.asarray([52.0], jnp.float32),
        "intonation_intensity": jnp.asarray([1.0], jnp.float32),
        "pitch_shift": jnp.asarray([2.0], jnp.float32),
        "pitch_correction": jnp.asarray([0.0], jnp.float32),
        "pitch_correction_type": jnp.asarray([0]),
    }
    step = jax.jit(
        lambda p, frame, st, cond: chain.apply(p, cfg, frame, st, cond))
    state = chain.init_state(cfg, (1,))
    outs = []
    for tt in range(t):
        cond = dict(base, codebook_idx=cb_idx_j[:, tt])
        out, state = step(params, jnp.asarray(audio[None, tt * 160:(tt + 1) * 160]),
                          state, cond)
        outs.append(np.asarray(out)[0])
    got = np.concatenate(outs)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_morph_pad_weights_match_oracle():
    """Morph-pad marker math (cursor/falloff/marker -> per-voice weights)
    against the float64 mirror, batched vs scalar."""
    import jax.numpy as jnp

    from beatrice_vst_tpu import reference_impl as oref
    from beatrice_vst_tpu.ops.morph import calculate_voice_weights

    rng = np.random.default_rng(7)
    b, m = 6, 8
    cx, cy = rng.uniform(-1, 1, b), rng.uniform(-1, 1, b)
    falloff = np.array([1.5, 0.8, 0.0, 2.0, 1.0, 3.0])
    mx, my = rng.uniform(-1, 1, (b, m)), rng.uniform(-1, 1, (b, m))
    vid = rng.integers(0, 12, (b, m))
    count = np.array([8, 3, 5, 1, 8, 2])

    got = np.asarray(calculate_voice_weights(
        jnp.asarray(cx, jnp.float32), jnp.asarray(cy, jnp.float32),
        jnp.asarray(falloff, jnp.float32), jnp.asarray(vid),
        jnp.asarray(mx, jnp.float32), jnp.asarray(my, jnp.float32),
        jnp.asarray(count)))
    for i in range(b):
        want = oref.morph_voice_weights(
            cx[i], cy[i], falloff[i], vid[i], mx[i], my[i], count[i])
        np.testing.assert_allclose(got[i], want, atol=1e-5)


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
