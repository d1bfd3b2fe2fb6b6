"""Runtime engine: admission/eviction, muting, tick loop, control staging,
handle/proxy integration, offline conversion."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from beatrice_vst_tpu.constants import V20A2, V20RC0
from beatrice_vst_tpu.errors import ErrorCode
from beatrice_vst_tpu.models import chain
from beatrice_vst_tpu.runtime import (
    ConversionSettings,
    EngineConfig,
    StreamEngine,
    StreamHandle,
    convert_utterance,
)
from beatrice_vst_tpu.speakers import bank as bank_mod

CAP = 4


def make_engine(spec=V20RC0, jit=False):
    cfg = EngineConfig.realtime(CAP, spec)
    params = chain.init(jax.random.PRNGKey(0), cfg.model)
    bank = bank_mod.random_bank(jax.random.PRNGKey(1), spec, 6)
    return StreamEngine(cfg, params, bank, jit=jit)


def tone(n, f=220.0, sr=48000.0):
    return (0.3 * np.sin(2 * np.pi * f * np.arange(n) / sr)).astype(np.float32)


def test_inactive_streams_emit_zeros():
    eng = make_engine()
    x = jnp.asarray(np.tile(tone(480), (CAP, 1)))
    out = eng.tick(x)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_admit_activates_and_evict_mutes():
    eng = make_engine()
    idx = eng.admit()
    assert eng.n_active == 1
    x = jnp.asarray(np.tile(tone(480), (CAP, 1)))
    out = None
    for _ in range(40):  # run past resampler/frontend warmup
        out = np.asarray(eng.tick(x))
    assert np.abs(out[idx]).max() > 0.0
    others = [i for i in range(CAP) if i != idx]
    np.testing.assert_array_equal(out[others], 0.0)
    eng.evict(idx)
    out = np.asarray(eng.tick(x))
    np.testing.assert_array_equal(out[idx], 0.0)


def test_capacity_exhaustion():
    eng = make_engine()
    for _ in range(CAP):
        eng.admit()
    with pytest.raises(RuntimeError):
        eng.admit()


def test_handle_implements_core_interface():
    eng = make_engine()
    idx = eng.admit()
    h = StreamHandle(eng, idx)
    assert h.set_target_speaker(3) == ErrorCode.SUCCESS
    assert h.set_target_speaker(99) == ErrorCode.SPEAKER_ID_OUT_OF_RANGE
    assert h.set_formant_shift(1.0) == ErrorCode.SUCCESS
    assert h.set_pitch_shift(100.0) == ErrorCode.SUCCESS  # clamps
    assert h.set_pitch_correction_type(2) == ErrorCode.INVALID_PITCH_CORRECTION_TYPE
    assert h.set_min_source_pitch(45.0) == ErrorCode.SUCCESS
    w = np.zeros(256, np.float32)
    w[1], w[2] = 0.6, 0.4
    assert h.set_speaker_morphing_weights(w) == ErrorCode.SUCCESS
    eng.flush_controls()
    c = eng.state["controls"]
    assert int(c["target_speaker"][idx]) == 3
    assert int(c["formant_index"][idx]) == 6
    assert float(c["pitch_shift"][idx]) == 24.0
    assert int(c["min_q"][idx]) == 96
    # morph refresh populated per-stream embeddings
    assert float(jnp.abs(eng.state["morphed"]["additive"][idx]).max()) > 0.0


def test_proxy_drives_stream_handle(tmp_path):
    from beatrice_vst_tpu.params import ProcessorProxy, ParameterID

    toml = tmp_path / "config.toml"
    toml.write_text(
        '[model]\nversion = "2.0.0-rc.0"\nname = "m"\ndescription = ""\n'
        + "\n".join(
            f'[voice.{i}]\nname = "v{i}"\ndescription = ""\naverage_pitch = 60.0\n'
            f'[voice.{i}.portrait]\npath = ""\ndescription = ""\n'
            for i in range(6)
        )
    )
    eng = make_engine()
    idx = eng.admit()
    proxy = ProcessorProxy(lambda config: StreamHandle(eng, idx))
    assert proxy.load_model(str(toml)) == ErrorCode.SUCCESS
    assert proxy.set_parameter(ParameterID.VOICE, 2) == ErrorCode.SUCCESS
    eng.flush_controls()
    assert int(eng.state["controls"]["target_speaker"][idx]) == 2
    # full state roundtrip through the binary format
    blob = proxy.state_bytes()
    assert proxy.restore_state_bytes(blob) == ErrorCode.SUCCESS


def test_tick_chain_continuity():
    """Two consecutive ticks must equal one double-length tick through the
    same state (streaming correctness through resamplers + chain)."""
    spec = V20A2
    cfg1 = EngineConfig.realtime(2, spec)
    cfg2 = EngineConfig(capacity=2, model=cfg1.model, frames_per_tick=2)
    params = chain.init(jax.random.PRNGKey(0), cfg1.model)
    bank = bank_mod.random_bank(jax.random.PRNGKey(1), spec, 3)
    from beatrice_vst_tpu.runtime.engine import engine_tick, init_engine_state

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 960)) * 0.1, jnp.float32)

    s1 = init_engine_state(cfg1)
    s1["controls"]["active"] = jnp.ones(2, bool)
    o_a, s1 = engine_tick(params, bank, s1, x[:, :480], cfg=cfg1)
    o_b, s1 = engine_tick(params, bank, s1, x[:, 480:], cfg=cfg1)
    two = np.concatenate([np.asarray(o_a), np.asarray(o_b)], axis=1)

    s2 = init_engine_state(cfg2)
    s2["controls"]["active"] = jnp.ones(2, bool)
    o_full, _ = engine_tick(params, bank, s2, x, cfg=cfg2)
    np.testing.assert_allclose(two, np.asarray(o_full), rtol=2e-4, atol=2e-5)


def test_offline_convert_shapes_and_rates():
    spec = V20RC0
    cfg = EngineConfig.realtime(1, spec).model
    params = chain.init(jax.random.PRNGKey(0), cfg)
    bank = bank_mod.random_bank(jax.random.PRNGKey(1), spec, 4)
    x = tone(48000)  # 1 s @48k
    y = convert_utterance(params, cfg, bank, x, 48000.0,
                          ConversionSettings(target_speaker=1, vq_num_neighbors=2))
    assert y.ndim == 1 and abs(len(y) - 48000) <= 480
    assert np.isfinite(y).all()
    # morph mode
    y2 = convert_utterance(
        params, cfg, bank, x, 48000.0,
        ConversionSettings(morph_weights=np.asarray([0.5, 0.5, 0, 0])),
    )
    assert np.isfinite(y2).all()
    assert not np.allclose(y, y2)


def test_stream_axes_cache_survives_merged_ring_flip(monkeypatch):
    """The merged-mel-ring knob changes the engine state TREE for the same
    cfg, and _stream_axes is lru-cached -- the knob must be part of the
    cache key everywhere (a mid-process flip, e.g. scripts/bench_ab.py,
    once served a stale merged-structure axes tree against a fresh split
    eval_shape and crashed tree_map with a dict-key mismatch)."""
    from beatrice_vst_tpu.runtime import engine as eng_mod

    cfg = EngineConfig.realtime(CAP, V20RC0)
    for knob in ("1", "0", "1"):
        monkeypatch.setenv("BEATRICE_MERGED_MEL_RING", knob)
        shapes = jax.eval_shape(lambda: eng_mod.init_engine_state(cfg))
        axes = eng_mod._stream_axes(cfg, chain.merged_mel_ring_enabled())
        for key in ("model", "rs_in", "rs_out"):
            # the exact zip _ring_layout_formats performs: structures of
            # the live eval_shape and the cached axes tree must agree
            jax.tree_util.tree_map(lambda a, b: None, shapes[key], axes[key])


def test_ring_slot_stride_exact(monkeypatch):
    """Lane-aligned merged-ring slots (BEATRICE_RING_SLOT_STRIDE, ROOFLINE
    fat #4) must be EXACTLY equivalent to the dense layout: pad rows are
    never written and the DFT bases are zero there.  Runs the serving
    (T=1 ring) path for enough ticks to wrap the ring in both layouts."""
    from beatrice_vst_tpu.models import layers

    spec = V20RC0
    cfg = EngineConfig.realtime(2, spec).model
    params = chain.init(jax.random.PRNGKey(0), cfg)
    cond = chain.default_cond(cfg, (2,))
    rng = np.random.default_rng(0)
    frames = [jnp.asarray(rng.standard_normal((2, 160)) * 0.1, jnp.float32)
              for _ in range(10)]

    outs = {}
    for stride in ("0", "256"):
        monkeypatch.setenv("BEATRICE_RING_SLOT_STRIDE", stride)
        layers.clear_env_knob_caches()
        state = chain.init_state(cfg, (2,), ring=True)
        assert "audio" in state
        ys = []
        for i, f in enumerate(frames):
            y, state = chain.apply(params, cfg, f, state, cond, t_index=i)
            ys.append(np.asarray(y))
        outs[stride] = np.concatenate(ys, axis=-1)
    layers.clear_env_knob_caches()
    np.testing.assert_allclose(outs["256"], outs["0"], atol=2e-6)
