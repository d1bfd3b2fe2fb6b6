"""Per-stream fault isolation: a hostile stream never affects the batch
(SURVEY.md section 5.3: 'a bad stream mutes itself, never the batch')."""

import numpy as np
import jax
import jax.numpy as jnp

from beatrice_vst_tpu.constants import V20A2
from beatrice_vst_tpu.models import chain
from beatrice_vst_tpu.runtime import EngineConfig, StreamEngine
from beatrice_vst_tpu.speakers import bank as bank_mod


def make_engine(cap=3):
    cfg = EngineConfig.realtime(cap, V20A2)
    params = chain.init(jax.random.PRNGKey(0), cfg.model)
    bank = bank_mod.random_bank(jax.random.PRNGKey(1), V20A2, 3)
    return StreamEngine(cfg, params, bank, jit=False)


def tone_blocks(n_blocks, cap, poison_idx=None, poison_kind="nan"):
    t = np.arange(n_blocks * 480) / 48000
    x = np.tile((0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), (cap, 1))
    if poison_idx is not None:
        if poison_kind == "nan":
            x[poison_idx] = np.nan
        elif poison_kind == "inf":
            x[poison_idx, ::7] = np.inf
        else:
            x[poison_idx] *= 1e30
    return x


def test_nan_stream_does_not_poison_neighbors():
    eng = make_engine()
    for _ in range(3):
        eng.admit()
    blocks = 20
    clean = tone_blocks(blocks, 3)
    poisoned = tone_blocks(blocks, 3, poison_idx=1, poison_kind="nan")

    ref_out = []
    out = []
    eng2 = make_engine()
    for _ in range(3):
        eng2.admit()
    for b in range(blocks):
        o1 = np.asarray(eng.tick(jnp.asarray(poisoned[:, b * 480:(b + 1) * 480])))
        o2 = np.asarray(eng2.tick(jnp.asarray(clean[:, b * 480:(b + 1) * 480])))
        out.append(o1)
        ref_out.append(o2)
    out = np.concatenate(out, axis=1)
    ref = np.concatenate(ref_out, axis=1)
    # neighbors bit-identical to the clean run
    np.testing.assert_array_equal(out[0], ref[0])
    np.testing.assert_array_equal(out[2], ref[2])
    # the poisoned stream itself stays finite (input sanitized to silence)
    assert np.isfinite(out[1]).all()


def test_inf_and_huge_amplitude_stay_finite():
    for kind in ("inf", "huge"):
        eng = make_engine(2)
        eng.admit()
        eng.admit()
        x = tone_blocks(6, 2, poison_idx=0, poison_kind=kind)
        outs = []
        for b in range(6):
            outs.append(np.asarray(eng.tick(jnp.asarray(x[:, b * 480:(b + 1) * 480]))))
        out = np.concatenate(outs, axis=1)
        assert np.isfinite(out).all(), kind
        assert np.abs(out).max() <= 1.0


def test_midflight_admission_equals_fresh_admission():
    """A stream admitted at an arbitrary tick must behave exactly like one
    admitted at tick 0: admission always resets the slot's carries, so junk
    the host left in unadmitted input rows (only outputs are masked) never
    leaks into a new stream, and the ring conv-state convention must be
    origin-independent (zero rows read as zeros at any tick_idx)."""
    cap, warm, blocks = 3, 13, 20
    rng = np.random.default_rng(7)
    sig = tone_blocks(blocks, 1)[0]

    eng_a = make_engine(cap)
    # run unadmitted for a while with garbage in EVERY input row
    for b in range(warm):
        junk = rng.standard_normal((cap, 480)).astype(np.float32)
        out = np.asarray(eng_a.tick(jnp.asarray(junk)))
        assert np.abs(out).max() == 0.0  # nothing admitted -> silence
    ia = eng_a.admit()

    eng_b = make_engine(cap)
    ib = eng_b.admit()

    out_a, out_b = [], []
    for b in range(blocks):
        xa = rng.standard_normal((cap, 480)).astype(np.float32)
        xb = rng.standard_normal((cap, 480)).astype(np.float32)
        xa[ia] = xb[ib] = sig[b * 480:(b + 1) * 480]
        out_a.append(np.asarray(eng_a.tick(jnp.asarray(xa)))[ia])
        out_b.append(np.asarray(eng_b.tick(jnp.asarray(xb)))[ib])
    a = np.concatenate(out_a)
    b_ = np.concatenate(out_b)
    assert np.abs(b_).max() > 1e-6
    # same math at a different ring origin: tolerance only for fusion-order
    # float drift, not for state leakage (leaked junk would blow past this)
    np.testing.assert_allclose(a, b_, rtol=2e-4, atol=6e-5)


def test_poisoned_stream_recovers_after_clean_input():
    """After the hostile input stops, the stream must produce normal audio
    again (no NaN persisted in its state)."""
    eng = make_engine(1)
    eng.admit()
    bad = np.full((1, 480), np.nan, np.float32)
    for _ in range(5):
        eng.tick(jnp.asarray(bad))
    # state must be finite
    for leaf in jax.tree_util.tree_leaves(eng.state["model"]):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert bool(jnp.isfinite(leaf).all())
    good = tone_blocks(25, 1)
    outs = []
    for b in range(25):
        outs.append(np.asarray(eng.tick(jnp.asarray(good[:, b * 480:(b + 1) * 480]))))
    out = np.concatenate(outs, axis=1)
    assert np.isfinite(out).all()
    assert np.abs(out[:, -4800:]).max() > 0  # audible again


def test_engine_recover_rebuilds_state_and_reactivates():
    """Elastic recovery (SURVEY 5.3): after a device failure the engine
    rebuilds its state; occupied slots re-activate, contexts reset."""
    eng = make_engine()
    i0 = eng.admit()
    i1 = eng.admit()
    eng.set_control(i1, "target_speaker", np.int32(2))
    x = tone_blocks(1, 3)
    out = np.asarray(eng.tick(x))
    assert np.abs(out[i0]).max() > 0

    active = eng.recover()
    assert sorted(active) == sorted([i0, i1])
    assert eng.counters["recoveries"] == 1
    # next tick applies the re-activation; streams produce audio again
    out = np.asarray(eng.tick(x))
    assert np.isfinite(out).all()
    assert np.abs(out[i0]).max() > 0 and np.abs(out[i1]).max() > 0
    # the never-admitted slot stays silent
    assert np.abs(out[2]).max() == 0
    # recovery replays the engine-level control shadow (no ModelHost needed)
    assert int(np.asarray(eng.state["controls"]["target_speaker"][i1])) == 2


def test_engine_recover_replays_controls_without_model_host():
    """Raw-engine recovery preserves controls: the engine keeps a host-side
    shadow of everything set via set_control and replays it on recover(),
    so a recovered engine is indistinguishable from a freshly built one
    with the same controls (bit-identical output)."""
    from beatrice_vst_tpu.constants import MAX_N_SPEAKERS, SPH_AVG_MAX_N_SPEAKERS

    def setup(eng):
        i0 = eng.admit()
        i1 = eng.admit()
        eng.set_control(i1, "target_speaker", np.int32(2))
        eng.set_control(i1, "pitch_shift", np.float32(4.0))
        eng.set_control(i0, "intonation_intensity", np.float32(0.5))
        w = np.zeros(MAX_N_SPEAKERS, np.float32)
        w[0], w[2] = 0.6, 0.4
        top = np.zeros(SPH_AVG_MAX_N_SPEAKERS, np.int32)
        top[1] = 2
        eng.set_control(i0, "morph_weights", w)
        eng.set_control(i0, "morph_top_idx", top)
        return i0, i1

    eng = make_engine()
    i0, i1 = setup(eng)
    x = tone_blocks(1, 3)
    eng.tick(x)  # run a tick so carries are non-trivial before the failure
    eng.recover()
    out_recovered = np.asarray(eng.tick(x))

    fresh = make_engine()
    setup(fresh)
    out_fresh = np.asarray(fresh.tick(x))

    c = eng.state["controls"]
    assert int(np.asarray(c["target_speaker"][i1])) == 2
    assert float(np.asarray(c["pitch_shift"][i1])) == 4.0
    assert float(np.asarray(c["intonation_intensity"][i0])) == 0.5
    np.testing.assert_array_equal(out_recovered, out_fresh)


def test_server_recovers_from_tick_failure():
    """The scheduler thread survives a transient device failure: one tick
    of silence, engine rebuilt, registered replay callback invoked."""
    import time

    from beatrice_vst_tpu.runtime import StreamingServer

    eng = make_engine()
    server = StreamingServer(eng, realtime=False)
    replayed = []
    server.on_recover(lambda: replayed.append(True))

    orig_tick = eng.tick
    fail = {"n": 1}

    def flaky_tick(audio):
        if fail["n"]:
            fail["n"] -= 1
            raise RuntimeError("injected device failure")
        return orig_tick(audio)

    eng.tick = flaky_tick
    server.start()
    try:
        s = server.open_session(48000.0)
        deadline = time.monotonic() + 30.0
        got = np.zeros(0, np.float32)
        while time.monotonic() < deadline:
            s.push(tone_blocks(1, 1)[0])
            got = s.pull(480)
            if eng.counters.get("recoveries") and len(got) and np.abs(got).max() > 0:
                break
            time.sleep(0.01)
    finally:
        server.stop()
    assert eng.counters.get("recoveries") == 1
    assert replayed, "recover callback not invoked"
    assert len(got) and np.isfinite(got).all() and np.abs(got).max() > 0


def test_recover_with_morph_slots_and_replay():
    """Recovery in slots mode with a leased morph slot: the lease survives
    (host bookkeeping), conditioning re-primes after the control plane
    replays the morph parameters."""
    from beatrice_vst_tpu.constants import V20RC0

    cfg = EngineConfig.realtime(3, V20RC0)
    import dataclasses
    cfg = dataclasses.replace(cfg, n_morph_slots=2)
    params = chain.init(jax.random.PRNGKey(0), cfg.model)
    bank = bank_mod.random_bank(jax.random.PRNGKey(1), V20RC0, 3)
    eng = StreamEngine(cfg, params, bank, jit=False)
    for _ in range(3):
        eng.admit()
    w = np.zeros(256, np.float32)
    w[0], w[1] = 0.6, 0.4
    eng.set_control(0, "morph_weights", w)
    eng.set_control(0, "morph_top_idx",
                    np.asarray([0, 1, 0, 0, 0, 0, 0, 0], np.int32))
    eng.set_control(0, "target_speaker", np.int32(3))  # morph mode
    x = np.tile((0.2 * np.sin(2 * np.pi * 220 * np.arange(480) / 48000)
                 ).astype(np.float32), (3, 1))
    out0 = np.asarray(eng.tick(x))
    assert np.abs(out0[0]).max() > 0
    lease_before = dict(eng._morph_slot)

    eng.recover()
    assert eng._morph_slot == lease_before  # host lease bookkeeping kept
    # control plane replays the morph parameters (what ModelHost does)
    eng.set_control(0, "morph_weights", w)
    eng.set_control(0, "morph_top_idx",
                    np.asarray([0, 1, 0, 0, 0, 0, 0, 0], np.int32))
    eng.set_control(0, "target_speaker", np.int32(3))
    out = np.asarray(eng.tick(x))
    out = np.asarray(eng.tick(x))
    assert np.isfinite(out).all()
    assert np.abs(out[0]).max() > 0  # the morph stream produces audio again
    # and its slot bank row is re-primed (non-zero K rows)
    assert np.abs(np.asarray(eng.state["kv_slots"]["k"])).max() > 0
