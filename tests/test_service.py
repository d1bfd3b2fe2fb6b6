"""ModelHost: model load/swap with session survival + parameter replay;
chunked offline conversion equivalence."""

import numpy as np
import jax
import pytest

from beatrice_vst_tpu.errors import ErrorCode
from beatrice_vst_tpu.models.io import init_random_model_dir
from beatrice_vst_tpu.params import ParameterID
from beatrice_vst_tpu.runtime import ModelHost
from beatrice_vst_tpu.runtime.offline import ConversionSettings, convert_utterance


@pytest.fixture(scope="module")
def model_dirs(tmp_path_factory):
    d1 = str(tmp_path_factory.mktemp("m1"))
    d2 = str(tmp_path_factory.mktemp("m2"))
    init_random_model_dir(d1, version="2.0.0-alpha.2", n_voices=3, seed=0)
    init_random_model_dir(d2, version="2.0.0-alpha.2", n_voices=3, seed=7)
    return d1, d2


def tone(n, sr=48000.0):
    return (0.3 * np.sin(2 * np.pi * 220 * np.arange(n) / sr)).astype(np.float32)


def test_model_host_lifecycle_and_swap(model_dirs):
    d1, d2 = model_dirs
    host = ModelHost(capacity=2, realtime=False, jit=False)
    s = host.open_session(48000.0)
    assert not host.loaded
    assert host.load_model(d1) == ErrorCode.SUCCESS
    assert host.loaded and s.stream is not None

    # set parameters; they must survive a model swap via replay
    assert s.set_parameter(ParameterID.VOICE, 2) == ErrorCode.SUCCESS
    assert s.set_parameter(ParameterID.PITCH_SHIFT, 5.0) == ErrorCode.SUCCESS
    host.engine.flush_controls()
    idx = s.stream.idx
    assert int(host.engine.state["controls"]["target_speaker"][idx]) == 2

    s.push(tone(48000))
    for _ in range(20):
        host.tick_once()
    out1 = s.pull(48000)
    assert len(out1) > 0 and np.isfinite(out1).all()

    eng1 = host.engine
    assert host.load_model(d2) == ErrorCode.SUCCESS
    assert host.engine is not eng1  # fresh engine
    host.engine.flush_controls()
    idx2 = s.stream.idx
    # replayed controls landed on the new engine
    assert int(host.engine.state["controls"]["target_speaker"][idx2]) == 2
    assert float(host.engine.state["controls"]["pitch_shift"][idx2]) == 5.0

    s.push(tone(24000))
    for _ in range(10):
        host.tick_once()
    out2 = s.pull(24000)
    assert np.isfinite(out2).all()

    # state blob roundtrip at the session level
    blob = s.state_bytes()
    assert s.restore_state_bytes(blob) == ErrorCode.SUCCESS
    s.close()
    assert host.engine.n_active == 0
    host.stop()


def test_load_missing_model_reports_error(model_dirs):
    host = ModelHost(capacity=1, realtime=False, jit=False)
    assert host.load_model("/nonexistent/dir") == ErrorCode.FILE_OPEN_ERROR


def test_chunked_offline_matches_single_shot(model_dirs):
    d1, _ = model_dirs
    from beatrice_vst_tpu.models.io import load_model_dir

    config, cfg, params, bank = load_model_dir(d1)
    x = tone(24000)
    full = convert_utterance(params, cfg, bank, x, 48000.0,
                             ConversionSettings(target_speaker=1))
    chunked = convert_utterance(params, cfg, bank, x, 48000.0,
                                ConversionSettings(target_speaker=1),
                                chunk_frames=7)
    assert chunked.shape == full.shape
    # fp reassociation across chunk boundaries can flip a near-tied pitch
    # argmax, changing isolated frames legitimately; a broken carry handoff
    # would diverge *everywhere after the first chunk*.  Require the vast
    # majority of samples to match tightly.
    mismatched = np.mean(np.abs(chunked - full) > 1e-3)
    assert mismatched < 0.02, f"{mismatched:.1%} of samples differ"


def test_recovery_replays_session_parameters(model_dirs):
    """After elastic recovery the ModelHost replays every session's
    ParameterState into the rebuilt engine (restore-by-replay)."""
    import time

    d1, _ = model_dirs
    host = ModelHost(capacity=2, realtime=False, jit=False)
    assert host.load_model(d1) == ErrorCode.SUCCESS
    s = host.open_session(48000.0)
    s.set_parameter(ParameterID.VOICE, 2)
    s.set_parameter(ParameterID.PITCH_SHIFT, 5.0)
    eng = host.engine
    idx = s.stream.idx

    orig_tick = eng.tick
    fail = {"n": 1}

    def flaky(audio):
        if fail["n"]:
            fail["n"] -= 1
            raise RuntimeError("injected failure")
        return orig_tick(audio)

    eng.tick = flaky
    host.server.start()
    try:
        deadline = time.monotonic() + 60.0
        while time.monotonic() < deadline:
            s.push(tone(480))
            # wait for recovery AND for the post-recovery flush tick (the
            # jit=False eager tick is slow on CPU) to land the replay
            if eng.counters.get("recoveries") and int(
                np.asarray(eng.state["controls"]["target_speaker"][idx])
            ) == 2:
                break
            time.sleep(0.05)
    finally:
        host.server.stop()
    assert eng.counters.get("recoveries") == 1
    assert int(np.asarray(eng.state["controls"]["target_speaker"][idx])) == 2
    assert float(np.asarray(eng.state["controls"]["pitch_shift"][idx])) == 5.0
