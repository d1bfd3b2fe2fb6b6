"""Parameter system: schema coverage, coupled Lock semantics, binary
round-trip, TOML model cards, proxy replay."""

import io

import numpy as np
import pytest

from beatrice_vst_tpu.errors import BeatriceError, ErrorCode
from beatrice_vst_tpu.params import (
    SCHEMA,
    Controller,
    ParameterID,
    ParameterState,
    ProcessorProxy,
    VoiceMorphStateParams,
    get_voice_morph_state,
    load_model_config,
    parse_model_config,
)

GOOD_TOML = """
[model]
version = "2.0.0-rc.0"
name = "TestModel"
description = "d"

[voice.0]
name = "A"
description = ""
average_pitch = 60.0
[voice.0.portrait]
path = ""
description = ""

[voice.1]
name = "B"
description = ""
average_pitch = 48.0
[voice.1.portrait]
path = ""
description = ""
"""


def test_schema_has_all_reference_parameters():
    # 18 scalar/list/string params + 24 morph markers + 257 hidden pitches
    ids = set(SCHEMA)
    for pid in [ParameterID.MODEL, ParameterID.VOICE, ParameterID.LOCK,
                ParameterID.VQ_NUM_NEIGHBORS, ParameterID.VOICE_MORPH_MARKER_COUNT]:
        assert int(pid) in ids
    assert int(ParameterID.AVERAGE_TARGET_PITCH_BASE) + 256 in ids
    assert len([i for i in ids if i >= int(ParameterID.AVERAGE_TARGET_PITCH_BASE)]) == 257
    morph_markers = [i for i in ids if 19 <= i < 19 + 24]
    assert len(morph_markers) == 24
    # ranges spot checks vs parameter_schema.cc
    assert SCHEMA[int(ParameterID.PITCH_SHIFT)].min_value == -24.0
    assert SCHEMA[int(ParameterID.MIN_SOURCE_PITCH)].default_value == 33.125
    assert SCHEMA[int(ParameterID.MAX_SOURCE_PITCH)].default_value == 80.875
    assert len(SCHEMA[int(ParameterID.VOICE)].values) == 257


def test_state_binary_roundtrip():
    s = ParameterState()
    s.set_value(ParameterID.VOICE, 3)
    s.set_value(ParameterID.PITCH_SHIFT, -4.5)
    s.set_value(ParameterID.MODEL, "/tmp/model/config.toml")
    data = s.to_bytes()
    s2 = ParameterState.from_bytes(data)
    assert s2.get_value(ParameterID.VOICE) == 3
    assert s2.get_value(ParameterID.PITCH_SHIFT) == -4.5
    assert s2.get_value(ParameterID.MODEL) == "/tmp/model/config.toml"
    # record layout: int16 id + int32 type + payload (parameter_state.cc:127-147)
    assert data[:2] == (1).to_bytes(2, "little")  # MODEL id first (sorted)


def test_state_truncated_raises():
    s = ParameterState()
    s.set_value(ParameterID.PITCH_SHIFT, 1.0)
    data = s.to_bytes()
    with pytest.raises(BeatriceError):
        ParameterState.from_bytes(data[:-3])


def test_model_config_parsing():
    cfg = parse_model_config(GOOD_TOML)
    assert cfg.version_int == 2
    assert cfg.voice_count == 2
    assert cfg.voices[1].average_pitch == 48.0


def test_model_config_rejects_gaps():
    bad = GOOD_TOML.replace("[voice.1]", "[voice.3]")
    with pytest.raises(BeatriceError) as e:
        parse_model_config(bad)
    assert e.value.code == ErrorCode.INVALID_MODEL_CONFIG


def test_model_config_rejects_bad_pitch():
    bad = GOOD_TOML.replace("average_pitch = 48.0", "average_pitch = 300.0")
    with pytest.raises(BeatriceError):
        parse_model_config(bad)


def test_model_config_nul_scrub():
    cfg = parse_model_config(GOOD_TOML.replace('name = "A"', 'name = "A\\u0000B"'))
    assert cfg.voices[0].name == "A B"


def _controller_with_model(tmp_path):
    p = tmp_path / "config.toml"
    p.write_text(GOOD_TOML)
    c = Controller()
    assert c.set_parameter(ParameterID.MODEL, str(p)) == ErrorCode.SUCCESS
    c.pop_updated_parameters()
    return c


def test_lock_semantics_voice_change(tmp_path):
    """Lock=0 (avg source fixed): voice change rewrites PitchShift;
    Lock=1: rewrites AverageSourcePitch (parameter_schema.cc:193-224)."""
    c = _controller_with_model(tmp_path)
    # after model load: voice 0, avg target 60, lock 0 ->
    # shift = clamp(60 - avg_source)
    avg_src = c.parameter_state.get_value(ParameterID.AVERAGE_SOURCE_PITCH)
    shift = c.parameter_state.get_value(ParameterID.PITCH_SHIFT)
    assert shift == pytest.approx(max(-24, min(24, 60.0 - avg_src)))

    c.set_parameter(ParameterID.VOICE, 1)  # avg target 48
    updates = dict(c.pop_updated_parameters())
    assert int(ParameterID.PITCH_SHIFT) in updates
    assert updates[int(ParameterID.PITCH_SHIFT)] == pytest.approx(
        max(-24, min(24, 48.0 - avg_src))
    )

    c.set_parameter(ParameterID.LOCK, 1)
    c.pop_updated_parameters()
    shift_before = c.parameter_state.get_value(ParameterID.PITCH_SHIFT)
    c.set_parameter(ParameterID.VOICE, 0)
    updates = dict(c.pop_updated_parameters())
    assert int(ParameterID.AVERAGE_SOURCE_PITCH) in updates
    assert updates[int(ParameterID.AVERAGE_SOURCE_PITCH)] == pytest.approx(
        60.0 - shift_before
    )
    # PitchShift untouched in lock=1
    assert c.parameter_state.get_value(ParameterID.PITCH_SHIFT) == shift_before


def test_pitch_shift_rewrites_avg_source(tmp_path):
    c = _controller_with_model(tmp_path)
    c.set_parameter(ParameterID.PITCH_SHIFT, 5.0)
    updates = dict(c.pop_updated_parameters())
    assert updates[int(ParameterID.AVERAGE_SOURCE_PITCH)] == pytest.approx(60.0 - 5.0)


def test_model_load_sets_target_pitches_and_morph(tmp_path):
    c = _controller_with_model(tmp_path)
    g = c.parameter_state.get_value
    assert g(int(ParameterID.AVERAGE_TARGET_PITCH_BASE) + 0) == 60.0
    assert g(int(ParameterID.AVERAGE_TARGET_PITCH_BASE) + 1) == 48.0
    # morph slot = mean (parameter_schema.cc:104-119)
    assert g(int(ParameterID.AVERAGE_TARGET_PITCH_BASE) + 2) == pytest.approx(54.0)
    # morph marker count clamped to voice count
    vm = get_voice_morph_state(c.parameter_state)
    assert vm.marker_count == 2


class RecordingCore:
    def __init__(self):
        self.calls = []

    def __getattr__(self, name):
        if name.startswith("set_") or name == "load_model":
            def fn(*a, **k):
                self.calls.append((name, a))
                return ErrorCode.SUCCESS
            return fn
        raise AttributeError(name)


def test_proxy_replays_all_parameters_on_load(tmp_path):
    p = tmp_path / "config.toml"
    p.write_text(GOOD_TOML)
    core = RecordingCore()
    proxy = ProcessorProxy(lambda config: core)
    assert proxy.load_model(str(p)) == ErrorCode.SUCCESS
    names = [n for n, _ in core.calls]
    assert "load_model" in names and "set_target_speaker" in names
    assert "set_pitch_shift" in names and "set_vq_num_neighbors" in names
    assert "set_speaker_morphing_weights" in names
    # state save/restore replays again (processor_proxy.cc:58-63)
    data = proxy.state_bytes()
    core.calls.clear()
    proxy.set_parameter(ParameterID.PITCH_SHIFT, 3.0)
    assert ("set_pitch_shift", (3.0,)) in core.calls
    core.calls.clear()
    assert proxy.restore_state_bytes(data) == ErrorCode.SUCCESS
    assert ("set_pitch_shift", (0.0,)) in core.calls  # restored default


def test_morph_weights_from_params():
    vm = VoiceMorphStateParams(cursor_x=0.18, cursor_y=0.5, falloff=2.0,
                               marker_count=4)
    w = vm.calculate_weights()
    assert w.shape == (256,)
    assert w[0] > 0.9  # cursor sits on marker 0
    np.testing.assert_allclose(w.sum(), 1.0, atol=1e-5)
