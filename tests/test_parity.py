"""Full-stack streaming vs offline parity (the allclose(1e-3) gate)."""

import pytest

from beatrice_vst_tpu.constants import V20A2, V20B1, V20RC0
from beatrice_vst_tpu.parity import run_parity


@pytest.mark.parametrize("spec", [V20A2, V20B1, V20RC0],
                         ids=["20a2", "20b1", "20rc0"])
def test_streaming_matches_offline(spec):
    report = run_parity(spec=spec, n_frames=20, batch=2)
    assert report.passed, str(report)
    assert report.max_abs_diff < 1e-3


def test_parity_with_pitch_controls():
    report = run_parity(
        spec=V20RC0, n_frames=15,
        controls={
            "pitch_shift": 5.0,
            "intonation_intensity": 1.5,
            "pitch_correction": 0.5,
            "vq_num_neighbors": 3,
            "target_speaker": 1,
        },
    )
    assert report.passed, str(report)
