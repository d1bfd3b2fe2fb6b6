"""Synthetic corpus generator + objective quality metrics."""

import numpy as np

from beatrice_vst_tpu.training.quality import compare, f0_track, mcd_db
from beatrice_vst_tpu.training.synthesis import (SR, default_speakers, render,
                                                 sample_utterance)


def _utt(seed=0):
    return sample_utterance(np.random.default_rng(seed), 4, 6)


def test_render_deterministic_finite_bounded():
    segs, f0 = _utt()
    spk = default_speakers(2)[0]
    y1 = render(segs, f0, spk, np.random.default_rng(3))
    y2 = render(segs, f0, spk, np.random.default_rng(3))
    np.testing.assert_array_equal(y1, y2)
    assert np.isfinite(y1).all()
    assert 0.25 < np.abs(y1).max() <= 0.32
    assert len(y1) % 480 == 0  # whole 10 ms frames at 48 kHz


def test_speakers_are_spectrally_distinct_but_share_pitch():
    segs, f0 = _utt(1)
    spks = default_speakers(4)
    ys = [render(segs, f0, s, np.random.default_rng(10 + i))
          for i, s in enumerate(spks)]
    self_floor = mcd_db(ys[0],
                        render(segs, f0, spks[0], np.random.default_rng(99)),
                        SR)
    cross = mcd_db(ys[0], ys[3], SR)
    assert cross > self_floor + 3.0  # timbre carries speaker identity
    c = compare(ys[0], ys[3], SR)
    # pitch contour is shared across speakers by design
    assert c["f0_rmse_cents"] is None or c["f0_rmse_cents"] < 200.0
    assert c["voicing_agreement"] > 0.8


def test_f0_tracker_recovers_known_contour():
    segs, f0_true = _utt(2)
    spk = default_speakers(2)[1]
    y = render(segs, f0_true, spk, np.random.default_rng(5))
    f0_est, voiced = f0_track(y, SR)
    assert voiced.sum() > 10
    m = min(len(f0_true), len(f0_est))
    sel = voiced[:m]
    err = 1200 * np.abs(np.log2(f0_est[:m][sel] / f0_true[:m][sel]))
    assert np.median(err) < 60.0  # half a semitone


def test_plan_f0_voiced_gating_and_truth_metric():
    """plan_f0_voiced zeros pauses/fricatives; a rendition scored against
    its own gated plan (f0_rmse_cents_vs_truth) tracks tightly."""
    from beatrice_vst_tpu.training.quality import f0_rmse_cents_vs_truth
    from beatrice_vst_tpu.training.synthesis import plan_f0_voiced

    segs, f0_true = _utt(3)
    gt = plan_f0_voiced(segs, f0_true)
    assert gt.shape[0] == sum(n for _, n in segs)
    frac = float((gt > 0).mean())
    assert 0.3 < frac < 0.95  # pauses exist and are gated out
    np.testing.assert_array_equal(gt[gt > 0] > 50.0,
                                  np.ones((gt > 0).sum(), bool))
    spk = default_speakers(2)[0]
    y = render(segs, f0_true, spk, np.random.default_rng(6))
    rmse, agree = f0_rmse_cents_vs_truth(y, gt, SR)
    assert rmse < 120.0, rmse
    assert agree > 0.75, agree


def test_pairs_layout_feeds_pair_dataset(tmp_path):
    import json

    from beatrice_vst_tpu.audio_io import write_wav
    from beatrice_vst_tpu.training.data import PairDataset

    segs, f0 = _utt(3)
    spks = default_speakers(2)
    d = tmp_path / "pairs"
    (d / "inputs").mkdir(parents=True)
    (d / "targets").mkdir()
    spk_map = {}
    for j in range(2):
        a = render(segs, f0, spks[0], np.random.default_rng(j))
        b = render(segs, f0, spks[1], np.random.default_rng(100 + j))
        name = f"u{j}_s0_t1"
        write_wav(str(d / "inputs" / f"{name}.wav"), a, SR)
        write_wav(str(d / "targets" / f"{name}.wav"), b, SR)
        spk_map[name] = 1
    (d / "speakers.json").write_text(json.dumps(spk_map))
    ds = PairDataset(str(d))
    assert not ds.identity_mode
    assert len(ds.items) == 2
    a16, t24, sid, f0_hz = ds.items[0]
    assert sid == 1
    assert len(a16) // 160 == len(t24) // 240  # aligned frame grid
