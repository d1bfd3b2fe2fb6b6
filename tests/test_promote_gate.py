"""Multi-metric promotion gate (VERDICT r4 weak #2).

The r5 MCD-only gate rejected the burst that won the round's priority
metric; these cases pin the replacement rule on the round's own history
plus the symmetric failure it must also block.
"""

from beatrice_vst_tpu.training.quality import should_promote


def summary(mcd, f0, worse=4):
    return {"converted": {"mcd_db": mcd, "f0_rmse_cents": f0},
            "pairs_worse_than_do_nothing_mcd": worse}


def test_accepts_the_r5_f0_trade():
    # the actual r5 burst: +0.11 dB MCD (within spread), F0 507 -> 424,
    # worse-pairs 5 -> 4 -- the MCD-only gate rejected this
    ok, reason = should_promote(summary(19.667, 506.78, worse=5),
                                summary(19.776, 424.46, worse=4))
    assert ok, reason


def test_rejects_f0_regression_buying_small_mcd():
    # the symmetric disease the old gate would have accepted
    ok, reason = should_promote(summary(19.7, 424.0),
                                summary(19.6, 800.0))
    assert not ok, reason


def test_accepts_clear_win_both():
    ok, _ = should_promote(summary(21.8, 542.0), summary(20.9, 469.0))
    assert ok


def test_rejects_worse_pairs_increase():
    ok, reason = should_promote(summary(19.7, 424.0, worse=4),
                                summary(19.6, 410.0, worse=6))
    assert not ok and "pairs" in reason


def test_rejects_eval_failure():
    ok, _ = should_promote(summary(19.7, 424.0), summary(None, None))
    assert not ok


def test_rejects_plain_loss():
    ok, _ = should_promote(summary(19.7, 424.0), summary(20.8, 500.0))
    assert not ok


def test_mcd_win_with_modest_f0_drift_ok():
    # small F0 give-back (within 10%) must not block a real MCD win
    ok, _ = should_promote(summary(21.0, 400.0), summary(19.5, 430.0))
    assert ok
