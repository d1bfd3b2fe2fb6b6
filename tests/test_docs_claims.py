"""Doc-claims consistency guards (VERDICT r3 "what's weak" #1).

The r3 end-of-round snapshot silently destroyed the executed OOD rows in
docs/QUALITY_REPORT.json (an eval rewrote the file without merging)
while README.md kept advertising them.  These tests pin the contract:
report sections that the README cites must exist at HEAD, and every
docs/*.json artifact the README references must be committed.
"""

import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_quality_report_sections_present():
    report = json.load(open(os.path.join(REPO, "docs",
                                         "QUALITY_REPORT.json")))
    assert "summary" in report and "pairs" in report
    # README cites an out-of-distribution section; quality_eval.py must
    # merge-preserve it (it is written by scripts/ood_eval.py)
    assert "ood" in report, (
        "docs/QUALITY_REPORT.json lost its 'ood' section -- "
        "quality_eval.py must merge into the existing report")
    ood = report["ood"]
    assert any(k.startswith("noise_snr") for k in ood), ood.keys()
    assert any(k.startswith("unseen_f0") for k in ood), ood.keys()


def test_readme_cited_artifacts_exist():
    text = open(os.path.join(REPO, "README.md")).read()
    for rel in set(re.findall(r"docs/[A-Za-z0-9_./-]+\.(?:json|md)", text)):
        assert os.path.exists(os.path.join(REPO, rel)), (
            f"README.md cites {rel} which does not exist")


def test_long_stream_report_matches_readme_claim():
    """VERDICT r4 weak #1b: README claimed a 10-minute soak while the
    committed artifact had been clobbered by a 300-frame smoke.  The
    unsuffixed report name now means the full-horizon run, and its
    content must back the README's claim."""
    text = open(os.path.join(REPO, "README.md")).read()
    if "10-minute" not in text:
        return
    rep = json.load(open(os.path.join(REPO, "docs",
                                      "LONG_STREAM_REPORT.json")))
    assert rep["minutes"] >= 10.0, (
        "docs/LONG_STREAM_REPORT.json holds a sub-10-minute run; smoke "
        "runs must write LONG_STREAM_REPORT_smoke.json")
    assert all(rep["gates"].values()), rep["gates"]


def test_train_reports_have_evidence_for_executed_steps():
    """VERDICT r4 weak #1a: a resume-and-skip stub (steps N, empty loss
    curve, seconds of wall) overwrote the real burst report.  Any
    committed train report claiming steps must carry a loss curve."""
    docs = os.path.join(REPO, "docs")
    for name in sorted(os.listdir(docs)):
        if not (name.startswith("TRAIN_") and name.endswith(".json")):
            continue
        rep = json.load(open(os.path.join(docs, name)))
        for phase, curve_key in (("distill", "loss_curve"),
                                 ("gan", "g_loss_curve")):
            ph = rep.get(phase)
            if not isinstance(ph, dict):
                continue
            executed = ph.get("steps_executed", ph.get("steps", 0))
            if executed and executed > 0:
                assert ph.get(curve_key), (
                    f"docs/{name} {phase}: claims {executed} steps but "
                    f"has an empty {curve_key} -- a resume-and-skip stub "
                    "overwrote the real report")


def test_readme_bench_table_matches_committed_sweep():
    """VERDICT r4 weak #5: README cited the r03 sweep while BENCH_r04
    sat untracked.  The README's performance table must quote the newest
    committed BENCH_rNN.json sweep."""
    import glob

    benches = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    assert benches
    sweep = json.load(open(benches[-1]))["parsed"]["sweep"]
    text = open(os.path.join(REPO, "README.md")).read()
    newest = os.path.basename(benches[-1])
    assert newest.replace(".json", "") in text or newest in text, (
        f"README.md does not cite the newest committed sweep {newest}")
    for row in sweep:
        ms = f"{row['steady_tick_ms']:.2f} ms"
        assert ms in text, (
            f"README performance table missing '{ms}' for capacity "
            f"{row['capacity']} from {newest}")


def test_quality_eval_merges_foreign_sections(tmp_path, monkeypatch):
    """The merge behavior itself, isolated: a foreign key in the existing
    report must survive a rewrite by the quality_eval writer logic."""
    # exercise the exact code shape quality_eval.py uses
    out = tmp_path / "QUALITY_REPORT.json"
    json.dump({"ood": {"probe": 1}, "summary": {"old": True}}, open(out, "w"))
    report = {"summary": {"new": True}}
    existing = json.load(open(out))
    for k, v in existing.items():
        if k not in report:
            report[k] = v
    json.dump(report, open(out, "w"))
    merged = json.load(open(out))
    assert merged["ood"] == {"probe": 1}
    assert merged["summary"] == {"new": True}
