"""CI-scale wrapper of the long-horizon streaming soak.

The committed artifact (docs/LONG_STREAM_REPORT.json) is the full
10-minute run; this keeps the machinery -- streaming vs chunked with
carried state, the f32-phase-matched float64 oracle leg, the gates --
under CI at a 6-second horizon (~35 s wall on the CPU backend).
"""

import json
import runpy
import sys

import pytest


@pytest.mark.slow
@pytest.mark.parametrize("version", ["2.0.0-rc.0", "2.0.0-beta.1"],
                         ids=["20rc0", "20b1"])
def test_long_stream_soak_smoke(tmp_path, monkeypatch, version):
    out = tmp_path / "docs"
    out.mkdir()
    # the script writes docs/LONG_STREAM_REPORT.json relative to its repo
    # root; patch its REPO by running with argv-only scale knobs and
    # letting it overwrite the committed report is NOT ok in CI -- so
    # chdir into a scratch repo layout and run by path
    import os
    import shutil

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(repo, "scripts", "long_stream_soak.py")
    scratch = tmp_path / "scripts"
    scratch.mkdir()
    shutil.copy(script, scratch / "long_stream_soak.py")
    monkeypatch.setattr(sys, "argv", [
        str(scratch / "long_stream_soak.py"), "--minutes", "0.1",
        "--oracle-minutes", "0.1", "--chunk-frames", "100",
        "--version", version])
    with pytest.raises(SystemExit) as exc:
        runpy.run_path(str(scratch / "long_stream_soak.py"),
                       run_name="__main__")
    assert exc.value.code == 0, "soak gates failed at smoke scale"
    # sub-10-minute runs write the _smoke-suffixed name so a CI run can
    # never clobber the committed full-horizon artifact (VERDICT r4 #1b)
    report = json.load(
        open(tmp_path / "docs" / "LONG_STREAM_REPORT_smoke.json"))
    assert all(report["gates"].values()), report["gates"]
