"""TCP serving front end: client session end-to-end over a real socket."""

import threading

import numpy as np
import pytest

from beatrice_vst_tpu.errors import ErrorCode
from beatrice_vst_tpu.models.io import init_random_model_dir
from beatrice_vst_tpu.runtime import ModelHost
from beatrice_vst_tpu.runtime.netserver import VCClient, VCServer


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("served_model"))
    init_random_model_dir(d, version="2.0.0-alpha.2", n_voices=2, seed=0)
    host = ModelHost(capacity=4, realtime=True, jit=False)
    assert host.load_model(d) == ErrorCode.SUCCESS
    srv = VCServer(("127.0.0.1", 0), host)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address
    srv.shutdown()
    host.stop()


def test_client_roundtrip(server):
    c = VCClient(server, sample_rate=48000.0)
    r = c.set_parameter("voice", 1)
    assert r["ok"], r
    r = c.set_parameter("pitch_shift", 4.0)
    assert r["ok"], r
    t = np.arange(48000 // 2) / 48000
    c.push((0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32))
    out = c.pull(4800, timeout=60.0)
    assert len(out) >= 4800
    assert np.isfinite(out).all()
    c.close()


def test_client_bad_param(server):
    c = VCClient(server, sample_rate=48000.0)
    r = c.set_parameter("no_such_param", 1)
    assert not r["ok"]
    c.close()
