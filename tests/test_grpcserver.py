"""gRPC serving front end: generic-handler service end-to-end."""

import json

import numpy as np
import pytest

pytest.importorskip("grpc")

from beatrice_vst_tpu.errors import ErrorCode
from beatrice_vst_tpu.models.io import init_random_model_dir
from beatrice_vst_tpu.runtime import ModelHost
from beatrice_vst_tpu.runtime.grpcserver import SERVICE, GRPCClient, make_server


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("grpc_model"))
    init_random_model_dir(d, version="2.0.0-alpha.2", n_voices=2, seed=0)
    host = ModelHost(capacity=4, realtime=True, jit=False)
    assert host.load_model(d) == ErrorCode.SUCCESS
    srv, port = make_server(host, port=0)
    srv.start()
    # wait for the engine's first (eager-mode) tick: the op-by-op warmup
    # can take >60s on a cold process, which would eat the clients' pull
    # timeout and make the test flaky
    import time

    deadline = time.time() + 240
    while host.metrics().get("ticks", 0) < 1:
        if time.time() > deadline:
            raise RuntimeError("engine never ticked")
        time.sleep(0.2)
    yield f"127.0.0.1:{port}"
    srv.stop(grace=None)
    host.stop()


def test_grpc_client_roundtrip(server):
    c = GRPCClient(server, sample_rate=48000.0)
    r = c.set_parameter("voice", 1)
    assert r["ok"], r
    r = c.set_parameter("pitch_shift", 4.0)
    assert r["ok"], r
    t = np.arange(48000 // 2) / 48000
    c.push((0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32))
    out = c.pull(4800, timeout=60.0)
    assert len(out) >= 4800
    assert np.isfinite(out).all()
    m = c.metrics()
    assert isinstance(m, dict)
    c.close()


def test_grpc_client_bad_param(server):
    c = GRPCClient(server, sample_rate=48000.0)
    r = c.set_parameter("no_such_param", 1)
    assert not r["ok"]
    c.close()


def test_grpc_unary_metrics(server):
    import grpc

    channel = grpc.insecure_channel(server)
    call = channel.unary_unary(
        f"/{SERVICE}/Metrics",
        request_serializer=lambda b: b,
        response_deserializer=lambda b: b,
    )
    m = json.loads(call(b"").decode("utf-8"))
    assert isinstance(m, dict)
    channel.close()
