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


def test_grpc_client_legacy_dialect(server):
    """Back-compat: the original [tag:u8][payload] framing still works."""
    c = GRPCClient(server, sample_rate=48000.0, dialect="legacy")
    r = c.set_parameter("voice", 1)
    assert r["ok"], r
    t = np.arange(48000 // 4) / 48000
    c.push((0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32))
    out = c.pull(2400, timeout=60.0)
    assert len(out) >= 2400
    c.close()


def test_grpc_client_bad_param(server):
    c = GRPCClient(server, sample_rate=48000.0)
    r = c.set_parameter("no_such_param", 1)
    assert not r["ok"]
    c.close()


def test_grpc_unary_metrics(server):
    import grpc

    from beatrice_vst_tpu.runtime.grpcserver import _pb_fields

    channel = grpc.insecure_channel(server)
    call = channel.unary_unary(
        f"/{SERVICE}/Metrics",
        request_serializer=lambda b: b,
        response_deserializer=lambda b: b,
    )
    # Reply is MetricsReply{json: string} per proto/vc.proto.
    fields = dict(_pb_fields(call(b"")))
    m = json.loads(fields[1].decode("utf-8"))
    assert isinstance(m, dict)
    channel.close()


def test_pb_codec_roundtrip():
    """The hand-rolled codec survives multi-byte varint lengths and
    round-trips both oneof arms."""
    from beatrice_vst_tpu.runtime.grpcserver import (
        _audio_msg, _decode_frame, _json_msg, _pb_fields)

    big = np.arange(70000, dtype=np.float32)  # payload > 2**18 bytes
    kind, payload, dialect = _decode_frame(_audio_msg(big))
    assert (kind, dialect) == ("audio", "proto")
    assert np.array_equal(np.frombuffer(payload, np.float32), big)

    obj = {"op": "hello", "sample_rate": 48000.0}
    kind, payload, dialect = _decode_frame(_json_msg(obj))
    assert (kind, dialect) == ("json", "proto")
    assert json.loads(payload.decode("utf-8")) == obj

    kind, payload, dialect = _decode_frame(_json_msg(obj, "legacy"))
    assert (kind, dialect) == ("json", "legacy")

    # a message with several fields decodes field-by-field
    msg = _json_msg(obj) + _audio_msg(np.zeros(3, np.float32))
    assert [f for f, _ in _pb_fields(msg)] == [1, 2]
