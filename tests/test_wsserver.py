"""WebSocket serving front end: handshake, framing, and end-to-end audio."""

import threading

import numpy as np
import pytest

from beatrice_vst_tpu.errors import ErrorCode
from beatrice_vst_tpu.models.io import init_random_model_dir
from beatrice_vst_tpu.runtime import ModelHost
from beatrice_vst_tpu.runtime.wsserver import (
    OP_BINARY,
    OP_TEXT,
    WSClient,
    WSServer,
    accept_key,
    encode_frame,
    read_message,
)


def test_accept_key_rfc_example():
    # the worked example from RFC 6455 section 1.3
    assert (
        accept_key("dGhlIHNhbXBsZSBub25jZQ==")
        == "s3pPLMBiTxaQ9kYGzzhZRbK+xOo="
    )


def test_frame_roundtrip_masked_and_unmasked():
    class FakeSock:
        def __init__(self, data):
            self.data = data
            self.sent = b""

        def recv(self, n):
            out, self.data = self.data[:n], self.data[n:]
            return out

        def sendall(self, b):
            self.sent += b

    for mask in (False, True):
        for payload in (b"", b"x", b"a" * 200, b"b" * 70000):
            s = FakeSock(encode_frame(OP_BINARY, payload, mask=mask))
            opcode, got = read_message(s)
            assert opcode == OP_BINARY
            assert got == payload


def test_fragmented_message_reassembly():
    # hand-build FIN=0 TEXT + FIN=1 CONT
    f1 = encode_frame(OP_TEXT, b"hello ")
    f1 = bytes([f1[0] & 0x7F]) + f1[1:]  # clear FIN
    f2 = encode_frame(0x0, b"world")

    class FakeSock:
        def __init__(self, data):
            self.data = data

        def recv(self, n):
            out, self.data = self.data[:n], self.data[n:]
            return out

        def sendall(self, b):
            pass

    opcode, got = read_message(FakeSock(f1 + f2))
    assert opcode == OP_TEXT
    assert got == b"hello world"


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ws_model"))
    init_random_model_dir(d, version="2.0.0-alpha.2", n_voices=2, seed=0)
    host = ModelHost(capacity=4, realtime=True, jit=False)
    assert host.load_model(d) == ErrorCode.SUCCESS
    srv = WSServer(("127.0.0.1", 0), host)
    # wait for the engine's first (eager-mode) tick: the op-by-op warmup
    # can take >60s on a cold process, which would eat the clients' pull
    # timeout and make the test flaky
    import time

    deadline = time.time() + 240
    while host.metrics().get("ticks", 0) < 1:
        if time.time() > deadline:
            raise RuntimeError("engine never ticked")
        time.sleep(0.2)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address
    srv.shutdown()
    host.stop()


def test_ws_client_roundtrip(server):
    c = WSClient(server, sample_rate=48000.0)
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
    assert "streams_active" in m or isinstance(m, dict)
    c.close()


def test_ws_client_bad_param(server):
    c = WSClient(server, sample_rate=48000.0)
    r = c.set_parameter("no_such_param", 1)
    assert not r["ok"]
    c.close()


def test_ws_plain_http_serves_demo_page(server):
    # a plain (non-upgrade) GET / now serves the browser demo client
    # (docs/demo/index.html); unknown paths 404; non-GET methods 400
    import socket

    def http(req):
        s = socket.create_connection(server, timeout=5.0)
        s.sendall(req)
        resp = b""
        while True:
            try:
                chunk = s.recv(4096)
            except OSError:
                break
            if not chunk:
                break
            resp += chunk
        s.close()
        return resp

    resp = http(b"GET / HTTP/1.1\r\nHost: x\r\n\r\n")
    assert resp.startswith(b"HTTP/1.1 200") and b"<html" in resp
    assert http(b"GET /nope HTTP/1.1\r\nHost: x\r\n\r\n").startswith(
        b"HTTP/1.1 404")
    assert http(b"POST / HTTP/1.1\r\nHost: x\r\n\r\n").startswith(
        b"HTTP/1.1 400")
