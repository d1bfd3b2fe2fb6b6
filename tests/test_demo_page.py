"""Browser demo client: drive the page's protocol path end-to-end.

There is no JS engine in this image, so the page's network behavior is
mirrored here 1:1 against a live WSServer: the exact op sequence
docs/demo/index.html emits (hello at the context rate, the full
pushAllParams() set including the morph-pad cursor, ~20 ms binary audio
frames, periodic metrics polls, bye) plus the page's HTTP bootstrap
(GET / for the page itself, GET /info for the voice selector).  The
reference analogue is the editor GUI driving the same parameters
(/root/reference/src/vst/editor.cc:255-683).
"""

import json
import re
import socket
import threading

import numpy as np
import pytest

from beatrice_vst_tpu.errors import ErrorCode
from beatrice_vst_tpu.models.io import init_random_model_dir
from beatrice_vst_tpu.runtime import ModelHost
from beatrice_vst_tpu.runtime.wsserver import WSClient, WSServer


# smallest valid PNG (1x1 transparent pixel)
PNG_BYTES = bytes.fromhex(
    "89504e470d0a1a0a0000000d494844520000000100000001080600000"
    "01f15c4890000000a49444154789c63000100000500010d0a2db40000"
    "000049454e44ae426082")


@pytest.fixture(scope="module")
def host_and_addr(tmp_path_factory):
    import os

    d = str(tmp_path_factory.mktemp("demo_model"))
    init_random_model_dir(d, version="2.0.0-rc.0", n_voices=4, seed=0,
                          name="demo-model")
    # give voice 0 a portrait (model-card contract: path is relative to
    # the model dir; served at GET /portrait/<id>)
    os.makedirs(os.path.join(d, "portraits"), exist_ok=True)
    with open(os.path.join(d, "portraits", "v0.png"), "wb") as f:
        f.write(PNG_BYTES)
    cfg_path = os.path.join(d, "config.toml")
    text = open(cfg_path).read()
    text = text.replace('[voice.0.portrait]\npath = ""',
                        '[voice.0.portrait]\npath = "portraits/v0.png"', 1)
    with open(cfg_path, "w") as f:
        f.write(text)
    host = ModelHost(capacity=4, realtime=True, jit=False)
    assert host.load_model(d) == ErrorCode.SUCCESS
    srv = WSServer(("127.0.0.1", 0), host)
    import time

    deadline = time.time() + 240
    while host.metrics().get("ticks", 0) < 1:
        if time.time() > deadline:
            raise RuntimeError("engine never ticked")
        time.sleep(0.2)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield host, srv.server_address
    srv.shutdown()
    host.stop()


def _http_get(addr, path):
    s = socket.create_connection(addr, timeout=10.0)
    s.sendall(f"GET {path} HTTP/1.1\r\nHost: x\r\n\r\n".encode())
    resp = b""
    while True:
        try:
            chunk = s.recv(65536)
        except OSError:
            break
        if not chunk:
            break
        resp += chunk
    s.close()
    head, _, body = resp.partition(b"\r\n\r\n")
    return head, body


def test_page_bootstrap(host_and_addr):
    """GET / returns the page; it references every op and param it sends."""
    _, addr = host_and_addr
    head, body = _http_get(addr, "/")
    assert head.startswith(b"HTTP/1.1 200")
    page = body.decode("utf-8")
    # the page's protocol surface must match what the server implements
    for op in ('"op": "hello"', '"op": "set"', '"op": "metrics"',
               '"op": "bye"'):
        assert op.replace(" ", "") in page.replace(" ", ""), op
    for param in ("pitch_shift", "formant_shift", "intonation_intensity",
                  "pitch_correction", "input_gain", "output_gain",
                  "morph_cursor_x", "morph_cursor_y", "voice"):
        assert param in page, param
    # every slider id the JS drives exists as a DOM element
    for m in re.finditer(r'getElementById\("([a-z_]+)"\)', page):
        assert f'id="{m.group(1)}"' in page, m.group(1)


def test_info_endpoint(host_and_addr):
    """GET /info: the page's voice-selector bootstrap."""
    _, addr = host_and_addr
    head, body = _http_get(addr, "/info")
    assert head.startswith(b"HTTP/1.1 200")
    info = json.loads(body)
    assert info["loaded"] and info["name"] == "demo-model"
    assert [v["id"] for v in info["voices"]] == [0, 1, 2, 3]
    assert all(v["name"] for v in info["voices"])


def test_page_protocol_sequence(host_and_addr):
    """The page's exact runtime sequence: hello -> pushAllParams() ->
    tone streaming in ~20 ms frames -> metrics poll -> morph-pad drag ->
    converted audio comes back finite and non-silent."""
    _, addr = host_and_addr
    info = json.loads(_http_get(addr, "/info")[1])
    n_voices = len(info["voices"])

    c = WSClient(addr, sample_rate=48000.0)  # hello happens in __init__
    # pushAllParams(): voice + every slider at its page default
    assert c.set_parameter("voice", 1)["ok"]
    for name, default in [("pitch_shift", 0.0), ("formant_shift", 0.0),
                          ("intonation_intensity", 1.0),
                          ("pitch_correction", 0.0),
                          ("input_gain", 0.0), ("output_gain", 0.0)]:
        assert c.set_parameter(name, default)["ok"], name

    # the tone generator: 150 Hz + vibrato + noise floor, 20 ms frames
    sr = 48000
    n = sr // 2
    t = np.arange(n)
    f0 = 150 + 30 * np.sin(2 * np.pi * t / (sr * 2.5))
    phase = np.cumsum(2 * np.pi * f0 / sr)
    tone = (0.25 * np.sin(phase) + 0.08 * np.sin(2 * phase)).astype(np.float32)
    frame = int(sr * 0.02)
    for i in range(0, n - frame, frame):
        c.push(tone[i: i + frame])
    out = c.pull(4800, timeout=120.0)
    assert len(out) >= 4800
    assert np.isfinite(out).all()
    assert float(np.abs(out).max()) > 0.0

    # metrics poll: the keys renderMetrics() reads must exist
    m = c.metrics()
    for key in ("streams_active", "tick_p50_ms", "tick_p99_ms",
                "audio_seconds_per_s", "underruns",
                "session_dropped_in", "session_dropped_out"):
        assert key in m, key

    # morph-pad drag: switch to the morph voice, move the cursor
    assert c.set_parameter("voice", n_voices)["ok"]
    assert c.set_parameter("morph_cursor_x", 0.25)["ok"]
    assert c.set_parameter("morph_cursor_y", 0.75)["ok"]
    c.push(tone[:frame])
    out2 = c.pull(480, timeout=120.0)
    assert np.isfinite(out2).all()
    c.close()


def test_page_file_conversion_sequence(host_and_addr):
    """convertFile()'s path: stream a whole clip in paced 20 ms frames,
    drain until the server goes quiet, and get (almost) the full length
    back -- the offline-file mode of the demo page."""
    import time

    _, addr = host_and_addr
    c = WSClient(addr, sample_rate=48000.0)
    assert c.set_parameter("voice", 2)["ok"]
    sr = 48000
    n = sr  # 1 s clip
    t = np.arange(n) / sr
    clip = (0.3 * np.sin(2 * np.pi * 180 * t)).astype(np.float32)
    frame = int(sr * 0.02)
    got = []
    for i in range(0, n, frame):
        c.push(clip[i: i + frame])
        out = c.pull(0, timeout=0.001)
        if len(out):
            got.append(out)
    # drain until quiet (the page waits for 1.5 s of silence; tests give
    # the eager CPU server more slack)
    quiet = 0
    deadline = time.time() + 240
    while quiet < 6 and time.time() < deadline:
        out = c.pull(480, timeout=0.5)
        if len(out):
            got.append(out)
            quiet = 0
        else:
            quiet += 1
    total = sum(len(g) for g in got)
    assert total >= n - 4800, f"got {total} of {n} samples back"
    assert all(np.isfinite(g).all() for g in got)
    c.close()


def test_portrait_roundtrip(host_and_addr):
    """Model-card portraits: /info flags them, /portrait/<id> serves the
    exact bytes (editor.cc:1005-1188 analogue)."""
    host, addr = host_and_addr
    info = json.loads(_http_get(addr, "/info")[1])
    assert info["voices"][0]["has_portrait"] is True
    assert info["voices"][1]["has_portrait"] is False
    head, body = _http_get(addr, "/portrait/0")
    assert b"200 OK" in head and b"image/png" in head
    assert body == PNG_BYTES
    assert _http_get(addr, "/portrait/1")[0].startswith(b"HTTP/1.1 404")
    assert _http_get(addr, "/portrait/999")[0].startswith(b"HTTP/1.1 404")
    assert _http_get(addr, "/portrait/zzz")[0].startswith(b"HTTP/1.1 404")
    # and the page actually uses the endpoint
    page = _http_get(addr, "/")[1].decode()
    assert "/portrait/" in page and "has_portrait" in page


def test_portrait_traversal_rejected(tmp_path):
    """A model card is untrusted input: a portrait path that escapes the
    model dir must resolve to nothing."""
    import os

    d = str(tmp_path / "m")
    init_random_model_dir(d, version="2.0.0-rc.0", n_voices=2, seed=0,
                          name="traversal")
    secret = tmp_path / "secret.png"
    secret.write_bytes(PNG_BYTES)
    cfg_path = os.path.join(d, "config.toml")
    text = open(cfg_path).read().replace(
        '[voice.0.portrait]\npath = ""',
        '[voice.0.portrait]\npath = "../secret.png"', 1)
    open(cfg_path, "w").write(text)
    host = ModelHost(capacity=2, realtime=False, jit=False)
    assert host.load_model(d) == ErrorCode.SUCCESS
    try:
        assert host.portrait_bytes(0) is None
        assert host.describe()["voices"][0]["has_portrait"] is False
    finally:
        host.stop()
