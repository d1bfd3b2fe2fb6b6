"""gRPC serving front end.

Same session semantics as the TCP/WebSocket front ends (one RPC == one
ClientSession == one plugin instance in reference terms,
src/vst/processor.cc:103), exposed as a gRPC service:

    /beatrice.vc.VC/Convert   bidi stream; each message is raw bytes
                              [tag: u8][payload]:
                                tag 0  JSON control (hello/set/metrics/bye)
                                tag 1  float32 PCM mono at the session rate
    /beatrice.vc.VC/Metrics   unary; empty request -> JSON bytes

grpcio is present in this image but the protoc codegen plugin
(grpc_tools) is not, so the service is registered through generic
method handlers over raw bytes — any gRPC client in any language can
call these paths with identity (de)serializers; the message layout is
the TCP protocol's, minus the length prefix gRPC already provides.
"""

from __future__ import annotations

import json
import queue
import threading

import numpy as np

from ..errors import ErrorCode
from .netserver import _resolve_param

SERVICE = "beatrice.vc.VC"
TAG_JSON = 0
TAG_AUDIO = 1


def _identity(b: bytes) -> bytes:
    return b


def _json_msg(obj) -> bytes:
    return bytes([TAG_JSON]) + json.dumps(obj, default=float).encode("utf-8")


def _audio_msg(audio: np.ndarray) -> bytes:
    return bytes([TAG_AUDIO]) + np.ascontiguousarray(audio, np.float32).tobytes()


class _ConvertHandler:
    """Bidi-stream handler: a reader thread drains client messages, a pump
    thread drains converted audio; the response generator multiplexes both
    through one queue (gRPC responses must come from a single generator)."""

    def __init__(self, model_host):
        self.host = model_host

    def __call__(self, request_iterator, context):
        outq: "queue.Queue[bytes | None]" = queue.Queue(maxsize=256)
        stop = threading.Event()
        session_box = {}

        def reader():
            try:
                for msg in request_iterator:
                    if not msg:
                        continue
                    tag, payload = msg[0], msg[1:]
                    if tag == TAG_JSON:
                        m = json.loads(payload.decode("utf-8"))
                        op = m.get("op")
                        if op == "hello":
                            s = self.host.open_session(
                                float(m.get("sample_rate", 48000))
                            )
                            session_box["s"] = s
                            outq.put(_json_msg(
                                {"ok": True, "session": s.session_id}))
                        elif op == "set":
                            s = session_box.get("s")
                            pid = _resolve_param(m.get("param"))
                            if pid is None or s is None:
                                outq.put(_json_msg(
                                    {"ok": False, "error": "bad param/session"}))
                            else:
                                err = s.set_parameter(pid, m.get("value"))
                                outq.put(_json_msg(
                                    {"ok": err == ErrorCode.SUCCESS,
                                     "code": int(err)}))
                        elif op == "metrics":
                            outq.put(_json_msg(self.host.metrics()))
                        elif op == "bye":
                            break
                        else:
                            outq.put(_json_msg(
                                {"ok": False, "error": f"unknown op {op!r}"}))
                    elif tag == TAG_AUDIO and "s" in session_box:
                        session_box["s"].push(np.frombuffer(payload, np.float32))
            except Exception:
                pass
            finally:
                stop.set()
                outq.put(None)

        def pump():
            import time

            while not stop.is_set():
                s = session_box.get("s")
                if s is None:
                    time.sleep(0.005)
                    continue
                out = s.pull(4096)
                if len(out):
                    try:
                        outq.put(_audio_msg(out), timeout=1.0)
                    except queue.Full:
                        pass  # slow client: drop rather than stall the engine
                else:
                    time.sleep(0.005)

        rt = threading.Thread(target=reader, daemon=True)
        pt = threading.Thread(target=pump, daemon=True)
        rt.start()
        pt.start()
        try:
            while True:
                msg = outq.get()
                if msg is None:
                    break
                yield msg
        finally:
            stop.set()
            s = session_box.get("s")
            if s is not None:
                s.close()


def make_server(model_host, port: int = 0, host_addr: str = "127.0.0.1",
                max_workers: int = 16):
    """-> (grpc.Server, bound_port)."""
    import grpc

    def metrics_handler(request, context):
        return json.dumps(model_host.metrics(), default=float).encode("utf-8")

    handlers = {
        "Convert": grpc.stream_stream_rpc_method_handler(
            _ConvertHandler(model_host),
            request_deserializer=_identity,
            response_serializer=_identity,
        ),
        "Metrics": grpc.unary_unary_rpc_method_handler(
            metrics_handler,
            request_deserializer=_identity,
            response_serializer=_identity,
        ),
    }
    server = grpc.server(
        __import__("concurrent.futures", fromlist=["ThreadPoolExecutor"])
        .ThreadPoolExecutor(max_workers=max_workers)
    )
    server.add_generic_rpc_handlers(
        (grpc.method_handlers_generic_handler(SERVICE, handlers),)
    )
    bound = server.add_insecure_port(f"{host_addr}:{port}")
    return server, bound


def serve_grpc(model_path: str, port: int = 7779, capacity: int = 64,
               compute_dtype: str | None = None, realtime: bool = True,
               host_addr: str = "127.0.0.1"):
    """Blocking entry point used by `cli serve --grpc`."""
    from .service import ModelHost

    mh = ModelHost(capacity=capacity, compute_dtype=compute_dtype,
                   realtime=realtime)
    err = mh.load_model(model_path)
    if err != ErrorCode.SUCCESS:
        raise SystemExit(f"model load failed: {err!r}")
    server, bound = make_server(mh, port, host_addr)
    server.start()
    print(f"grpc-serving {model_path} on {host_addr}:{bound} (capacity {capacity})")
    try:
        server.wait_for_termination()
    finally:
        mh.stop()


class GRPCClient:
    """Minimal reference client (also used by tests)."""

    def __init__(self, target: str, sample_rate: float = 48000.0):
        import grpc

        self.channel = grpc.insecure_channel(target)
        self._call = self.channel.stream_stream(
            f"/{SERVICE}/Convert",
            request_serializer=_identity,
            response_deserializer=_identity,
        )
        self._sendq: "queue.Queue[bytes | None]" = queue.Queue()
        self._resp = self._call(iter(self._sendq.get, None))
        self._json_q: "queue.Queue[dict]" = queue.Queue()
        self._audio = bytearray()
        self._audio_cv = threading.Condition()
        self._closed = threading.Event()
        threading.Thread(target=self._reader, daemon=True).start()
        self._sendq.put(_json_msg({"op": "hello", "sample_rate": sample_rate}))
        msg = self._json_q.get(timeout=30.0)
        assert msg.get("ok"), msg

    def _reader(self):
        try:
            for msg in self._resp:
                if not msg:
                    continue
                tag, payload = msg[0], msg[1:]
                if tag == TAG_JSON:
                    self._json_q.put(json.loads(payload.decode("utf-8")))
                elif tag == TAG_AUDIO:
                    with self._audio_cv:
                        self._audio.extend(payload)
                        self._audio_cv.notify_all()
        except Exception:
            pass
        finally:
            self._closed.set()
            with self._audio_cv:
                self._audio_cv.notify_all()

    def set_parameter(self, name, value):
        self._sendq.put(_json_msg({"op": "set", "param": name, "value": value}))
        return self._json_q.get(timeout=30.0)

    def metrics(self):
        self._sendq.put(_json_msg({"op": "metrics"}))
        return self._json_q.get(timeout=30.0)

    def push(self, audio: np.ndarray):
        self._sendq.put(_audio_msg(audio))

    def pull(self, min_samples: int, timeout: float = 30.0):
        import time

        deadline = time.time() + timeout
        with self._audio_cv:
            while (len(self._audio) < min_samples * 4
                   and not self._closed.is_set()):
                remaining = deadline - time.time()
                if remaining <= 0:
                    break
                self._audio_cv.wait(timeout=min(remaining, 0.2))
            out = np.frombuffer(bytes(self._audio), np.float32)
            self._audio.clear()
        return out

    def close(self):
        try:
            self._sendq.put(_json_msg({"op": "bye"}))
            self._sendq.put(None)
        except Exception:
            pass
        self.channel.close()
