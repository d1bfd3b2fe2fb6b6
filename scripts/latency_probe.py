"""Per-stream I/O-inclusive latency measurement (VERDICT r3 weak #5).

BASELINE.md's per-stream contract is "latency under the plugin's 10 ms
frame budget".  bench.py measures the device tick; this probe measures
what a CLIENT sees through the full serving stack at real 100 Hz
cadence: client push -> HostResampler -> SpscRing -> scheduler tick ->
engine -> SpscRing -> client pull, per 10 ms frame.

Protocol: M in-process sessions; each client thread pushes one
480-sample 48 kHz frame every 10 ms (paced against a monotonic
deadline, like an audio callback) and a paired puller drains the
session's output, timestamping the completion of every 480-sample
output frame.  Frame latency = completion time - push time of the
same-index input frame (the chain is same-rate 1:1 and causal).
Reports per-frame latency p50/p90/p99/max across all sessions after
warm-up, scheduler cadence/underruns, and a do-nothing control.

This runs on the CPU backend by design: the dev relay's ~100-200 ms
D2H makes TPU numbers measure the relay (docs/ROOFLINE.md "measuring
the deployer's number").  On a PCIe-attached TPU host the same probe
applies unchanged with a real capacity (the transfer term is ~0.1 ms);
the CPU-backend figure here validates the SERVING STACK's latency
behavior (queueing + scheduler + rings), which is hardware-independent.

Usage: python scripts/latency_probe.py [--sessions 4] [--seconds 20]
       [--capacity 8] [--model models_demo/klatt8] [--report docs/LATENCY_REPORT.json]
"""

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import numpy as np

SR = 48000
FRAME = 480  # 10 ms @ 48 kHz


def run_session(session, seconds, results, stop):
    """Paced pusher + draining puller for one session."""
    n_frames = int(seconds * 100)
    rng = np.random.default_rng(id(session) % 2**32)
    t = np.arange(n_frames * FRAME) / SR
    tone = (0.25 * np.sin(2 * np.pi * 165.0 * t)
            + 0.01 * rng.standard_normal(len(t))).astype(np.float32)
    push_ts = np.zeros(n_frames)
    done_ts = np.full(n_frames, np.nan)

    got = [0]

    def puller():
        while not stop.is_set():
            out = session.pull(FRAME)
            now = time.monotonic()
            if len(out):
                start, end = got[0], got[0] + len(out)
                got[0] = end
                # frames fully completed by this pull
                for fi in range(start // FRAME, end // FRAME):
                    if fi < n_frames:
                        done_ts[fi] = now
            else:
                time.sleep(0.0005)

    th = threading.Thread(target=puller, daemon=True)
    th.start()
    t0 = time.monotonic()
    for i in range(n_frames):
        deadline = t0 + i * 0.010
        now = time.monotonic()
        if deadline > now:
            time.sleep(deadline - now)
        push_ts[i] = time.monotonic()
        session.push(tone[i * FRAME:(i + 1) * FRAME])
    # allow the tail to drain
    tail_deadline = time.monotonic() + 2.0
    while got[0] < (n_frames - 2) * FRAME and time.monotonic() < tail_deadline:
        time.sleep(0.005)
    stop.set()
    th.join(timeout=1.0)
    lat = (done_ts - push_ts) * 1e3  # ms
    results.append({"latency_ms": lat, "frames_returned": got[0] // FRAME,
                    "n_frames": n_frames})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sessions", type=int, default=4)
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--capacity", type=int, default=8)
    ap.add_argument("--model", default=os.path.join(REPO, "models_demo",
                                                    "klatt8"))
    ap.add_argument("--report", default=os.path.join(REPO, "docs",
                                                     "LATENCY_REPORT.json"))
    ap.add_argument("--warmup-s", type=float, default=3.0)
    args = ap.parse_args()

    import jax

    if "TPU" in str(jax.devices()[0]).upper():
        # in-process override (JAX_PLATFORMS env cannot beat the
        # preloaded axon plugin -- CLAUDE.md relay lore)
        jax.config.update("jax_platforms", "cpu")

    from beatrice_vst_tpu.errors import ErrorCode
    from beatrice_vst_tpu.runtime import ModelHost

    host = ModelHost(capacity=args.capacity, realtime=True, jit=True)
    assert host.load_model(args.model) == ErrorCode.SUCCESS
    # wait for the scheduler to warm up (first jit compile happens on the
    # first tick; measuring it would be compile time, not latency)
    deadline = time.time() + 300
    while host.metrics().get("ticks", 0) < int(args.warmup_s * 100):
        if time.time() > deadline:
            raise RuntimeError("engine never warmed up")
        time.sleep(0.1)

    from beatrice_vst_tpu.params import ParameterID

    sessions = [host.open_session(float(SR)) for _ in range(args.sessions)]
    for i, s in enumerate(sessions):
        s.set_parameter(ParameterID.VOICE, i % 4)

    results = []
    stop = threading.Event()
    threads = [threading.Thread(
        target=run_session, args=(s, args.seconds, results, stop))
        for s in sessions]
    t0 = time.time()
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    wall = time.time() - t0
    m = host.metrics()
    for s in sessions:
        s.close()
    host.stop()

    warm = int(args.warmup_s * 100)
    lat = np.concatenate([r["latency_ms"][warm:] for r in results])
    lat = lat[np.isfinite(lat)]
    delivered = sum(r["frames_returned"] for r in results)
    pushed = sum(r["n_frames"] for r in results)
    q = lambda p: round(float(np.percentile(lat, p)), 2) if len(lat) else None
    report = {
        "backend": str(jax.devices()[0]),
        "model": os.path.relpath(args.model, REPO),
        "sessions": args.sessions,
        "capacity": args.capacity,
        "seconds": args.seconds,
        "wall_s": round(wall, 1),
        "frames_measured": int(len(lat)),
        "delivery_ratio": round(delivered / max(pushed, 1), 4),
        "frame_latency_ms": {"p50": q(50), "p90": q(90), "p99": q(99),
                             "max": round(float(lat.max()), 2) if len(lat)
                             else None},
        "scheduler": {k: m.get(k) for k in
                      ("tick_p50_ms", "tick_p99_ms", "underruns",
                       "streams_active", "audio_seconds_per_s")},
        "note": (
            "CPU backend at real 100 Hz cadence: client-push -> "
            "converted-pull per 10 ms frame through the full serving "
            "stack (resampler edges, SPSC rings, scheduler).  The "
            "structural floor is one scheduler period of queueing "
            "(0-10 ms, mean 5) + device tick + pull poll.  TPU-attached "
            "expectation: identical stack latency with the CPU tick "
            "replaced by the measured device tick (9.4 ms at 19968 "
            "streams, BENCH artifacts) + ~0.1 ms PCIe, i.e. p50 ~15 ms, "
            "p99 < 25 ms at full capacity; the dev relay's ~100-200 ms "
            "D2H makes the TPU variant of this probe measure the relay "
            "(docs/ROOFLINE.md)."),
    }
    with open(args.report, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    ok = (report["delivery_ratio"] > 0.98 and q(50) is not None)
    print("LATENCY PROBE:", "OK" if ok else "DEGRADED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
