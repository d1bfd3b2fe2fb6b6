"""Executed serving soak: real TCP client PROCESSES against the live
server on TPU.

Stands up the full deployment stack -- ModelHost (engine + 10 ms
scheduler) + the TCP front end -- and drives it with N concurrent client
processes streaming tone audio in real time for DURATION seconds (separate
processes: N busy Python client threads in the server process would starve
the scheduler thread's GIL, which is a harness artifact of a 2-core dev
box, not a property of the server).  Writes per-client delivery and the
server's own metrics to docs/SERVE_SOAK_REPORT.json.

Usage: PYTHONPATH=.:/root/.axon_site python scripts/serve_soak.py \
          [n_clients] [duration_s]
"""

import json
import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PORT = 7799


def run_client(i: int, duration: float) -> None:
    """Client-process entry: stream tone in real time, report one JSON."""
    from beatrice_vst_tpu.runtime.netserver import VCClient

    rng = np.random.default_rng(i)
    c = VCClient(addr=("127.0.0.1", PORT), sample_rate=48000.0, timeout=120.0)
    c.set_parameter("voice", i % 4)
    c.set_parameter("pitch_shift", float(i - 4))
    f0 = 140.0 + 15.0 * i
    block = 480
    t0 = time.monotonic()
    next_t = t0
    sent = got = 0
    peak = 0.0
    finite = True
    while time.monotonic() - t0 < duration:
        ts = (sent + np.arange(block)) / 48000.0
        x = (0.25 * np.sin(2 * np.pi * f0 * ts)
             + 0.01 * rng.standard_normal(block)).astype(np.float32)
        c.push(x)
        sent += block
        out = c.pull(block, timeout=0.004)
        if len(out):
            got += len(out)
            finite = finite and bool(np.isfinite(out).all())
            peak = max(peak, float(np.abs(out).max()))
        next_t += block / 48000.0
        delay = next_t - time.monotonic()
        if delay > 0:
            time.sleep(delay)
    # final drain: the server may still hold in-flight audio (ring_in
    # backlog + the pipeline tick) -- keep pulling until it has gone
    # quiet for several tick periods, not merely until one empty pull
    drain_t0 = time.monotonic()
    quiet_since = None
    # SOAK_QUIET_S: how long the server may stay silent before the client
    # gives up draining.  The dev relay can stall a single dispatch for
    # tens of seconds (r3: one 27.8 s tick) while the backlog stays fully
    # buffered server-side; patience only affects drain_s (reported), not
    # the real-time gate.
    quiet_limit = float(os.environ.get("SOAK_QUIET_S", "5.0"))
    while time.monotonic() - drain_t0 < 120.0 and got < sent:
        out = c.pull(block, timeout=0.25)
        if len(out):
            got += len(out)
            finite = finite and bool(np.isfinite(out).all())
            peak = max(peak, float(np.abs(out).max()))
            quiet_since = None
        else:
            now = time.monotonic()
            if quiet_since is None:
                quiet_since = now
            elif now - quiet_since > quiet_limit:
                break
    c.close()
    print(json.dumps({
        "sent_s": round(sent / 48000.0, 2),
        "received_s": round(got / 48000.0, 2),
        "drain_s": round(time.monotonic() - drain_t0, 2),
        "finite": finite,
        "peak": round(peak, 4),
    }))


def main():
    n_clients = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    duration = float(sys.argv[2]) if len(sys.argv) > 2 else 30.0

    import tempfile

    import jax

    if os.environ.get("SOAK_BACKEND") == "cpu":
        # JAX_PLATFORMS in the env does not stick on this image (the
        # sitecustomize preloads the axon plugin); force it in-process
        jax.config.update("jax_platforms", "cpu")

    from beatrice_vst_tpu.errors import ErrorCode
    from beatrice_vst_tpu.models.io import init_random_model_dir
    from beatrice_vst_tpu.runtime.netserver import VCClient, VCServer
    from beatrice_vst_tpu.runtime.service import ModelHost

    on_tpu = jax.default_backend() != "cpu"
    model_dir = tempfile.mkdtemp(prefix="soak_model_")
    init_random_model_dir(model_dir, version="2.0.0-rc.0", n_voices=4, seed=0)

    # CPU backend: small capacity so the 2-core dev box's compiled tick
    # stays inside the 10 ms budget (the TPU engine holds 16k streams;
    # the CPU run is about proving real-time CADENCE through the full
    # socket stack with local D2H).
    #
    # TPU through the dev relay: each host<->device round trip costs
    # ~10-150 ms, so a 10 ms tick cadence is physically unreachable from
    # this box (PCIe-attached production hosts: ~0.1 ms).  Real-time
    # THROUGHPUT is still provable: frames_per_tick batches fpt*10 ms of
    # audio per scheduler tick, pipeline=True overlaps the D2H of tick
    # t-1 with the compute of tick t, and the scatter reads only the
    # live rows.  SOAK_FPT sets the batching factor (default 25 on TPU =
    # 250 ms per tick; cadence needed for real time drops to 4 Hz).
    # CPU default 4: the 2-core box pays ~20 ms of host dispatch per tick
    # regardless of frame count, so 40 ms ticks amortize it under budget
    fpt = int(os.environ.get("SOAK_FPT", "25" if on_tpu else "4"))
    # SOAK_PIPELINE=0/1 overrides the default (pipeline on TPU only) and
    # keys the report entry separately -- the pipeline-on vs pipeline-off
    # cadence A/B the r2 review asked for
    pipe_env = os.environ.get("SOAK_PIPELINE")
    pipeline = on_tpu if pipe_env is None else pipe_env == "1"
    # CPU capacity 8 (was 16): the engine computes every capacity row
    # each tick regardless of live sessions, and 16 rows of chain on the
    # 2-core box is ~0.73x real time per row -- the committed r2 CPU soak
    # failed on exactly that (4 clients received 18.6-19.6 s of 20).
    # 8 rows (4 clients + headroom) fits the budget.
    host = ModelHost(capacity=256 if on_tpu else 8,
                     compute_dtype="bfloat16" if on_tpu else None,
                     realtime=True,
                     frames_per_tick=fpt, pipeline=pipeline)
    assert host.load_model(model_dir) == ErrorCode.SUCCESS
    srv = VCServer(("127.0.0.1", PORT), host)
    threading.Thread(target=srv.serve_forever, daemon=True).start()

    # warm-up: wait out the first (compiling) ticks, then one throwaway
    # session so the parameter-replay staging helpers are compiled before
    # the fleet connects
    t0 = time.monotonic()
    while time.monotonic() - t0 < 600:
        m = host.metrics()
        if m.get("ticks", 0) > 20 and m.get("tick_p50_ms", 1e9) < 9.0 * fpt:
            break
        time.sleep(1.0)
    # fleet-shaped warm-up: open as many concurrent sessions as the run
    # will use and set the same parameters the clients set, so every
    # staged-control scatter shape and the multi-session reset path are
    # compiled BEFORE the fleet connects (the r2 TPU soak showed a 23 s
    # p99 tick -- a mid-run compile -- with only a single-session warm-up)
    warm = [VCClient(addr=("127.0.0.1", PORT), sample_rate=48000.0,
                     timeout=600.0) for _ in range(n_clients)]
    for i, wc in enumerate(warm):
        wc.set_parameter("voice", i % 4)
        wc.set_parameter("pitch_shift", float(i - 4))
        wc.push(np.zeros(480 * fpt, np.float32))
    time.sleep(2.0 if jax.default_backend() == "cpu" else 8.0)
    for wc in warm:
        wc.pull(480, timeout=1.0)
        wc.close()
    time.sleep(1.0)
    base_ticks = host.metrics().get("ticks", 0)
    print("warm-up done", file=sys.stderr)

    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep)
    )
    env["JAX_PLATFORMS"] = "cpu"  # clients never touch jax, but be safe
    t_run = time.monotonic()
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--client",
             str(i), str(duration)],
            stdout=subprocess.PIPE, env=env, text=True,
        )
        for i in range(n_clients)
    ]
    results = []
    for p in procs:
        out, _ = p.communicate(timeout=duration + 300)
        line = out.strip().splitlines()[-1] if out.strip() else "null"
        results.append(json.loads(line))
    wall = time.monotonic() - t_run

    metrics = host.metrics()
    srv.shutdown()
    host.stop()

    tick_cadence = (metrics.get("ticks", 0) - base_ticks) / max(wall, 1e-9)
    # Cadence on THIS box is bounded by the harness, not the stack: the
    # axon dev relay costs ~100-200 ms per [capacity, 480] host read of
    # the tick output (PCIe-attached production hardware: ~0.1 ms), and
    # the CPU backend needs ~20 ms of 2-core compute per tick.  Gate what
    # the box can actually prove -- sustained multi-client delivery of
    # finite, non-silent audio with the engine's own tick under budget --
    # and report cadence; raise SOAK_MIN_CADENCE on real hardware.
    min_cadence = float(os.environ.get("SOAK_MIN_CADENCE", "0"))
    # real-time delivery gate: every client must receive (almost) all the
    # audio it sent -- slack covers the engine warm-up ramp, the pipeline
    # tick of latency, and edge-resampler history
    slack_s = 1.0 + 2 * fpt * 0.010
    ok = (
        all(r and r["finite"] and r["peak"] > 0
            and r["received_s"] > 1.0
            and r["sent_s"] - r["received_s"] <= slack_s for r in results)
        and metrics.get("tick_p50_ms", 1e9) < 10.0 * fpt
        and tick_cadence >= min_cadence
    )
    report = {
        "device": str(jax.devices()[0]),
        "n_clients": n_clients,
        "duration_s": duration,
        "frames_per_tick": fpt,
        "pipeline": pipeline,
        "wall_s": round(wall, 1),
        "tick_cadence_hz": round(tick_cadence, 1),
        "note": ("dev-relay D2H (~150 ms per host read of the tick output) "
                 "caps the cadence; tick_p50_ms is the engine's real frame "
                 "cost" if on_tpu else
                 "2-core dev box: ~20 ms of host compute per CPU-backend "
                 "tick bounds the cadence, not the serving stack"),
        "clients": results,
        "server_metrics": {
            k: (round(v, 3) if isinstance(v, float) else v)
            for k, v in metrics.items()
        },
        "ok": ok,
    }
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "SERVE_SOAK_REPORT.json")
    combined = {}
    if os.path.exists(out_path):
        try:
            combined = json.load(open(out_path))
        except Exception:
            combined = {}
    if "clients" in combined:  # migrate a single-entry legacy report
        combined = {}
    key = "tpu" if on_tpu else "cpu"
    if pipe_env is not None:
        key += "_pipeline" if pipeline else "_nopipeline"
    combined[key] = report
    with open(out_path, "w") as f:
        json.dump(combined, f, indent=1)
    print(json.dumps(report))
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--client":
        run_client(int(sys.argv[2]), float(sys.argv[3]))
    else:
        main()
