"""One-process A/B of tick formulations at serving batch.

Claim-friendly: the dev relay's chip claim takes minutes to recycle
between processes, so every configuration is measured inside ONE process
by toggling the knobs that the engine reads at build time
(waveform_generator._SRC_MODE; BEATRICE_BMAJOR_PIN env, read by
_ring_layout_formats during StreamEngine construction).

Usage: python scripts/bench_ab.py [capacity ...]   (default 19456 20480)
Merges into docs/BENCH_AB_R3.json (existing rows from other A/B drivers
are preserved) and prints one JSON line per config.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# r3: the A/B axis is the merged phone+pitch mel ring (chain.init_state
# reads BEATRICE_MERGED_MEL_RING at engine build).  src=dot + bmajor pin
# won round 2 and stay fixed.
CONFIGS = [
    # (name, src_mode, bmajor_pin, merged_mel_ring)
    ("merged_ring", "dot", "1", "1"),
    ("split_ring", "dot", "1", "0"),
]


def measure(capacity, src_mode, bmajor_pin, merged_ring="1"):
    import jax
    import jax.numpy as jnp

    from beatrice_vst_tpu.constants import V20RC0
    from beatrice_vst_tpu.models import chain
    from beatrice_vst_tpu.models import waveform_generator as wg
    from beatrice_vst_tpu.runtime import EngineConfig, StreamEngine
    from beatrice_vst_tpu.speakers import bank as bank_mod

    wg._SRC_MODE = src_mode
    os.environ["BEATRICE_BMAJOR_PIN"] = bmajor_pin
    os.environ["BEATRICE_MERGED_MEL_RING"] = merged_ring
    # any BEATRICE_* env knob set by the caller must invalidate the
    # lru-cached readers, or this row silently re-measures the previous
    # config (ADVICE r3: the ring_dus_select@20480 row was exactly this)
    from beatrice_vst_tpu.models import layers

    layers.clear_env_knob_caches()

    cfg = EngineConfig.realtime(capacity, V20RC0, compute_dtype="bfloat16")
    params = chain.init(jax.random.PRNGKey(0), cfg.model)
    bank = bank_mod.random_bank(jax.random.PRNGKey(1), V20RC0, 16)
    eng = StreamEngine(cfg, params, bank)
    for _ in range(capacity):
        eng.admit()
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.standard_normal((capacity, 480)) * 0.1, jnp.float32))
    out = eng.tick(x)
    jax.block_until_ready(out)
    _ = np.asarray(out[0, :1])  # flip to sync mode (honest timing)

    def window(n):
        t0 = time.perf_counter()
        for _ in range(n):
            o = eng.tick(x)
        jax.block_until_ready(o)
        return (time.perf_counter() - t0) / n

    window(10)
    samples = [window(50) for _ in range(3)]
    del eng, x, out
    return float(np.min(samples)) * 1e3


def main():
    caps = [int(c) for c in sys.argv[1:]] or [19456, 20480]
    out_path = os.path.join(REPO, "docs", "BENCH_AB_R3.json")
    # merge into the accumulated file (r3b/r3c rows back README/CLAUDE.md
    # claims; starting from {} here used to discard them -- ADVICE r3)
    results = {}
    if os.path.exists(out_path):
        try:
            with open(out_path) as f:
                results = json.load(f)
        except (json.JSONDecodeError, OSError):
            results = {}
    # incremental write + per-config fault isolation: a crash in one
    # config (or a dropped relay) must not discard the rows already
    # measured in this chip claim (learned the hard way in r3)
    for name, src_mode, pin, merged in CONFIGS:
        for cap in caps:
            t0 = time.time()
            try:
                ms = measure(cap, src_mode, pin, merged)
                row = {"config": name, "capacity": cap,
                       "steady_tick_ms": round(ms, 3),
                       "realtime": ms < 9.5,
                       "build_s": round(time.time() - t0, 1)}
            except Exception as e:  # noqa: BLE001 - keep the claim alive
                import traceback
                traceback.print_exc()
                row = {"config": name, "capacity": cap,
                       "error": f"{type(e).__name__}: {e}"}
            results[f"{name}@{cap}"] = row
            print(json.dumps(row), flush=True)
            with open(out_path, "w") as f:
                json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
