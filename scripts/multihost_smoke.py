"""Two-process jax.distributed smoke test on CPU.

Validates the multi-host bring-up path (parallel/mesh.py:distributed_init)
end to end: both processes join a coordination service, build one global
('streams','model') mesh spanning both processes' devices, shard an engine
state over it, and run one engine tick with global collectives compiled in.

Run:  python scripts/multihost_smoke.py           (spawns both processes)
      python scripts/multihost_smoke.py --worker N  (internal)
"""

import os
import subprocess
import sys

PORT = 12355
N_PROC = 2
LOCAL_DEVICES = 4


def worker(process_id: int) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    # NOTE: cannot use force_cpu_host_devices here -- it touches jax.devices,
    # and jax.distributed.initialize must run before ANY backend use.  Set
    # the platform via config only (fresh subprocess: nothing initialized).
    flag = f"--xla_force_host_platform_device_count={LOCAL_DEVICES}"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " " + flag).strip()
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    from beatrice_vst_tpu.parallel import distributed_init

    distributed_init(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=N_PROC,
        process_id=process_id,
    )
    assert jax.process_count() == N_PROC
    assert len(jax.devices()) == N_PROC * LOCAL_DEVICES

    from jax.sharding import NamedSharding, PartitionSpec as P

    from beatrice_vst_tpu.constants import V20A2
    from beatrice_vst_tpu.models import chain
    from beatrice_vst_tpu.parallel import make_mesh, state_sharding
    from beatrice_vst_tpu.runtime import EngineConfig, engine_tick, init_engine_state
    from beatrice_vst_tpu.speakers import bank as bank_mod

    mesh = make_mesh(streams=N_PROC * LOCAL_DEVICES, model=1)
    cap = 16  # 2 streams per device
    cfg = EngineConfig.realtime(cap, V20A2)
    params = chain.init(jax.random.PRNGKey(0), cfg.model)
    bank = bank_mod.random_bank(jax.random.PRNGKey(1), V20A2, 3)

    # Host-local construction + global sharding: each process materializes
    # the full logical state; device_put distributes the local shards.
    state = init_engine_state(cfg)
    state["controls"]["active"] = jnp.ones(cap, bool)
    state = jax.device_put(state, state_sharding(state, mesh))
    x = jax.device_put(
        jnp.zeros((cap, 480)), NamedSharding(mesh, P("streams", None))
    )
    import functools

    with mesh:
        tick = jax.jit(functools.partial(engine_tick, cfg=cfg))
        out, new_state = tick(params, bank, state, x)
        jax.block_until_ready(out)
        total = float(
            jax.jit(lambda o: jnp.sum(jnp.abs(o)))(out)
        )  # global reduction across both processes' shards
    print(f"[proc {process_id}] tick ok on {jax.device_count()} devices, "
          f"sum|out|={total:.3f}", flush=True)


def main() -> None:
    if "--worker" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--worker") + 1]))
        return
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(i)],
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        for i in range(N_PROC)
    ]
    codes = [p.wait(timeout=600) for p in procs]
    if any(codes):
        raise SystemExit(f"worker failures: {codes}")
    print("multihost smoke OK")


if __name__ == "__main__":
    main()
