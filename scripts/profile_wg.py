"""Waveform-generator internals on the real chip: attention vs upsampler
vs conditioning stack, XLA vs Pallas upsampler head."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from beatrice_vst_tpu.constants import V20RC0
from beatrice_vst_tpu.models import waveform_generator as wg_mod
from beatrice_vst_tpu.models import layers
from beatrice_vst_tpu.models.waveform_generator import WaveformGeneratorConfig

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
REPS = 30


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf.ravel()[:1])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / REPS)
    print(f"{name:40s} {best*1e3:8.3f} ms")
    return best, out


def main():
    cfg = WaveformGeneratorConfig.for_version(V20RC0)
    key = jax.random.PRNGKey(0)
    params = wg_mod.init(key, cfg)
    state = wg_mod.init_state(cfg, (B,))
    rng = np.random.default_rng(0)
    phone = jnp.asarray(rng.standard_normal((B, 1, cfg.phone_channels)), jnp.bfloat16)
    qp = jnp.asarray(rng.integers(1, cfg.pitch_bins - 1, (B, 1)), jnp.int32)
    feats = jnp.asarray(rng.standard_normal((B, 1, 4)), jnp.float32)
    spk = jnp.asarray(rng.standard_normal((B, cfg.hidden)), jnp.float32)

    # int8 kv cache like the engine builds
    kv_bank = jnp.asarray(
        rng.standard_normal((B, cfg.kv_length, cfg.kv_channels)), jnp.float32)
    cache_f = wg_mod.project_kv(params, cfg, kv_bank, jnp.bfloat16)
    kq, ks = layers.quantize_rows(cache_f["k"])
    vq_, vs = layers.quantize_rows(cache_f["v"])
    cache_q = {"k": kq, "k_scale": ks, "v": vq_, "v_scale": vs}
    cache_bf = {"k": cache_f["k"].astype(jnp.bfloat16),
                "v": cache_f["v"].astype(jnp.bfloat16)}

    full = jax.jit(lambda p, ph, q, f, s, st, kvc: wg_mod.apply(
        p, cfg, ph, q, f, s, st, None, kvc, compute_dtype=jnp.bfloat16))
    timeit("wg full (int8 kv cache)", full, params, phone, qp, feats, spk,
           state, cache_q)
    timeit("wg full (bf16 kv cache)", full, params, phone, qp, feats, spk,
           state, cache_bf)

    # attention alone x4 blocks
    h = jnp.asarray(rng.standard_normal((B, 1, cfg.hidden)), jnp.bfloat16)

    def attn4_q(h, cache):
        for i in range(cfg.n_blocks):
            h = layers.cross_attention_cached_q(
                params["blocks"][i]["attn"], h,
                cache["k"][:, i], cache["k_scale"][:, i],
                cache["v"][:, i], cache["v_scale"][:, i], jnp.bfloat16)
        return h

    def attn4_bf(h, cache):
        for i in range(cfg.n_blocks):
            h = layers.cross_attention_cached(
                params["blocks"][i]["attn"], h,
                cache["k"][:, i], cache["v"][:, i], jnp.bfloat16)
        return h

    timeit("attention x4 (int8)", jax.jit(attn4_q), h, cache_q)
    timeit("attention x4 (bf16)", jax.jit(attn4_bf), h, cache_bf)

    # conv blocks alone x4
    def blocks4(h, st):
        out = []
        for i in range(cfg.n_blocks):
            h, ns = layers.conv_block(
                params["blocks"][i]["conv"], h, st[i], 1, jnp.bfloat16)
            out.append(ns)
        return h, out

    timeit("conv blocks x4", jax.jit(blocks4), h, state["blocks"])

    # upsampler head alone: xla loop vs pallas
    import dataclasses
    hcond = jnp.asarray(rng.standard_normal((B, 1, cfg.hidden)), jnp.bfloat16)

    def upsampler_xla(h, st):
        cfg2 = dataclasses.replace(cfg, use_kv_attention=False, n_blocks=0)
        # reuse apply's tail by calling apply with no blocks
        p2 = dict(params)
        p2 = {**params, "blocks": []}
        return wg_mod.apply(p2, cfg2, phone, qp, feats, spk,
                            {**st, "blocks": []}, None, None,
                            compute_dtype=jnp.bfloat16)

    timeit("wg minus attention (xla upsampler)", jax.jit(upsampler_xla),
           hcond, state)

    try:
        cfg_p = dataclasses.replace(cfg, use_pallas_upsampler=True)
        full_p = jax.jit(lambda p, ph, q, f, s, st, kvc: wg_mod.apply(
            p, cfg_p, ph, q, f, s, st, None, kvc, compute_dtype=jnp.bfloat16))
        timeit("wg full (pallas upsampler, int8 kv)", full_p, params, phone,
               qp, feats, spk, state, cache_q)
    except Exception as e:
        print("pallas upsampler failed:", str(e)[:300])


if __name__ == "__main__":
    main()
