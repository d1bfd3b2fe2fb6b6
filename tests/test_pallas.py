"""Pallas fused upsampler == XLA reference path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from beatrice_vst_tpu.constants import V20RC0
from beatrice_vst_tpu.models import waveform_generator as WG
from beatrice_vst_tpu.models.pallas_upsampler import fused_upsample
from beatrice_vst_tpu.models.chain import VoiceConverterConfig


def test_fused_upsampler_matches_xla():
    cfg = VoiceConverterConfig.for_version(V20RC0).wg
    params = WG.init(jax.random.PRNGKey(0), cfg)
    b = 64
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.standard_normal((b, 1, cfg.hidden)) * 0.5, jnp.float32)
    states = [jnp.asarray(rng.standard_normal(s.shape) * 0.1, jnp.float32)
              for s in ([WG.init_state(cfg, (b,))["up"][i] for i in range(4)]
                        + [WG.init_state(cfg, (b,))["final"]])]
    spf = 1
    src_feats = []
    for r, _ in cfg.upsample:
        spf *= r
        src_feats.append(
            jnp.asarray(rng.standard_normal((b, spf, cfg.n_harmonics + 1)) * 0.3,
                        jnp.float32)
        )

    # XLA reference: run the same math with layers ops
    from beatrice_vst_tpu.models import layers

    x = h
    ref_states = []
    for i, ((r, c_out), up) in enumerate(zip(cfg.upsample, params["up"])):
        y, ns = layers.causal_conv(up["conv"], x, states[i], 1)
        ref_states.append(ns)
        y = y.reshape(b, y.shape[1] * r, c_out)
        y = y + layers.linear(up["src"], src_feats[i])
        x = layers.snake(up["snake"], y)
    y, fs = layers.causal_conv(params["final"], x, states[4], 1)
    ref_states.append(fs)
    ref_audio = jnp.tanh(y.astype(jnp.float32))[..., 0]

    audio, new_states = fused_upsample(
        params["up"], params["final"], h, states, src_feats,
        rates=tuple(r for r, _ in cfg.upsample),
        channels=tuple(c for _, c in cfg.upsample),
        compute_dtype=jnp.float32,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(audio), np.asarray(ref_audio), rtol=1e-4, atol=1e-5
    )
    for got, want in zip(new_states, ref_states):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_wg_apply_pallas_flag_matches(monkeypatch):
    """WG.apply with the pallas flag (interpret) == without."""
    import dataclasses

    base = VoiceConverterConfig.for_version(V20RC0).wg
    cfg_p = dataclasses.replace(base, use_pallas_upsampler=True)
    params = WG.init(jax.random.PRNGKey(1), base)
    b = 64
    rng = np.random.default_rng(1)
    phone = jnp.asarray(rng.standard_normal((b, 1, 128)), jnp.float32)
    qp = jnp.asarray(rng.integers(50, 400, (b, 1)), jnp.int32)
    feats = jnp.asarray(rng.standard_normal((b, 1, 4)), jnp.float32)
    spk = jnp.asarray(rng.standard_normal((b, 256)) * 0.1, jnp.float32)
    kv = jnp.asarray(rng.standard_normal((b, 384, 128)) * 0.1, jnp.float32)
    st = WG.init_state(base, (b,))

    # route interpret=True through the pallas path for CPU execution
    import beatrice_vst_tpu.models.pallas_upsampler as PU

    orig = PU.fused_upsample
    monkeypatch.setattr(
        PU, "fused_upsample",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    )
    out_ref, st_ref = WG.apply(params, base, phone, qp, feats, spk, st, kv)
    out_pal, st_pal = WG.apply(params, cfg_p, phone, qp, feats, spk, st, kv)
    np.testing.assert_allclose(
        np.asarray(out_pal), np.asarray(out_ref), rtol=1e-4, atol=1e-5
    )
    for a_, b_ in zip(jax.tree_util.tree_leaves(st_pal), jax.tree_util.tree_leaves(st_ref)):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_), rtol=1e-4, atol=1e-5)
