"""Pallas-fused vocoder upsampler: the 240-samples-per-frame hot op.

The depth-to-time upsampler (waveform_generator.py) is, in XLA, ~25 ops
per frame (per stage: concat, k matmuls, source projection, snake, two
reshapes; then the final conv).  At real-time tick sizes every op is a
separate kernel launch over small tensors, and the inter-stage
activations ([B,4,128] -> [B,20,64] -> [B,80,32] -> [B,240,16]) each
round-trip HBM.  This kernel runs the whole head for a tile of streams in
VMEM: 5 causal convs (as k=3 shifted matmuls on the MXU), source
injection, snake activations, and the tanh output -- one launch, zero
intermediate HBM traffic, plus the per-stage streaming-state updates.

Optionally used by WaveformGenerator for the T==1 streaming step
(`use_pallas_upsampler`); the XLA path remains the reference
implementation (chunked/offline, CPU, and the golden tests) and the two
are equivalence-tested (tests/test_pallas.py).

Status / measured findings on v5e (kept for the record):
  - Mosaic cannot shape-cast across the lane dim, so the depth-to-time
    reshape ([T, r*C'] -> [T*r, C']) must be expressed per output phase
    with static weight column slices + a sublane-merging stack.
  - The narrow tail channels of this upsampler (64/32/16) lane-pad to
    128, so the fused kernel's live set costs up to 8x its logical bytes
    of VMEM: at TILE=64 the kernel exceeds the 16 MB scoped VMEM limit.
    A production-shape fix is a phase-major layout (keep activations
    [T, r*C] >= 128 wide until the final write), left as future work;
    the XLA path's upsampler share is ~0.8 ms of a 5.7 ms tick at
    B=2048, bounding the win.
  - Default OFF; enable via WaveformGeneratorConfig.use_pallas_upsampler
    (equivalence is CI-tested in interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import OUT_HOP_LENGTH

TILE = 32  # streams per kernel instance (VMEM-bound: narrow channels pad
# to 128 lanes, so the low-rate stages cost 8x their logical bytes)


def _snake(y, log_alpha):
    a = jnp.exp(log_alpha.astype(jnp.float32))
    y32 = y.astype(jnp.float32)
    s = jnp.sin(a * y32)
    return y32 + s * s / (a + 1e-9)


def _stage(seq, w, b, src, sw, sb, log_alpha, r, c_out, compute_dtype):
    """One upsampler stage on a [TILE, T+2, C] sequence (2 = conv history).

    Returns ([TILE, T*r, c_out] activations, [TILE, 2, C] new state).
    seq/w layouts match layers.causal_conv (tap j reads time t-(k-1-j)).

    Depth-to-time is done phase-by-phase (static weight column slices +
    a sublane-merging reshape): Mosaic cannot shape-cast across the lane
    dimension, so the [T, r*C'] -> [T*r, C'] reshape of the XLA path is
    expressed as r per-phase [T, C'] matmuls stacked on a sublane axis.
    """
    t = seq.shape[1] - 2
    taps = [seq[:, j: j + t, :].astype(compute_dtype) for j in range(3)]
    phases = []
    for rho in range(r):
        acc = None
        for j in range(3):
            wj = w[j][:, rho * c_out:(rho + 1) * c_out].astype(compute_dtype)
            y = jax.lax.dot_general(
                taps[j], wj,
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = y if acc is None else acc + y
        phases.append(acc + b[rho * c_out:(rho + 1) * c_out].astype(jnp.float32))
    out = jnp.stack(phases, axis=2)  # [TILE, t, r, C'] (lane dim intact)
    out = out.reshape(out.shape[0], t * r, c_out)
    src_proj = jax.lax.dot_general(
        src.astype(compute_dtype), sw.astype(compute_dtype),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + sb.astype(jnp.float32)
    out = _snake(out + src_proj, log_alpha)
    new_state = seq[:, t:, :]
    return out, new_state


def _kernel(cfg_static, h_ref, s1_ref, s2_ref, s3_ref, s4_ref, sf_ref,
            srcA_ref, srcB_ref, srcC_ref, srcD_ref,
            w1, b1, sw1, sb1, a1, w2, b2, sw2, sb2, a2,
            w3, b3, sw3, sb3, a3, w4, b4, sw4, sb4, a4, wf, bf_,
            y_ref, ns1_ref, ns2_ref, ns3_ref, ns4_ref, nsf_ref):
    rates, channels, compute_dtype = cfg_static
    h = h_ref[:]  # [TILE, 1, C0] frame-rate features

    seq1 = jnp.concatenate([s1_ref[:].astype(h.dtype), h], axis=1)
    y1, ns1 = _stage(seq1, w1[:], b1[:], srcA_ref[:], sw1[:], sb1[:], a1[:],
                     rates[0], channels[0], compute_dtype)
    ns1_ref[:] = ns1.astype(ns1_ref.dtype)

    seq2 = jnp.concatenate([s2_ref[:].astype(y1.dtype), y1], axis=1)
    y2, ns2 = _stage(seq2, w2[:], b2[:], srcB_ref[:], sw2[:], sb2[:], a2[:],
                     rates[1], channels[1], compute_dtype)
    ns2_ref[:] = ns2.astype(ns2_ref.dtype)

    seq3 = jnp.concatenate([s3_ref[:].astype(y2.dtype), y2], axis=1)
    y3, ns3 = _stage(seq3, w3[:], b3[:], srcC_ref[:], sw3[:], sb3[:], a3[:],
                     rates[2], channels[2], compute_dtype)
    ns3_ref[:] = ns3.astype(ns3_ref.dtype)

    seq4 = jnp.concatenate([s4_ref[:].astype(y3.dtype), y3], axis=1)
    y4, ns4 = _stage(seq4, w4[:], b4[:], srcD_ref[:], sw4[:], sb4[:], a4[:],
                     rates[3], channels[3], compute_dtype)
    ns4_ref[:] = ns4.astype(ns4_ref.dtype)

    seqf = jnp.concatenate([sf_ref[:].astype(y4.dtype), y4], axis=1)
    t = seqf.shape[1] - 2
    acc = None
    for j in range(3):
        x = seqf[:, j: j + t, :].astype(compute_dtype)
        y = jax.lax.dot_general(
            x, wf[:][j].astype(compute_dtype),
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = y if acc is None else acc + y
    acc = acc + bf_[:].astype(jnp.float32)
    y_ref[:] = jnp.tanh(acc[..., 0])
    nsf_ref[:] = seqf[:, t:, :].astype(nsf_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("rates", "channels", "compute_dtype", "interpret")
)
def fused_upsample(up_params, final_params, h, states, src_feats, *,
                   rates, channels, compute_dtype=jnp.bfloat16,
                   interpret=False):
    """Run the fused upsampler head for one frame.

    up_params: list of 4 stage params ({conv:{w,b}, src:{w,b}, snake});
    final_params: {w, b}; h: [B, 1, C0]; states: list of 5 conv states
    [B, 2, C]; src_feats: list of 4 [B, r_cum, n_src] source features.
    Returns (audio [B, 240], new_states list).
    """
    b = h.shape[0]
    if b % TILE:
        raise ValueError(f"batch {b} must be a multiple of {TILE}")
    grid = (b // TILE,)

    def tiled(shape):  # block over the leading (stream) axis
        return pl.BlockSpec((TILE, *shape), lambda i: (i, *([0] * len(shape))),
                            memory_space=pltpu.VMEM)

    def full(arr):  # replicated (weights)
        return pl.BlockSpec(arr.shape, lambda i: tuple([0] * arr.ndim),
                            memory_space=pltpu.VMEM)

    weight_args = []
    weight_specs = []
    for p in up_params:
        for arr in (p["conv"]["w"], p["conv"]["b"], p["src"]["w"],
                    p["src"]["b"], p["snake"]["log_alpha"]):
            weight_args.append(arr)
            weight_specs.append(full(arr))
    weight_args += [final_params["w"], final_params["b"]]
    weight_specs += [full(final_params["w"]), full(final_params["b"])]

    in_specs = (
        [tiled(h.shape[1:])]
        + [tiled(s.shape[1:]) for s in states]
        + [tiled(s.shape[1:]) for s in src_feats]
        + weight_specs
    )
    out_shapes = (
        [jax.ShapeDtypeStruct((b, OUT_HOP_LENGTH), jnp.float32)]
        + [jax.ShapeDtypeStruct(s.shape, s.dtype) for s in states]
    )
    out_specs = [tiled((OUT_HOP_LENGTH,))] + [tiled(s.shape[1:]) for s in states]

    kernel = functools.partial(_kernel, (rates, channels, compute_dtype))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(h, *states, *src_feats, *weight_args)
    return outs[0], list(outs[1:])
