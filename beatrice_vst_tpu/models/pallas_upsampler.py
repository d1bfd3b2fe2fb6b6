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

Kernel construction notes (v2, the form that actually compiles on real
Mosaic -- the v1 findings below were refined with on-chip bisection,
scripts history in git):
  - Mosaic cannot shape-cast across the lane dim, so depth-to-time inside
    the kernel is expressed per output phase with static weight column
    slices.  For the early stages (<= 20 output rows) a sublane stack +
    reshape works; for the LAST stage (80 rows x 3 phases x 16 lanes) that
    stack/reshape SIGABRTs the Mosaic compiler, so stage 4 and the final
    conv run **phase-major**: three [TILE, 80, 16] phase tensors stay
    separate in VMEM, the final k=3 conv is computed per output phase with
    the tap's source phase p=(rho-d)%3 and row shift (history rows cover
    fine steps -1/-2), and the audio is emitted as [TILE, 3, 80] to be
    interleaved by one cheap XLA transpose outside.
  - A kernel output that ALIASES an input -- a passthrough slice, or a
    slice of a concat(input, computed) -- SIGABRTs Mosaic whenever
    narrow-lane dots are present.  Streaming states must therefore be
    sliced from the computed activation tensors directly (y1[:, -2:, :]),
    never through the concat; the stage-1 state (genuinely input-only:
    [s1 tail, h]) is computed outside the kernel.

Available in WaveformGenerator for the T==1 streaming step
(`use_pallas_upsampler`); the XLA path remains the reference
implementation (chunked/offline, CPU, and the golden tests) and the two
are equivalence-tested (tests/test_pallas.py).

MEASURED VERDICT (v5e, B=2048, bf16): the fused kernel compiles and is
numerically equivalent (max|d| ~2e-3 in bf16) but runs the waveform
generator 3.5x SLOWER than the XLA path (6.6 ms vs 1.8 ms standalone).
The tail stages' 16/32-channel tensors lane-pad 8x/4x, so the VPU/MXU do
8x the useful work per element, and TILE=16 rows underutilize the MXU --
while XLA's own fusion of this head is already good.  Default stays OFF;
the kernel is kept as the working, tested recipe for Mosaic's real
constraints (see construction notes above), which now bound what a
profitable kernel here would need: a channel plan whose tail stays >=64
lanes, or hardware whose native lane width is narrower.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import OUT_HOP_LENGTH

TILE = 16  # streams per kernel instance.  16 is the largest tile that
# compiles at serving batch (grid pipelining double-buffers the blocks;
# TILE>=32 exceeds VMEM once grid > ~2).


def _snake(y, log_alpha):
    a = jnp.exp(log_alpha.astype(jnp.float32))
    y32 = y.astype(jnp.float32)
    u = y32 * (a / math.pi)
    u = u - jnp.floor(u)
    q = u * (1.0 - u)
    return y32 + (16.0 / (a + 1e-9)) * (q * q)


def _snake_sin_legacy(y, log_alpha):
    a = jnp.exp(log_alpha.astype(jnp.float32))
    y32 = y.astype(jnp.float32)
    s = jnp.sin(a * y32)
    return y32 + s * s / (a + 1e-9)


def _stage(seq, w, b, src, sw, sb, log_alpha, r, c_out, compute_dtype):
    """One upsampler stage on a [TILE, T+2, C] sequence (2 = conv history).

    Returns ([TILE, T*r, c_out] activations, [TILE, 2, C] new state).
    seq/w layouts match layers.causal_conv (tap j reads time t-(k-1-j)).
    Depth-to-time is phase-by-phase (static weight column slices + a
    sublane-merging stack) -- fine for the early stages' row counts.
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
    return _snake(out + src_proj, log_alpha)


def _kernel(cfg_static, h_ref, s1_ref, s2_ref, s3_ref, s4_ref, sf_ref,
            srcA_ref, srcB_ref, srcC_ref, srcD0_ref, srcD1_ref, srcD2_ref,
            w1, b1, sw1, sb1, a1, w2, b2, sw2, sb2, a2,
            w3, b3, sw3, sb3, a3, w4, b4, sw4, sb4, a4, wf, bf_,
            audio_ref, ns2_ref, ns3_ref, ns4_ref, nsf_ref):
    rates, channels, compute_dtype = cfg_static
    r4, c4 = rates[3], channels[3]
    h = h_ref[:]  # [TILE, 1, C0] frame-rate features

    seq1 = jnp.concatenate([s1_ref[:].astype(h.dtype), h], axis=1)
    y1 = _stage(seq1, w1[:], b1[:], srcA_ref[:], sw1[:], sb1[:], a1[:],
                rates[0], channels[0], compute_dtype)
    # (stage-1 state is computed outside the kernel; see module docstring)

    seq2 = jnp.concatenate([s2_ref[:].astype(y1.dtype), y1], axis=1)
    y2 = _stage(seq2, w2[:], b2[:], srcB_ref[:], sw2[:], sb2[:], a2[:],
                rates[1], channels[1], compute_dtype)
    ns2_ref[:] = y1[:, -2:, :].astype(ns2_ref.dtype)  # slice y1, NOT seq2

    seq3 = jnp.concatenate([s3_ref[:].astype(y2.dtype), y2], axis=1)
    y3 = _stage(seq3, w3[:], b3[:], srcC_ref[:], sw3[:], sb3[:], a3[:],
                rates[2], channels[2], compute_dtype)
    ns3_ref[:] = y2[:, -2:, :].astype(ns3_ref.dtype)

    # ---- stage 4: phase-major (no [TILE, 240, 16] stack/reshape) ----
    seq4 = jnp.concatenate([s4_ref[:].astype(y3.dtype), y3], axis=1)
    t4 = seq4.shape[1] - 2
    taps4 = [seq4[:, j: j + t4, :].astype(compute_dtype) for j in range(3)]
    a4v = a4[:]
    srcD = (srcD0_ref, srcD1_ref, srcD2_ref)
    y_pm = []
    for rho in range(r4):
        acc = None
        for j in range(3):
            wj = w4[:][j][:, rho * c4:(rho + 1) * c4].astype(compute_dtype)
            y = jax.lax.dot_general(
                taps4[j], wj,
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = y if acc is None else acc + y
        acc = acc + b4[:][rho * c4:(rho + 1) * c4].astype(jnp.float32)
        sp = jax.lax.dot_general(
            srcD[rho][:].astype(compute_dtype), sw4[:].astype(compute_dtype),
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + sb4[:].astype(jnp.float32)
        y_pm.append(_snake(acc + sp, a4v).astype(compute_dtype))
    ns4_ref[:] = y3[:, -2:, :].astype(ns4_ref.dtype)

    # ---- final conv (k=3) phase-major; audio out [TILE, r4, t4*?] ----
    # out[u] = sum_j wf[j] . fine[u-2+j]; u = r4*q + rho; source fine index
    # v = u - d (d = 2-j) has phase p = (rho-d) % r4 and, when rho-d < 0,
    # comes from row q-1 of phase p (row -1 = carried history fine[v],
    # hist row = 2 + v for v in {-1, -2}).
    hist = sf_ref[:].astype(compute_dtype)  # [TILE, 2, c4] = fine[-2], fine[-1]
    n_rows = t4  # rows per phase (t4 * r4 == OUT_HOP_LENGTH)
    for rho in range(r4):
        acc = None
        for j in range(3):
            d = 2 - j
            v0 = rho - d  # fine index of this tap at q == 0
            p = v0 % r4
            if v0 >= 0:
                xin = y_pm[p]
            else:
                hrow = hist[:, 2 + v0: 3 + v0, :]
                xin = jnp.concatenate([hrow, y_pm[p][:, : n_rows - 1, :]],
                                      axis=1)
            yj = jax.lax.dot_general(
                xin, wf[:][j].astype(compute_dtype),
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = yj if acc is None else acc + yj
        acc = acc + bf_[:].astype(jnp.float32)
        audio_ref[:, rho, :] = jnp.tanh(acc)[..., 0]

    # final-conv state: last 2 fine steps (238, 239) = phases r4-2, r4-1
    # at the last row
    nsf_ref[:] = jnp.concatenate(
        [y_pm[r4 - 2][:, -1:, :], y_pm[r4 - 1][:, -1:, :]], axis=1
    ).astype(nsf_ref.dtype)


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
    r4 = rates[3]
    n_rows = OUT_HOP_LENGTH // r4
    grid = (b // TILE,)

    def tiled(shape):  # block over the leading (stream) axis
        return pl.BlockSpec((TILE, *shape), lambda i: (i, *([0] * len(shape))),
                            memory_space=pltpu.VMEM)

    def full(arr):  # replicated (weights)
        return pl.BlockSpec(arr.shape, lambda i: tuple([0] * arr.ndim),
                            memory_space=pltpu.VMEM)

    # stage-4 source features phase-major: [B, n_rows, n_src] per phase
    srcD = [src_feats[3][:, rho::r4, :] for rho in range(r4)]
    kernel_srcs = [src_feats[0], src_feats[1], src_feats[2], *srcD]

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
        + [tiled(s.shape[1:]) for s in kernel_srcs]
        + weight_specs
    )
    out_shapes = [
        jax.ShapeDtypeStruct((b, r4, n_rows), jnp.float32),  # phase-major
        jax.ShapeDtypeStruct(states[1].shape, states[1].dtype),
        jax.ShapeDtypeStruct(states[2].shape, states[2].dtype),
        jax.ShapeDtypeStruct(states[3].shape, states[3].dtype),
        jax.ShapeDtypeStruct(states[4].shape, states[4].dtype),
    ]
    out_specs = [tiled((r4, n_rows))] + [
        tiled(s.shape[1:]) for s in states[1:]
    ]

    kernel = functools.partial(_kernel, (rates, channels, compute_dtype))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(h, *states, *kernel_srcs, *weight_args)

    audio_pm = outs[0]  # [B, r4, n_rows]
    audio = jnp.transpose(audio_pm, (0, 2, 1)).reshape(b, OUT_HOP_LENGTH)
    # stage-1 state: trivial input slice, computed outside the kernel
    ns1 = jnp.concatenate(
        [states[0].astype(h.dtype), h], axis=1
    )[:, 1:, :].astype(states[0].dtype)
    return audio, [ns1, *outs[1:]]
