"""Streaming neural-net layer primitives with explicit scan-carry state.

The reference's closed inference library keeps per-stream streaming context
objects (conv/attention history) behind `Beatrice*_Create*Context1`
(`/root/reference/lib/beatricelib/beatrice.h:56-120`).  Here every layer
exposes the state *explicitly* as a pytree of `[B, ...]` tensors so a batch
of thousands of streams is one fused XLA computation and the whole chain
can run under `lax.scan`.

Conventions:
  - params: nested dicts of jnp arrays; `init_*` builds them from a PRNG key.
  - time-major chunk API: x is [B, T, C]; `step` is the T=1 special case of
    the same code path, which makes step==chunk equivalence structural.
  - causal convs are evaluated as k shifted slices -> one reshaped matmul
    ([B*T, k*Cin] x [k*Cin, Cout]) so the MXU does the work; no gather, no
    dynamic shapes.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp


def _uniform(key, shape, scale, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, -scale, scale)


# ---------------------------------------------------------------- linear --


def linear_init(key, in_dim, out_dim, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    scale = 1.0 / math.sqrt(in_dim)
    return {
        "w": _uniform(kw, (in_dim, out_dim), scale, dtype),
        "b": jnp.zeros((out_dim,), dtype),
    }


def linear(params, x, compute_dtype=None, out_dtype=None):
    """y = x @ w + b.  With compute_dtype set, inputs cast to it and the
    OUTPUT is emitted in it too (f32 MXU accumulation; the bias add and the
    convert fuse into the dot's output fusion): the residual streams then
    carry compute-dtype bytes instead of f32 -- at serving batch the f32
    [B, 256] dot outputs were re-read by every residual add / layer norm
    in one giant kLoop (~0.36 ms/tick at B=16384 on v5e).  out_dtype
    overrides the emitted dtype (e.g. f32 pitch logits for the argmax)."""
    w, b = params["w"], params["b"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    y = y + b.astype(y.dtype)
    target = out_dtype or compute_dtype
    return y.astype(target) if target is not None else y


# ------------------------------------------------------------ layer norm --


def layer_norm_init(dim, dtype=jnp.float32):
    return {"g": jnp.ones((dim,), dtype), "b": jnp.zeros((dim,), dtype)}


def layer_norm(params, x, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * params["g"] + params["b"]).astype(x.dtype)


# ---------------------------------------------------------- causal conv --


def causal_conv_init(key, k, in_dim, out_dim, dilation=1, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    scale = 1.0 / math.sqrt(k * in_dim)
    return {
        "w": _uniform(kw, (k, in_dim, out_dim), scale, dtype),
        "b": jnp.zeros((out_dim,), dtype),
        # static metadata rides along as python ints via closure use;
        # dilation is encoded in the state length so apply() can infer it.
    }


def causal_conv_state(batch_shape, k, in_dim, dilation=1, dtype=jnp.float32,
                      ring=False):
    """Conv history carry.  Linear convention (and the default ring
    layout): [*batch, R, Cin].  With ring=True and
    BEATRICE_RING_LAYOUT=rmajor the ring is stored ring-major [R, *batch,
    Cin]: the per-tick row write becomes a *leading-axis*
    dynamic-update-slice of a contiguous, tile-aligned [1, B, C] block --
    the classic KV-cache update pattern the backend updates in place --
    instead of a sublane-strided row write that forced a defensive copy of
    the whole buffer (0.44 ms/tick for the [B, 24, 256] phone-d8 ring at
    B=14336 on v5e, plus 0.24 ms of strided tap reads)."""
    r = (k - 1) * dilation
    if ring and _ring_layout() == "rmajor":
        return jnp.zeros((r, *batch_shape, in_dim), dtype)
    return jnp.zeros((*batch_shape, r, in_dim), dtype)


@functools.lru_cache(maxsize=1)
def _ring_layout() -> str:
    """Ring-buffer storage layout: 'bmajor' = [*batch, R, C] (same shape as
    the linear convention), 'rmajor' = [R, *batch, C] (leading-axis row
    writes; see causal_conv_state).  Process-wide: states are created and
    consumed under the same value.  Default rmajor: measured on v5e at
    B=14336 it cut the serving tick 9.08 -> 8.91 ms (the [B,24,256] ring's
    defensive-copy DUS + strided tap reads become aligned leading-axis
    slices)."""
    return os.environ.get("BEATRICE_RING_LAYOUT", "rmajor")


@functools.lru_cache(maxsize=1)
def _ring_mode() -> tuple[str, str]:
    """(read, write) formulations for the ring step, for on-chip A/B:
    'dus' = dynamic_(update_)slice, 'select' = one-hot contraction reads /
    predicated-where write.  Env BEATRICE_RING_MODE, e.g. 'dus,select'."""
    v = os.environ.get("BEATRICE_RING_MODE", "dus,dus")
    parts = v.split(",")
    return (parts[0], parts[-1]) if len(parts) > 1 else (parts[0], parts[0])


@functools.lru_cache(maxsize=None)
def _ring_mode_for(r: int) -> tuple[str, str]:
    """Per-R (read, write) override: BEATRICE_RING_MODES='2:dus,select;24:…'
    falls back to _ring_mode().  Different buffer shapes hit different
    backend pathologies (see CLAUDE.md), so the formulation is tuned per
    ring size, statically."""
    # measured per-R defaults on v5e (see CLAUDE.md): the R=2 buffer's
    # standalone dynamic_update_slice cost 0.39 ms at B=12288 while its
    # predicated-select rewrite is ~30 us; select/flat regressed for every
    # other R (3: +0.5 ms, 24 flat write: +0.55, 24 flat read: +0.15)
    overrides = os.environ.get("BEATRICE_RING_MODES", "2:dus,select")
    for item in overrides.split(";"):
        if not item:
            continue
        key, _, modes = item.partition(":")
        if int(key) == r:
            parts = modes.split(",")
            return (parts[0], parts[-1]) if len(parts) > 1 else (
                parts[0], parts[0])
    return _ring_mode()


@functools.lru_cache(maxsize=1)
def _ring_min_r() -> int:
    """Rows below which the ring step falls back to the linear shift
    (A/B knob; 1 = always ring, measured best on v5e)."""
    return int(os.environ.get("BEATRICE_RING_MIN_R", "1"))


def clear_env_knob_caches():
    """Drop every lru-cached reader of a BEATRICE_* env knob so a
    mid-process knob flip takes effect.  A/B drivers MUST call this
    between configurations: the r3c ring_dus_select@20480 row silently
    re-measured the default because _ring_mode()/_ring_mode_for() were
    already populated by the preceding row in the same process (ADVICE
    r3, the same stale-cache class as the BEATRICE_MERGED_MEL_RING
    _stream_axes bug fixed in 1c4b542)."""
    _ring_layout.cache_clear()
    _ring_mode.cache_clear()
    _ring_mode_for.cache_clear()
    _ring_min_r.cache_clear()
    _chunk_conv_mode.cache_clear()
    from ..ops import frontend as _frontend

    _frontend._ring_slot_stride_env.cache_clear()
    try:  # engine-side env-dependent caches (import cycle-safe)
        from ..runtime import engine as _engine

        for name in ("_ring_layout_formats", "_stream_axes", "_jitted_reset"):
            fn = getattr(_engine, name, None)
            if hasattr(fn, "cache_clear"):
                fn.cache_clear()
    except ImportError:
        pass


@functools.lru_cache(maxsize=1)
def _chunk_conv_mode() -> str:
    """T>1 causal-conv formulation: 'conv' lowers to one
    lax.conv_general_dilated (no materialized tap slices -- the [B,T,C]
    tap copies at fine upsampler rates measured ~0.7 ms/tick at B=10240);
    'taps' keeps the explicit strided-slice + single-matmul form."""
    return os.environ.get("BEATRICE_CHUNK_CONV", "conv")


def causal_conv(params, x, state, dilation=1, compute_dtype=None,
                ring_pos=None):
    """Causal dilated conv over time.

    x: [B, T, Cin]; state: [B, (k-1)*dilation, Cin] (past inputs).
    Returns (y [B, T, Cout], new_state).

    Tap j reads input at time t - (k-1-j)*dilation; j == k-1 is "now".

    Two state conventions (R = (k-1)*d):

    * linear (ring_pos=None): [B, R, Cin], rows are the last R inputs in
      time order; each call shifts the whole window (the chunk/offline
      path, any T).
    * ring (ring_pos = scalar int frame index, T must be 1): row
      `n % R` holds input at time n; a step writes ONE row with a dynamic
      update (in-place under donation) and reads its k-1 taps by rotating
      index.  This removes the per-tick full-state concat + re-copy that
      dominated the serving tick.  Layout per BEATRICE_RING_LAYOUT
      (causal_conv_state): default ring-major [R, B, Cin] (contiguous
      leading-axis row ops); 'bmajor' keeps [B, R, Cin] with the per-R
      read/write mode table below.

    A zero state is valid under both conventions, so a stream can start in
    either mode from init_state; the two paths are numerically identical
    (same xt assembly, same single matmul).
    """
    w, b = params["w"], params["b"]
    k = w.shape[0]
    t = x.shape[-2]
    r_exp = (k - 1) * dilation
    if (ring_pos is not None and t == 1 and r_exp
            and _ring_layout() == "rmajor" and state.shape[0] == r_exp):
        # ring-major [R, *batch, C] layout (see causal_conv_state): row
        # reads/writes are leading-axis slices of contiguous [1, B, C]
        # blocks -- tile-aligned, in-place under donation.  The size-1
        # leading-axis moves below are pure reshapes.
        r = r_exp
        c = state.shape[-1]
        pos = jnp.asarray(ring_pos, jnp.int32)
        x_rb = x.reshape(1, *x.shape[:-2], c)  # [1, B, Cin] ring layout
        rows = [
            jax.lax.dynamic_slice_in_dim(
                state, jnp.mod(pos - (k - 1 - j) * dilation, r), 1, axis=0
            ).astype(x.dtype)
            for j in range(k - 1)
        ]
        # assemble and contract in the ring layout [1, B, k*Cin]: the lone
        # [1, B, Cout] -> [B, 1, Cout] move happens once on the small
        # OUTPUT instead of per tap row on the inputs
        xt = jnp.concatenate([*rows, x_rb.astype(x.dtype)], axis=-1)
        new_state = jax.lax.dynamic_update_slice_in_dim(
            state, x_rb.astype(state.dtype), jnp.mod(pos, r), axis=0,
        )
        wt = w.reshape(k * w.shape[1], w.shape[2])
        if compute_dtype is not None:
            xt = xt.astype(compute_dtype)
            wt = wt.astype(compute_dtype)
        y = jnp.dot(xt, wt, preferred_element_type=jnp.float32)
        y = (y + b.astype(y.dtype)).reshape(*x.shape[:-1], w.shape[2])
        if compute_dtype is not None:
            y = y.astype(compute_dtype)  # keep the residual stream narrow
        return y, new_state
    r = state.shape[-2]
    if ring_pos is not None and r and t == 1 and r >= _ring_min_r():
        pos = jnp.asarray(ring_pos, jnp.int32)
        rmode, wmode = _ring_mode_for(r)
        iota = jax.lax.iota(jnp.int32, r)  # [R]
        if rmode == "flat":
            # address the ring on the LANE axis: [B, R, C] viewed as
            # [B, R*C] (a bitcast), rows at offsets pos*C -- C is a
            # multiple of the 128-lane tile, so the dynamic slices stay
            # tile-aligned instead of shuffling sublanes
            c = state.shape[-1]
            flat = state.reshape(*state.shape[:-2], r * c)
            rows = [
                jax.lax.dynamic_slice_in_dim(
                    flat, jnp.mod(pos - (k - 1 - j) * dilation, r) * c, c,
                    axis=-1,
                ).astype(x.dtype)[..., None, :]
                for j in range(k - 1)
            ]
            xt = jnp.concatenate([*rows, x], axis=-1)  # [B, 1, k*Cin]
        elif rmode == "dus":
            rows = [
                jax.lax.dynamic_slice_in_dim(
                    state, jnp.mod(pos - (k - 1 - j) * dilation, r), 1, axis=-2
                ).astype(x.dtype)
                for j in range(k - 1)
            ]
            xt = jnp.concatenate([*rows, x], axis=-1)  # [B, 1, k*Cin]
        else:
            # one fused pass over the state: [k-1, R] one-hot contraction
            # (each output row sums exactly one nonzero product -- exact)
            sel = jnp.stack(
                [jnp.mod(pos - (k - 1 - j) * dilation, r) == iota
                 for j in range(k - 1)]
            )  # [k-1, R] one-hot rows
            taps = jnp.einsum(
                "jr,brc->bjc", sel.astype(x.dtype), state.astype(x.dtype),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
            xt = jnp.concatenate(
                [taps.reshape(*x.shape[:-2], 1, (k - 1) * state.shape[-1]), x],
                axis=-1,
            )  # [B, 1, k*Cin]
        if wmode == "dusb":
            # dus, but with the written row tied to the tap reads by an
            # optimization barrier: the scheduler then knows every read of
            # the old buffer precedes the write, enabling in-place update
            # of the donated buffer instead of a defensive whole-buffer copy
            xw = jax.lax.optimization_barrier((x, xt))[0]
            new_state = jax.lax.dynamic_update_slice_in_dim(
                state, xw.astype(state.dtype), jnp.mod(pos, r), axis=-2
            )
        elif wmode == "flat":
            c = state.shape[-1]
            flat = state.reshape(*state.shape[:-2], r * c)
            new_flat = jax.lax.dynamic_update_slice_in_dim(
                flat, x[..., 0, :].astype(state.dtype), jnp.mod(pos, r) * c,
                axis=-1,
            )
            new_state = new_flat.reshape(state.shape)
        elif wmode == "dus":
            new_state = jax.lax.dynamic_update_slice_in_dim(
                state, x.astype(state.dtype), jnp.mod(pos, r), axis=-2
            )
        else:
            # iota==pos predicated select: pure elementwise, fuses and
            # updates in place under donation
            new_state = jnp.where(
                (iota == jnp.mod(pos, r))[:, None],
                x.astype(state.dtype), state,
            )
    else:
        full = jnp.concatenate([state.astype(x.dtype), x], axis=-2)
        # state dtype is sticky: a bf16-initialized carry stays bf16,
        # halving the per-tick HBM traffic of the streaming state
        new_state = full[..., t:, :].astype(state.dtype) if r else state
        if t > 1 and _chunk_conv_mode() == "conv":
            lhs = full
            rhs = w  # [k, Cin, Cout] == WIO
            out_dt = jnp.float32
            if compute_dtype is not None:
                lhs = lhs.astype(compute_dtype)
                rhs = rhs.astype(compute_dtype)
                # emit the conv output in the compute dtype directly: the
                # MXU still accumulates f32 internally, but the backend
                # does NOT fuse a downstream convert into its conv
                # epilogue, so asking for f32 out materializes double-width
                # [B, T, C] buffers at the fine upsampler rates
                out_dt = compute_dtype
            bshape = lhs.shape[:-2]
            lhs = lhs.reshape(-1, *lhs.shape[-2:])
            y = jax.lax.conv_general_dilated(
                lhs, rhs.astype(lhs.dtype), window_strides=(1,),
                padding="VALID", rhs_dilation=(dilation,),
                dimension_numbers=("NWC", "WIO", "NWC"),
                preferred_element_type=out_dt,
            ).reshape(*bshape, t, w.shape[2])
            return y + b.astype(y.dtype), new_state
        taps = [full[..., j * dilation: j * dilation + t, :] for j in range(k)]
        xt = jnp.concatenate(taps, axis=-1)  # [B, T, k*Cin]
    wt = w.reshape(k * w.shape[1], w.shape[2])
    if compute_dtype is not None:
        xt = xt.astype(compute_dtype)
        wt = wt.astype(compute_dtype)
    y = jnp.dot(xt, wt, preferred_element_type=jnp.float32)
    y = y + b.astype(y.dtype)
    if compute_dtype is not None:
        y = y.astype(compute_dtype)
    return y, new_state


# ------------------------------------------------------- residual block --


def conv_block_init(key, dim, k=4, dilation=1, mlp_ratio=2, dtype=jnp.float32):
    """ConvNeXt-style causal block: dw-ish conv + gated MLP, pre-LN."""
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "ln": layer_norm_init(dim, dtype),
        "conv": causal_conv_init(k1, k, dim, dim, dilation, dtype),
        "mlp_in": linear_init(k2, dim, dim * mlp_ratio, dtype),
        "mlp_out": linear_init(k3, dim * mlp_ratio, dim, dtype),
    }


def conv_block_state(batch_shape, dim, k=4, dilation=1, dtype=jnp.float32,
                     ring=False):
    return causal_conv_state(batch_shape, k, dim, dilation, dtype, ring=ring)


def conv_block(params, x, state, dilation=1, compute_dtype=None,
               ring_pos=None):
    h = layer_norm(params["ln"], x)
    h, new_state = causal_conv(
        params["conv"], h, state, dilation, compute_dtype, ring_pos=ring_pos
    )
    h = jax.nn.gelu(h)
    h = linear(params["mlp_in"], h, compute_dtype)
    h = jax.nn.gelu(h)
    h = linear(params["mlp_out"], h, compute_dtype)
    return x + h.astype(x.dtype), new_state


# ------------------------------------------------------ cross attention --


def cross_attention_init(key, dim, kv_dim, attn_dim, dtype=jnp.float32):
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "ln": layer_norm_init(dim, dtype),
        "q": linear_init(kq, dim, attn_dim, dtype),
        "k": linear_init(kk, kv_dim, attn_dim, dtype),
        "v": linear_init(kv, kv_dim, attn_dim, dtype),
        "o": linear_init(ko, attn_dim, dim, dtype),
    }


def cross_attention_project_kv(params, kv, compute_dtype=None):
    """Precompute the K/V projections of a speaker KV bank.

    The bank only changes on speaker/morph control events, so projecting
    once per event instead of once per frame removes ~5/6 of the vocoder's
    per-frame FLOPs (the projections are 384x128x128 x2 per block vs a
    128-wide query path).  Returns (k [..., L, A], v [..., L, A]).
    """
    return (
        linear(params["k"], kv, compute_dtype),
        linear(params["v"], kv, compute_dtype),
    )


def cross_attention_cached(params, x, k, v, compute_dtype=None):
    """Cross-attention against precomputed K/V (see project_kv)."""
    h = layer_norm(params["ln"], x)
    q = linear(params["q"], h, compute_dtype)  # [B, T, A]
    a = q.shape[-1]
    if compute_dtype is not None:
        k = k.astype(compute_dtype)
        v = v.astype(compute_dtype)
    scores = jnp.einsum("bta,bla->btl", q, k.astype(q.dtype)) / math.sqrt(a)
    w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    o = jnp.einsum("btl,bla->bta", w, v.astype(q.dtype))
    o = linear(params["o"], o, compute_dtype)
    return x + o.astype(x.dtype)


def quantize_rows(x, axis: int = -1):
    """Symmetric int8 quantization with a per-row scale along `axis`.

    Returns (q int8, scale f32 with `axis` reduced to 1).  Used for the
    bandwidth-bound conditioning tensors (KV cache, VQ codebooks): the
    scale is folded outside the contraction at use time, so consumers read
    int8 bytes and never materialize a dequantized copy.
    """
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale


def cross_attention_cached_q(params, x, k_q, k_scale, v_q, v_scale,
                             compute_dtype=None):
    """cross_attention_cached with int8 K/V + per-row scales.

    scores_l = scale_l * (q . K_q[l]); out_a = sum_l (w_l * scale_l) V_q[l,a]
    -- the per-row scales commute with the contractions, so the int8
    tensors feed the dots directly (half the HBM bytes of bf16)."""
    h = layer_norm(params["ln"], x)
    q = linear(params["q"], h, compute_dtype)  # [B, T, A]
    a = q.shape[-1]
    kq = k_q.astype(q.dtype)
    scores = jnp.einsum("bta,bla->btl", q, kq) / math.sqrt(a)
    scores = scores * k_scale[..., 0][:, None, :]  # [B, 1->T, L]
    w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    wv = (w * v_scale[..., 0][:, None, :]).astype(q.dtype)
    o = jnp.einsum("btl,bla->bta", wv, v_q.astype(q.dtype))
    o = linear(params["o"], o, compute_dtype)
    return x + o.astype(x.dtype)


def cross_attention_slots(params, x, k_z, v_z, onehot, compute_dtype=None):
    """Cross-attention against a *shared slot bank* of precomputed K/V.

    x: [B, T, H]; k_z/v_z: [Z, L, A] (Z = n_base_speakers + n_morph_slots);
    onehot: [B, Z] selecting each stream's slot.

    Exact same math as cross_attention_cached with per-stream K/V gathered
    from the slot bank, but expressed as one-hot contractions so the HBM
    traffic is O(B*Z*A) instead of O(B*L*A): at serving batch the
    per-stream K/V cache reads (2 x [B, nb, L, A]) dominate the tick, while
    the [B, Z, A] masked intermediates here are ~L/Z times smaller
    (L=384, Z~32).  FLOPs grow with Z (B*Z*L*A per contraction), which is
    MXU-cheap while Z stays small -- the engine bounds Z via
    EngineConfig.n_morph_slots.
    """
    h = layer_norm(params["ln"], x)
    q = linear(params["q"], h, compute_dtype)  # [B, T, A]
    a = q.shape[-1]
    if compute_dtype is not None:
        k_z = k_z.astype(compute_dtype)
        v_z = v_z.astype(compute_dtype)
    oh = onehot.astype(q.dtype)
    mq = oh[:, None, :, None] * q[:, :, None, :]  # [B, T, Z, A]
    scores = jnp.einsum("btza,zla->btl", mq, k_z.astype(q.dtype),
                        preferred_element_type=jnp.float32) / math.sqrt(a)
    w = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    tmp = jnp.einsum("btl,zla->btza", w, v_z.astype(q.dtype),
                     preferred_element_type=jnp.float32)  # [B, T, Z, A]
    o = jnp.einsum("btza,bz->bta", tmp.astype(q.dtype), oh,
                   preferred_element_type=jnp.float32)
    o = linear(params["o"], o.astype(q.dtype), compute_dtype)
    return x + o.astype(x.dtype)


def cross_attention_slots_q8(params, x, k_q, k_scale, v_q, v_scale, onehot,
                             compute_dtype=None):
    """cross_attention_slots with an int8 slot bank AND int8 contractions.

    k_q/v_q: [Z, L, A] int8; k_scale/v_scale: [Z, L, 1] f32 per-row scales;
    onehot: [B, Z].  Beyond halving the bank bytes, the two big
    contractions (B*Z*L*A MACs each -- the flop-bound part of the slot
    attention, ~0.65 ms/tick at B=12288, Z=32 in bf16) run as
    int8 x int8 -> int32 dots, which the MXU executes at 2x the bf16 rate.
    The one-hot mask multiplies stay exact in int8 (0/1 factors); the
    query and the softmax-weight rows are quantized with per-row scales
    folded back outside the dots, bounding the deviation to the same
    order as the engine's existing int8 conditioning (~0.5% per row).
    """
    h = layer_norm(params["ln"], x)
    q = linear(params["q"], h, compute_dtype)  # [B, T, A]
    a = q.shape[-1]
    q32 = q.astype(jnp.float32)
    qs = jnp.maximum(jnp.max(jnp.abs(q32), axis=-1, keepdims=True), 1e-8) / 127.0
    q8 = jnp.clip(jnp.round(q32 / qs), -127, 127).astype(jnp.int8)
    oh8 = onehot.astype(jnp.int8)
    mq8 = oh8[:, None, :, None] * q8[:, :, None, :]  # [B, T, Z, A] int8
    si = jnp.einsum("btza,zla->btl", mq8, k_q,
                    preferred_element_type=jnp.int32)
    ks_sel = jnp.einsum("bz,zl->bl", onehot, k_scale[..., 0],
                        preferred_element_type=jnp.float32)  # [B, L]
    scores = si.astype(jnp.float32) * (qs * ks_sel[:, None, :]) / math.sqrt(a)
    w = jax.nn.softmax(scores, axis=-1)  # [B, T, L] f32
    vs_sel = jnp.einsum("bz,zl->bl", onehot, v_scale[..., 0],
                        preferred_element_type=jnp.float32)
    wv = w * vs_sel[:, None, :]
    ws = jnp.maximum(jnp.max(jnp.abs(wv), axis=-1, keepdims=True), 1e-12) / 127.0
    wv8 = jnp.clip(jnp.round(wv / ws), -127, 127).astype(jnp.int8)
    tv = jnp.einsum("btl,zla->btza", wv8, v_q,
                    preferred_element_type=jnp.int32)  # [B, T, Z, A]
    o = jnp.einsum("btza,bz->bta", tv.astype(jnp.float32), onehot,
                   preferred_element_type=jnp.float32) * ws
    if compute_dtype is not None:
        o = o.astype(compute_dtype)
    o = linear(params["o"], o, compute_dtype)
    return x + o.astype(x.dtype)


def cross_attention(params, x, kv, compute_dtype=None):
    """Per-frame cross-attention to a per-stream speaker KV bank.

    x: [B, T, H]; kv: [B, L, Ckv] (the 384x128 speaker embedding of
    beatrice.h:26-27,333-343).  Queries come from the frame stream, keys and
    values from the speaker bank -- a [B,T,A]x[B,A,L] batched matmul that
    rides the MXU when B*T is large.
    """
    h = layer_norm(params["ln"], x)
    q = linear(params["q"], h, compute_dtype)  # [B, T, A]
    k = linear(params["k"], kv, compute_dtype)  # [B, L, A]
    v = linear(params["v"], kv, compute_dtype)  # [B, L, A]
    a = q.shape[-1]
    scores = jnp.einsum("bta,bla->btl", q, k) / math.sqrt(a)
    w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    o = jnp.einsum("btl,bla->bta", w, v)
    o = linear(params["o"], o, compute_dtype)
    return x + o.astype(x.dtype)


# ----------------------------------------------------------------- snake --


def snake_init(dim, alpha=1.0, dtype=jnp.float32):
    return {"log_alpha": jnp.full((dim,), math.log(alpha), dtype)}


def snake(params, x):
    """Periodic "snake" activation, polynomial form: x + Q(a*x)/a.

    Q is a pi-periodic C^1 bump matching sin^2's shape (zero and flat at
    multiples of pi, peak 1 at the midpoints): with u = frac(y/pi),
    Q(y) = 16*(u*(1-u))^2.  Same inductive bias as the classic
    x + sin^2(ax)/a, but ~8 cheap VPU ops instead of a ~19-cycle `sin` per
    element -- the snake was the single largest tick component at serving
    batch (1.2 ms of a 9.4 ms tick at 6144 streams on v5e; the upsampler
    pushes ~8k activations/stream/frame through it).  The NumPy oracle
    (reference_impl.snake) defines the same polynomial, so this *is* the
    model's spec, not an approximation of one.
    """
    a = jnp.exp(params["log_alpha"].astype(jnp.float32))
    x32 = x.astype(jnp.float32)
    y = x32 * (a / math.pi)
    u = y - jnp.floor(y)
    q = u * (1.0 - u)
    return (x32 + (16.0 / (a + 1e-9)) * (q * q)).astype(x.dtype)


# ------------------------------------------------------ deterministic rng --


def hash_noise(counter, n, salt: int):
    """Deterministic per-stream uniform noise in [-1, 1): [B, n].

    splitmix32-style integer hash of (stream counter, sample index, salt);
    fully vectorized, reproducible in NumPy for parity tests, and far
    cheaper per frame than threefry key derivation.
    """
    idx = counter[..., None].astype(jnp.uint32) * jnp.uint32(0x9E3779B9) + (
        jnp.arange(n, dtype=jnp.uint32) + jnp.uint32(salt)
    ) * jnp.uint32(0x85EBCA6B)
    z = idx
    z = (z ^ (z >> 16)) * jnp.uint32(0x7FEB352D)
    z = (z ^ (z >> 15)) * jnp.uint32(0x846CA68B)
    z = z ^ (z >> 16)
    return z.astype(jnp.float32) * (2.0 / 4294967296.0) - 1.0
