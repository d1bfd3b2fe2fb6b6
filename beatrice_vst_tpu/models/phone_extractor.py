"""PhoneExtractor: streaming content encoder (raw frames -> phone features).

TPU-native replacement for the closed `Beatrice*_ExtractPhone1`
(`/root/reference/lib/beatricelib/beatrice.h:65-69,243-247`): consumes 160
raw samples per 10 ms frame, emits a `phone_channels`-dim content vector
(256-d for 20a2/20b1, 128-d for 20rc0), with persistent streaming context.

Design (original, TPU-first): log-mel front end computed as matmul-DFT
(ops/frontend.py), then a stack of causal dilated ConvNeXt-style blocks.
All state is explicit: raw-sample history for the framer plus per-block
conv history, shaped [B, ...] so thousands of streams batch into single
matmuls.

The 20rc0 VQ codebook + k-NN phone smoothing (beatrice.h:239-247,318-322)
lives here too: the reference attaches the codebook to the phone context
(`Beatrice20rc0_SetCodebook`), and `ExtractPhone1` returns the smoothed
phone.  We take the per-stream codebook as a conditioning input instead of
hidden context state -- same contract, but batched and swappable by a
single gather when the target speaker changes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..constants import VersionSpec
from ..ops.frontend import MelFrontend
from . import layers


@dataclasses.dataclass(frozen=True)
class PhoneExtractorConfig:
    phone_channels: int
    n_mels: int = 80
    win: int = 512
    hidden: int = 256
    kernel: int = 4
    dilations: tuple = (1, 2, 4, 8, 1, 2)
    mlp_ratio: int = 2

    @classmethod
    def for_version(cls, spec: VersionSpec) -> "PhoneExtractorConfig":
        return cls(phone_channels=spec.phone_channels)

    @property
    def frontend(self) -> MelFrontend:
        return MelFrontend(win=self.win, n_mels=self.n_mels)


def init(key, cfg: PhoneExtractorConfig, dtype=jnp.float32):
    keys = jax.random.split(key, len(cfg.dilations) + 2)
    return {
        "prenet": layers.linear_init(keys[0], cfg.n_mels, cfg.hidden, dtype),
        "blocks": [
            layers.conv_block_init(
                keys[i + 1], cfg.hidden, cfg.kernel, d, cfg.mlp_ratio, dtype
            )
            for i, d in enumerate(cfg.dilations)
        ],
        "out_ln": layers.layer_norm_init(cfg.hidden, dtype),
        "out": layers.linear_init(keys[-1], cfg.hidden, cfg.phone_channels, dtype),
    }


def init_state(cfg: PhoneExtractorConfig, batch_shape=(), dtype=jnp.float32,
               ring=False):
    fe = cfg.frontend
    return {
        "audio": (fe.ring_state(batch_shape, dtype) if ring else
                  jnp.zeros((*batch_shape, fe.history), dtype)),
        "blocks": [
            layers.conv_block_state(batch_shape, cfg.hidden, cfg.kernel, d,
                                    dtype, ring=ring)
            for d in cfg.dilations
        ],
    }


def apply(params, cfg: PhoneExtractorConfig, audio, state, compute_dtype=None,
          t_index=None, shared_ring=None, mel=None):
    """audio: [B, T*160] raw 16 kHz samples -> phone [B, T, phone_channels].

    Returns (phone, new_state).  T=1 gives the per-frame streaming step;
    larger T is the offline/chunked path -- identical code, identical
    numerics (tested in tests/test_models.py).  t_index (scalar absolute
    frame index, T=1 only) selects the ring-buffer conv-state convention
    (layers.causal_conv) used by the serving engine.
    """
    fe = cfg.frontend
    if mel is not None:
        # precomputed by the chain's fused dual-frontend read
        # (ops/frontend.py dual_mel_read_ring)
        new_audio_hist = None
    elif shared_ring is not None and t_index is not None:
        # merged audio ring (chain-owned, already written this frame):
        # read-only -- halves the per-tick ring DUS traffic vs dedicated
        # phone+pitch rings (docs/ROOFLINE.md "named remaining fat" #2)
        mel = fe.mel_read_ring(shared_ring, t_index)
        new_audio_hist = None
    elif t_index is not None and state["audio"].shape[-1] == fe.ring_len:
        mel, new_audio_hist = fe.mel_from_ring(state["audio"], audio, t_index)
    else:
        windows, new_audio_hist = fe.frames_from_chunk(state["audio"], audio)
        mel = fe(windows)  # [B, T, n_mels]
    h = layers.linear(params["prenet"], mel, compute_dtype)
    new_block_states = []
    for p, s, d in zip(params["blocks"], state["blocks"], cfg.dilations):
        h, ns = layers.conv_block(p, h, s, d, compute_dtype, ring_pos=t_index)
        new_block_states.append(ns)
    h = layers.layer_norm(params["out_ln"], h)
    phone = layers.linear(params["out"], h, compute_dtype)
    new_state = {"blocks": new_block_states}
    if new_audio_hist is not None:
        new_state["audio"] = new_audio_hist
    return phone, new_state


def vq_knn_smooth(phone, codebook, num_neighbors, max_neighbors: int = 8,
                  codebook_scale=None):
    """k-NN phone smoothing against a per-stream VQ codebook.

    phone: [B, T, C]; codebook: [B, K, C]; num_neighbors: [B] int in
    [0, max_neighbors], 0 = passthrough (beatrice.h:239-242).

    Replaces the phone vector with the mean of its n nearest codebook
    entries -- the 20rc0 "VQ num neighbors" control.  Distances are one
    batched matmul [B,T,C] x [B,C,K]; top-k is static at max_neighbors with
    a mask for per-stream n, so the whole batch shares one program.
    """
    # accumulate in f32 but keep inputs in their storage dtype (bf16/int8
    # banks halve/quarter the dominant [B, K, C] read traffic); per-row
    # int8 scales commute with the contractions, so they apply afterwards
    k_entries = codebook.shape[-2]
    if codebook.dtype == jnp.int8:
        cb = codebook.astype(jnp.bfloat16)
        query = phone.astype(jnp.bfloat16)
    else:
        cb = codebook
        query = phone.astype(codebook.dtype)
    c2 = jnp.einsum("bkc,bkc->bk", cb, cb,
                    preferred_element_type=jnp.float32)  # [B, K]
    pc = jnp.einsum("btc,bkc->btk", query, cb,
                    preferred_element_type=jnp.float32)
    if codebook_scale is not None:
        s = codebook_scale[..., 0]  # [B, K]
        c2 = c2 * (s * s)
        pc = pc * s[:, None, :]
    dist = c2[:, None, :] - 2.0 * pc  # ||p||^2 constant per query: omit
    # top-n selection as iterated argmax + one-hot accumulation: on TPU
    # this is ~8x faster than lax.top_k's sort and feeds a matmul mean
    # instead of a take_along gather (another ~5x) -- same exact result.
    neg = -dist
    onehot_sum = jnp.zeros_like(dist)
    n = num_neighbors[:, None, None].astype(jnp.int32)
    for rank in range(max_neighbors):
        i = jnp.argmax(neg, axis=-1)  # [B, T]
        oh = jax.nn.one_hot(i, k_entries, dtype=dist.dtype)
        neg = jnp.where(oh > 0, -jnp.inf, neg)  # (not -= inf*oh: 0*inf=NaN)
        onehot_sum = onehot_sum + jnp.where(rank < n, oh, 0.0)
    denom = jnp.maximum(n.astype(jnp.float32), 1.0)
    weights = onehot_sum
    if codebook_scale is not None:
        weights = weights * codebook_scale[..., 0][:, None, :]
    smoothed = jnp.einsum(
        "btk,bkc->btc", weights.astype(cb.dtype), cb,
        preferred_element_type=jnp.float32,
    ) / denom
    out = jnp.where(n > 0, smoothed, phone.astype(jnp.float32))
    return out.astype(phone.dtype)


def vq_knn_smooth_bank(phone, bank_codebooks, codebook_idx, num_neighbors,
                       max_neighbors: int = 8):
    """k-NN phone smoothing against a *shared* codebook bank.

    phone: [B, T, C]; bank_codebooks: [S, K, C] (the whole model's
    codebooks); codebook_idx: [B] int speaker selection; num_neighbors:
    [B] int, 0 = passthrough.

    Equivalent to gathering each stream's [K, C] codebook and calling
    vq_knn_smooth, but never materializes the [B, K, C] per-stream copy:
    distances come from ONE [B, C] x [C, S*K] matmul against the bank
    (read once, ~2 MB, vs a [B, K, C] gather costing K*C bytes *per
    stream*), and the per-stream block is selected by index arithmetic.
    Used by the engine when S*K stays small enough that the [B, S*K]
    logits are cheaper than the gather (runtime/engine.py).
    """
    s, k_entries, c = bank_codebooks.shape
    b, t = phone.shape[:2]
    flat = bank_codebooks.reshape(s * k_entries, c)
    c2_flat = jnp.einsum("kc,kc->k", flat, flat,
                         preferred_element_type=jnp.float32)  # [S*K]
    pc_all = jnp.einsum("btc,kc->btk", phone.astype(flat.dtype), flat,
                        preferred_element_type=jnp.float32)  # [B, T, S*K]
    offsets = codebook_idx.astype(jnp.int32) * k_entries  # [B]
    sel = offsets[:, None] + jnp.arange(k_entries)  # [B, K]
    c2 = c2_flat[sel]  # [B, K]
    pc = jnp.take_along_axis(pc_all, sel[:, None, :], axis=-1)  # [B, T, K]
    dist = c2[:, None, :] - 2.0 * pc
    neg = -dist
    n = num_neighbors[:, None, None].astype(jnp.int32)
    acc = jnp.zeros((b, t, c), jnp.float32)
    for rank in range(max_neighbors):
        i = jnp.argmax(neg, axis=-1)  # [B, T] in-block index
        oh = jax.nn.one_hot(i, k_entries, dtype=dist.dtype)
        neg = jnp.where(oh > 0, -jnp.inf, neg)
        rows = flat[offsets[:, None] + i].astype(jnp.float32)  # [B, T, C]
        acc = acc + jnp.where(rank < n, rows, 0.0)
    denom = jnp.maximum(n.astype(jnp.float32), 1.0)
    out = jnp.where(n > 0, acc / denom, phone.astype(jnp.float32))
    return out.astype(phone.dtype)


def vq_knn_smooth_shared(phone, bank_codebooks, codebook_idx, num_neighbors,
                         max_neighbors: int = 8, codebook_scale=None,
                         int8_query: bool = False):
    """Gather-free k-NN phone smoothing against the *shared* codebook bank.

    phone: [B, T, C]; bank_codebooks: [S, K, C] (whole-model bank, bf16 or
    int8 with per-row `codebook_scale` [S, K, 1]); codebook_idx: [B] int;
    num_neighbors: [B] int, 0 = passthrough.

    Exact-equivalent to gathering each stream's [K, C] codebook and calling
    vq_knn_smooth, but expressed purely as one-hot contractions so nothing
    per-stream of size K*C ever touches HBM:

      pc[b,k]  = phone[b]·CB[s_b,k]  ==  einsum('bsc,skc->bk',
                   onehot[b,s]*phone[b,c], CB)       (no [B,K,C] gather)
      out[b,c] = mean of selected rows ==  einsum('bsk,skc->bc',
                   onehot[b,s]*weights[b,k], CB)

    Why this beats both alternatives measured earlier on v5e: the naive
    gather path materializes/re-reads [B, K, C] (hundreds of MB per tick at
    serving batch), and the earlier bank variant (vq_knn_smooth_bank) used
    take_along_axis + per-rank row gathers -- the documented Mosaic 2-D
    advanced-indexing cliff.  Here the bank is read O(S*K*C) bytes total
    (~1 MB int8) and every step is a matmul or a [B, K] elementwise op.
    FLOPs grow with S (B*S*K*C per contraction), so the engine picks this
    path only while S*K*C stays MXU-cheap (runtime/engine.py).
    """
    s, k_entries, c = bank_codebooks.shape
    b, t = phone.shape[:2]
    if bank_codebooks.dtype == jnp.int8:
        cb = bank_codebooks.astype(jnp.bfloat16)  # [S,K,C]: ~2 MB, cheap
        query = phone.astype(jnp.bfloat16)
    else:
        cb = bank_codebooks
        query = phone.astype(bank_codebooks.dtype)
    onehot = jax.nn.one_hot(codebook_idx, s, dtype=query.dtype)  # [B, S]

    if codebook_scale is not None:
        sc = codebook_scale[..., 0]  # [S, K]
        sc_b = jnp.einsum("bs,sk->bk", onehot.astype(jnp.float32), sc)  # [B, K]

    if int8_query and bank_codebooks.dtype == jnp.int8:
        # int8 MXU distances: quantize the query per stream row (the
        # selection is a ranking, so the ~0.4% per-row quantization only
        # matters at exact ties); ||entry||^2 comes out EXACT from the
        # int32 dot (|entries| <= 127, C*127^2 << 2^31), better than the
        # bf16 cast it replaces.  Halves the B*S*K*C distance flops.
        q32 = phone[:, 0, :].astype(jnp.float32)
        qs = jnp.maximum(jnp.max(jnp.abs(q32), axis=-1, keepdims=True),
                         1e-8) / 127.0
        q8 = jnp.clip(jnp.round(q32 / qs), -127, 127).astype(jnp.int8)
        oh8 = onehot.astype(jnp.int8)
        masked8 = oh8[:, :, None] * q8[:, None, :]  # [B, S, C] int8
        pci = jnp.einsum("bsc,skc->bk", masked8, bank_codebooks,
                         preferred_element_type=jnp.int32)
        c2i = jnp.einsum("skc,skc->sk", bank_codebooks, bank_codebooks,
                         preferred_element_type=jnp.int32)
        c2_all = c2i.astype(jnp.float32) * (sc * sc)
        c2 = jnp.einsum("bs,sk->bk", onehot.astype(jnp.float32), c2_all)
        pc = pci.astype(jnp.float32) * qs * sc_b
    else:
        c2_all = jnp.einsum("skc,skc->sk", cb, cb,
                            preferred_element_type=jnp.float32)  # [S, K]
        if codebook_scale is not None:
            c2_all = c2_all * (sc * sc)
        c2 = jnp.einsum("bs,sk->bk", onehot.astype(jnp.float32), c2_all)

        # phone masked per speaker slot -> distances in one contraction
        masked = onehot[:, :, None] * query[:, 0, :][:, None, :]  # [B, S, C]
        pc = jnp.einsum("bsc,skc->bk", masked, cb,
                        preferred_element_type=jnp.float32)  # [B, K]
        if codebook_scale is not None:
            pc = pc * sc_b
    dist = c2 - 2.0 * pc  # [B, K]

    neg = -dist
    onehot_sum = jnp.zeros_like(dist)
    n = num_neighbors[:, None].astype(jnp.int32)  # [B, 1]
    for rank in range(max_neighbors):
        i = jnp.argmax(neg, axis=-1)  # [B]
        oh = jax.nn.one_hot(i, k_entries, dtype=dist.dtype)
        neg = jnp.where(oh > 0, -jnp.inf, neg)
        onehot_sum = onehot_sum + jnp.where(rank < n, oh, 0.0)
    denom = jnp.maximum(n.astype(jnp.float32), 1.0)
    weights = onehot_sum
    if codebook_scale is not None:
        weights = weights * sc_b
    w_by_spk = onehot[:, :, None] * weights[:, None, :].astype(onehot.dtype)
    smoothed = jnp.einsum("bsk,skc->bc", w_by_spk, cb,
                          preferred_element_type=jnp.float32) / denom
    out = jnp.where(n > 0, smoothed, phone[:, 0, :].astype(jnp.float32))
    return out[:, None, :].astype(phone.dtype)


def receptive_field_frames(cfg: PhoneExtractorConfig) -> int:
    return sum((cfg.kernel - 1) * d for d in cfg.dilations) + 1
