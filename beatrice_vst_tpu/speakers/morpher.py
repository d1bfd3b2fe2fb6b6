"""Batched speaker morphing: spherical-average embeddings + codebook lottery.

The reference time-slices morphing to fit the CPU frame budget
(`/root/reference/src/common/processor_core_2.cc:50-181`): the additive
embedding morphs in 1 frame, KV rows spread over 4 frames (96 rows/frame,
<=4 L-BFGS updates each), and the VQ codebook is never averaged at all --
each frame picks ONE speaker's codebook by weighted random lottery
(processor_core_2.cc:93-121).

On TPU the economics invert: a full batched spherical average over the
top-8 morph speakers for *all* streams is a few fused matmuls, so morphed
embeddings are recomputed event-style whenever morph controls change
(`update_morphed_embeddings`), not amortized across frames.  The per-frame
residue is just the codebook lottery (kept, because averaging codebooks is
semantically wrong -- entries are discrete phone prototypes) -- a cumsum +
compare over [B, 8].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import SPH_AVG_MAX_N_SPEAKERS, SPH_AVG_MAX_N_UPDATES
from ..ops.morph import prepare_voice_morph_weights, prune_top_k
from ..ops.spherical_average import spherical_average
from ..models.layers import hash_noise

LOTTERY_SALT = 0x10777E


def pruned_morph_weights(dense_weights, n_speakers):
    """PrepareVoiceMorphWeights + top-8 argsort pruning
    (voice_morph_state.h:87-104, processor_core_2.cc:507-532).

    dense_weights: [B, S]; n_speakers: [B] int.
    Returns (pruned [B, S], top_idx [B, 8] most-weighted-first).
    """
    w = prepare_voice_morph_weights(dense_weights, n_speakers)
    return prune_top_k(w, SPH_AVG_MAX_N_SPEAKERS)


def update_morphed_embeddings(bank, pruned_weights, top_idx,
                              n_iters: int = SPH_AVG_MAX_N_UPDATES):
    """Spherical-average the top-8 speakers' embeddings per stream.

    bank: speaker bank dict (speakers/bank.py); pruned_weights: [B, S];
    top_idx: [B, 8].  Returns dict with 'additive' [B, 256] and, if the
    bank has KV, 'kv' [B, 384, 128].
    """
    w8 = jnp.take_along_axis(pruned_weights, top_idx, axis=-1).astype(jnp.float32)
    # solve in f32 regardless of bank storage dtype: the L-BFGS iteration is
    # precision-sensitive (bf16 eps would break the convergence tests)
    additive_pts = bank["additive"][top_idx].astype(jnp.float32)  # [B, 8, 256]
    out = {"additive": spherical_average(additive_pts, w8, n_iters=n_iters)}
    if "kv" in bank:
        kv_pts = bank["kv"][top_idx].astype(jnp.float32)  # [B, 8, L, C]
        kv_pts = jnp.swapaxes(kv_pts, 1, 2)  # [B, L, 8, C]
        w_rows = jnp.broadcast_to(w8[:, None, :], kv_pts.shape[:-1])
        out["kv"] = spherical_average(kv_pts, w_rows, n_iters=n_iters)
    return out


def codebook_lottery(pruned_weights, top_idx, n_speakers, frame_counter,
                     w8=None):
    """Per-frame weighted random codebook selection
    (processor_core_2.cc:93-121): returns a speaker index [B] (or [B, T]).

    pruned_weights: [B, S]; top_idx: [B, 8]; n_speakers: [B] int;
    frame_counter: [B] or [B, T] uint32 absolute frame index (drives the
    deterministic per-stream RNG -- the reference uses a per-core mt19937).

    w8 (optional [B, 8]): pruned_weights at top_idx, precomputed.  The
    weights only change on morph control events, so the serving engine
    caches w8 in state (refresh_morphed) -- re-deriving it per tick cost
    0.25 ms at B=10240 even as a one-hot contraction (take_along_axis was
    0.5 ms at 6144, the documented TPU gather cliff).
    """
    if w8 is None:
        s = pruned_weights.shape[-1]
        oh8 = jax.nn.one_hot(top_idx, s, dtype=pruned_weights.dtype)
        w8 = jnp.einsum("bks,bs->bk", oh8, pruned_weights)  # == take_along
    total = jnp.sum(w8, axis=-1)  # [B]
    u = (hash_noise(frame_counter, 1, LOTTERY_SALT)[..., 0] + 1.0) * 0.5  # [B(,T)] in [0,1)
    if frame_counter.ndim > 1:
        w8 = w8[:, None, :]
        top = top_idx[:, None, :]
        total_b = total[:, None]
        n_b = n_speakers[:, None]
    else:
        top = top_idx
        total_b = total
        n_b = n_speakers
    cum = jnp.cumsum(w8, axis=-1)
    draw = u * total_b
    pick = jnp.argmax(cum > draw[..., None], axis=-1)  # first bucket past draw
    pick_oh = jax.nn.one_hot(pick, top.shape[-1], dtype=jnp.int32)
    chosen = jnp.sum(pick_oh * top, axis=-1)  # == take_along_axis(top, pick)
    # degenerate (all weights ~0): uniform over the real speakers
    uniform = jnp.floor(u * n_b.astype(u.dtype)).astype(chosen.dtype)
    uniform = jnp.clip(uniform, 0, jnp.maximum(n_b - 1, 0))
    eps = jnp.finfo(jnp.float32).eps
    return jnp.where(total_b <= eps, uniform, chosen)


def select_conditioning(bank, target_speaker, morphed, formant_index,
                        frame_counter=None, pruned_weights=None, top_idx=None,
                        include_kv=True, w8=None):
    """Resolve per-stream speaker conditioning, mirroring
    SetTargetSpeaker / the morph branch of Process1
    (processor_core_2.cc:431-466, 50-181).

    target_speaker: [B] int; the value n_speakers means "morph mode"
    (parameter_schema.cc:174-181's Voice Morphing Mode entry).
    morphed: dict from update_morphed_embeddings (per-stream state).
    formant_index: [B] int in [0, 9).

    Returns (additive+formant [B, 256], kv [B, L, C] | None,
             codebook_speaker_idx [B(,T)] | None).
    """
    n = bank["additive"].shape[0]
    is_morph = target_speaker >= n
    direct = jnp.clip(target_speaker, 0, n - 1)
    # per-tick [B]-row gathers hit the documented TPU gather cliff; the
    # tables are tiny (<=256 rows), so one-hot matmuls are exact (each
    # output row sums exactly one nonzero product) and ride the MXU
    oh = jax.nn.one_hot(direct, n, dtype=bank["additive"].dtype)  # [B, S]
    direct_add = jnp.einsum("bs,sc->bc", oh, bank["additive"],
                            preferred_element_type=jnp.float32)
    additive = jnp.where(
        is_morph[:, None], morphed["additive"].astype(jnp.float32), direct_add
    )
    oh_f = jax.nn.one_hot(jnp.clip(formant_index, 0, 8), 9,
                          dtype=bank["formant"].dtype)  # [B, 9]
    # stays f32 like the gather formulation (where() promoted against the
    # f32 morphed row); the chain casts to compute dtype at its inputs
    additive = additive + jnp.einsum("bf,fc->bc", oh_f, bank["formant"],
                                     preferred_element_type=jnp.float32)
    kv = None
    if "kv" in bank and include_kv:
        kv = jnp.where(
            is_morph[:, None, None], morphed["kv"], bank["kv"][direct]
        )
    cb_idx = None
    if "codebook" in bank:
        if frame_counter is None:
            cb_idx = direct
        else:
            n_spk = jnp.full_like(target_speaker, n)
            lottery = codebook_lottery(pruned_weights, top_idx, n_spk,
                                       frame_counter, w8=w8)
            if frame_counter.ndim > 1:
                direct_b = direct[:, None]
                is_morph_b = is_morph[:, None]
            else:
                direct_b, is_morph_b = direct, is_morph
            cb_idx = jnp.where(is_morph_b, lottery, direct_b)
    return additive, kv, cb_idx
