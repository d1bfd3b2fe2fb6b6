"""Weighted spherical averages (Buss-Fillmore), batched for TPU.

The reference computes spherical (slerp-like) weighted means of speaker
embedding vectors with an L-BFGS(memory=2) iteration on the unit sphere
(`/root/reference/src/common/spherical_average.h:81-444`), time-sliced over
frames to fit a CPU budget.  On TPU we run the same algorithm with a fixed
iteration count as a fully batched computation: `vmap` over KV rows and over
streams turns the per-vector solve into a handful of [R, N, M]-shaped
matmuls/reductions, so a whole 384-row KV morph for a batch of streams is a
single fused XLA computation instead of 4 frames of amortized scalar work.

Algorithm (reimplemented from the reference's math):
  - normalize the N input points p (rows of the speaker bank)
  - q0 = normalize(sum_n w_n p_n)
  - iterate: compute per-point angles theta_n = angle(p_n, q);
    v_n = w_n / sinc(theta_n) (normalized by sum w_n cos(theta_n)/sinc);
    Riemannian gradient g = proj_q(-2 sum_n w_n/sinc(theta_n) p_n);
    two-loop L-BFGS(K=2) recursion for the step d; q <- normalize(q - d)
  - result = sum_n v_n p_raw_n  (re-projected to unnormalized space,
    spherical_average.h:237-244)

Fixed-iteration (default 4 == kSphAvgMaxNUpdates, processor_core_2.h:90-91)
keeps the computation jittable; converged lanes freeze via masking, which is
numerically identical to the reference's early exit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..constants import SPH_AVG_MAX_N_UPDATES

_K = 2  # L-BFGS memory (reference default num_memory=2)


def _sinc(x):
    """Stable sin(x)/x (spherical_average.h:313-332 uses a Taylor guard)."""
    return jnp.sinc(x / jnp.pi)


def _normalize(x, axis=-1):
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return jnp.where(norm > 0.0, x / jnp.maximum(norm, 1e-30), x), norm[..., 0]


def _compute_vgd(p_norm, w, q, s, t, r, gamma, mem_idx):
    """One UpdateVGD pass (spherical_average.h:340-379): returns (v, g, d).

    p_norm: [N, M] normalized points; w: [N] normalized weights; q: [M];
    s, t: [K, M]; r: [K]; gamma scalar; mem_idx int32.
    """
    eps = jnp.finfo(q.dtype).eps
    cos = jnp.clip(p_norm @ q, -1.0, 1.0)  # [N]
    theta = jnp.arccos(cos)
    inv_sinc = 1.0 / (_sinc(theta) + eps)
    v_un = w * inv_sinc  # unscaled v
    sum_wcs = jnp.sum(w * cos * inv_sinc)
    v = v_un / (sum_wcs + eps)
    g = (-2.0 * v_un) @ p_norm  # [M]
    g = g - (q @ g) * q  # project to tangent plane at q
    # Two-loop L-BFGS recursion (history length K=2, ring buffer).
    d = g
    a = jnp.zeros(_K, dtype=q.dtype)
    for k in range(_K):
        idx = (mem_idx - k - 1 + _K) % _K
        a_idx = r[idx] * (s[idx] @ d)
        d = d - a_idx * t[idx]
        a = a.at[idx].set(a_idx)
    d = gamma * d
    for k in range(_K):
        idx = (mem_idx + k) % _K
        b = r[idx] * (t[idx] @ d)
        d = d + (a[idx] - b) * s[idx]
    return v, g, d


def _single_spherical_average(p_raw, w, n_iters):
    """Spherical average of N unnormalized vectors with weights w.

    p_raw: [N, M]; w: [N] nonnegative (zeros = excluded points).
    Returns [M].
    """
    dtype = p_raw.dtype
    eps = jnp.finfo(dtype).eps
    p_norm, p_scale = _normalize(p_raw)
    w_sum = jnp.sum(w)
    w_ok = w_sum > 0.0
    wn = jnp.where(w_ok, w / jnp.maximum(w_sum, 1e-30), w)

    q0_un = wn @ p_norm
    q0, q0_norm = _normalize(q0_un)
    # Degenerate: zero weights or a zero mean direction.  The reference marks
    # itself converged *before* ever computing v, and GetResult then blends
    # with the zero-initialized v -> result is all zeros
    # (spherical_average.h:199-209,237-244).
    degenerate = jnp.logical_or(~w_ok, q0_norm <= 0.0)

    def body(_, carry):
        q, s, t, r, gamma, mem_idx, v, g, d, converged = carry
        norm_d = jnp.linalg.norm(d)
        now_converged = jnp.logical_or(converged, norm_d < 8.0 * eps)

        # UpdateQS (spherical_average.h:394-408)
        q_new, _ = _normalize(q - d)
        s_new = s.at[mem_idx].set(q_new - q)
        # UpdateVGDT (spherical_average.h:381-392): t[mem] temporarily holds
        # g_old while the inner UpdateVGD runs -- the two-loop recursion reads
        # that stale row (with the equally stale r[mem]); this is the
        # reference's exact behavior, reproduced for parity.
        t_tmp = t.at[mem_idx].set(g)
        v_new, g_new, d_new = _compute_vgd(
            p_norm, wn, q_new, s_new, t_tmp, r, gamma, mem_idx
        )
        t_row = g_new - g
        t_row = t_row - (q_new @ t_row) * q_new
        t_new = t_tmp.at[mem_idx].set(t_row)
        # UpdateGammaR (spherical_average.h:410-418)
        st = s_new[mem_idx] @ t_row
        r_new = r.at[mem_idx].set(1.0 / jnp.where(st == 0.0, eps, st))
        tt = t_row @ t_row
        gamma_new = st / jnp.where(tt == 0.0, eps, tt)
        mem_new = (mem_idx + 1) % _K

        def keep(old, new):
            return jnp.where(now_converged, old, new)

        return (
            keep(q, q_new), keep(s, s_new), keep(t, t_new), keep(r, r_new),
            keep(gamma, gamma_new), keep(mem_idx, mem_new),
            keep(v, v_new), keep(g, g_new), keep(d, d_new), now_converged,
        )

    s0 = jnp.zeros((_K, p_raw.shape[1]), dtype)
    t0 = jnp.zeros((_K, p_raw.shape[1]), dtype)
    r0 = jnp.zeros((_K,), dtype)
    v0, g0, d0 = _compute_vgd(p_norm, wn, q0, s0, t0, r0, jnp.asarray(1.0, dtype), 0)
    carry = (q0, s0, t0, r0, jnp.asarray(1.0, dtype), jnp.asarray(0, jnp.int32),
             v0, g0, d0, degenerate)
    carry = jax.lax.fori_loop(0, n_iters, body, carry)
    v = carry[6]
    v = jnp.where(degenerate, jnp.zeros_like(v), v)
    # GetResult (spherical_average.h:237-244): weights applied to raw points.
    return v @ p_raw


@functools.partial(jax.jit, static_argnames=("n_iters",))
def spherical_average(p_raw, w, n_iters: int = SPH_AVG_MAX_N_UPDATES):
    """Batched spherical average.

    Args:
      p_raw: [..., N, M] unnormalized points.
      w: [..., N] nonnegative weights (zero = excluded).
      n_iters: fixed L-BFGS iteration count (4 matches the reference's
        kSphAvgMaxNUpdates budget).

    Returns: [..., M] spherical weighted mean in unnormalized space.
    """
    fn = _single_spherical_average
    batch_dims = p_raw.ndim - 2
    for _ in range(batch_dims):
        fn = jax.vmap(fn, in_axes=(0, 0, None))
    return fn(p_raw, w, n_iters)
