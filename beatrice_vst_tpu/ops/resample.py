"""Rational polyphase resampling as batched, static-shape JAX ops.

The reference implements an arbitrary-rate streaming resampler sandwich in
C++ (`/root/reference/src/common/resample.h`): a Stern-Brocot rational
approximation of the rate ratio (resample.h:25-46), Hann-windowed-sinc
filter banks built at reset (resample.h:209-237), and sample-by-sample
fractional clocks (resample.h:130-206).

The TPU-native design keeps the *math* (rational L/M resampling with a
windowed-sinc prototype on the L*M common grid) but replaces the scalar
clock loop with a precomputed index/weight table: for a static input block
size (a multiple of M) the polyphase phase pattern is periodic, so a block
converts as one gather + weighted reduction over [n_out, taps] windows --
fully vectorized over streams and compatible with `lax.scan` carries
(history = last taps-1 input samples).

Data-dependent output lengths (the reference's per-call varying counts,
resample.h:140-143) are avoided by construction: block sizes are static, a
requirement for XLA.  Arbitrary host rates are still supported exactly --
any rational ratio with denominators < 1000, same as the reference.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import math

import numpy as np
import jax
import jax.numpy as jnp


def compute_simple_fraction(ratio: float, limit: int = 1000) -> tuple[int, int]:
    """Best rational approximation with numerator/denominator < limit.

    Stern-Brocot mediant walk, behaviorally matching resample.h:25-46
    (returns the last fraction on the converged side before either part of
    the mediant reaches the limit).
    """
    ln, ld = 0, 1  # left  (< ratio)
    rn, rd = 1, 0  # right (> ratio)
    while True:
        mn, md = ln + rn, ld + rd
        if ratio * md < mn:  # ratio < mediant
            if mn >= limit or md >= limit:
                return ln, ld
            rn, rd = mn, md
        else:
            if mn >= limit or md >= limit:
                return rn, rd
            ln, ld = mn, md


def rational_rate_ratio(rate_in: float, rate_out: float, limit: int = 1000) -> tuple[int, int]:
    """Return (L, M) in lowest terms with rate_out/rate_in ~= L/M."""
    n, d = compute_simple_fraction(rate_out / rate_in, limit)
    g = math.gcd(n, d)
    return n // g, d // g


@functools.lru_cache(maxsize=None)
def design_polyphase(L: int, M: int, taps: int = 16, cutoff: float = 1.0):
    """Design the polyphase weight table for L/M rational resampling.

    Prototype: Hann-windowed sinc on the common (LCM) grid running at
    rate_in * L == rate_out * M, lowpassed at ``cutoff`` x the narrower
    Nyquist (anti-alias + anti-image), ``taps`` sinc zero-crossings per
    side.  Each output phase row is DC-normalized to exactly 1 (the
    reference relies on analytic gains, resample.h:215-230; per-phase
    normalization is strictly flatter).

    Returns (weights [L, K] float32, K) where
      y[n] = sum_k weights[n*M % L, k] * x[floor(n*M/L) + delay - k]
    and ``delay = ceil(c/L)`` input samples of causal latency.
    """
    zspace = max(L, M) / cutoff  # sinc zero spacing in LCM ticks
    c = int(round(taps * zspace))  # half length
    length = 2 * c + 1
    i = np.arange(length) - c
    proto = np.sinc(i / zspace) * np.hanning(length)
    k_fwd = int(np.ceil(c / L))  # future taps folded into delay
    k_bwd = int(np.floor(c / L))
    K = k_fwd + k_bwd + 1
    W = np.zeros((L, K), dtype=np.float64)
    for p in range(L):
        for k in range(K):
            # Output n (phase p) delayed by k_fwd input samples reads input
            # m = base(n) - k with prototype tap at LCM offset p + (k-k_fwd)L.
            j = c + p + (k - k_fwd) * L
            if 0 <= j < length:
                W[p, k] = proto[j]
    # per-phase DC normalization
    W /= np.maximum(W.sum(axis=1, keepdims=True), 1e-12)
    # NOTE: returns host numpy (never jnp): this function is lru_cached and
    # may first run inside a jit trace, where a jnp constant would be a
    # tracer and poison the cache.
    return W.astype(np.float32), K, k_fwd


@dataclasses.dataclass(frozen=True)
class Resampler:
    """Static-shape streaming resampler for one (L, M, in_block) config."""

    L: int
    M: int
    in_block: int  # must be a multiple of M
    taps: int = 16
    cutoff: float = 1.0

    def __post_init__(self):
        if self.in_block % self.M != 0:
            raise ValueError(
                f"in_block ({self.in_block}) must be a multiple of M ({self.M})"
            )

    @property
    def out_block(self) -> int:
        return self.in_block * self.L // self.M

    @functools.cached_property
    def _table(self):
        W, K, k_fwd = design_polyphase(self.L, self.M, self.taps, self.cutoff)
        hist = K - 1
        return np.asarray(W), K, hist, k_fwd

    @property
    def history_len(self) -> int:
        return self._table[2]

    @functools.cached_property
    def _dense(self):
        """Banded resampling matrix S [hist+in_block, out_block]:
        y = [history | x] @ S.  Identical products to the tap loop (same
        weights, same input indices) accumulated by the MXU; the banded
        zeros are free at these sizes (the 48k->16k edge is a
        [B,528]x[528,160] matmul, ~2 Gflop at B=12288).  The
        phase-decomposed slice form cost ~0.5 ms/tick at B=12288 (stride
        relayouts); this is ~45 us."""
        W, K, hist, _ = self._table
        n_j = self.out_block // self.L
        S = np.zeros((hist + self.in_block, self.out_block), np.float32)
        for r in range(self.L):
            base_r = (r * self.M) // self.L
            w_row = W[(r * self.M) % self.L]
            for k in range(K):
                w = float(w_row[k])
                if w == 0.0:
                    continue
                for q in range(n_j):
                    S[hist + base_r - k + q * self.M, q * self.L + r] += w
        # host numpy, NEVER jnp: this property is cached on a long-lived
        # instance and may first evaluate inside a jit trace, where a jnp
        # constant is a tracer -- caching it leaks it across traces
        # (UnexpectedTracerError; same pitfall note as design_polyphase)
        return S

    # dense blocks above this get chunked into shift-invariant sub-block
    # matmuls (see apply_block), keeping the embedded constant at a few MB
    # instead of O(block^2)
    _DENSE_CHUNK_MAX = 1920

    def _dense_sub_block(self):
        """Largest sub-block <= _DENSE_CHUNK_MAX that divides in_block and
        is a multiple of M; 0 when no chunking is needed/possible."""
        if self.in_block <= self._DENSE_CHUNK_MAX:
            return 0
        for k in range(-(-self.in_block // self._DENSE_CHUNK_MAX),
                       self.in_block + 1):
            if self.in_block % k == 0 and (self.in_block // k) % self.M == 0:
                return self.in_block // k
        return 0

    def _dense_for(self, sub: int):
        """Host-numpy dense matrix of the sub-block resampler (cached)."""
        cache = self.__dict__.setdefault("_dense_sub_cache", {})
        if sub not in cache:
            cache[sub] = dataclasses.replace(self, in_block=sub)._dense
        return cache[sub]

    @property
    def delay_in_samples(self) -> int:
        """Causal latency in *input-rate* samples (sinc group delay)."""
        return self._table[3]

    @property
    def offline_time_offset(self) -> float:
        """Residual sub-sample offset (in output samples, <= 0) left by
        apply_offline's integer delay trim; exactly 0 when M divides
        delay*L.  Output sample n represents input time
        (n + offline_time_offset) * M / L."""
        d_ticks = self.delay_in_samples * self.L
        return (d_ticks // self.M) - d_ticks / self.M

    def init_state(self, batch_shape=(), dtype=jnp.float32):
        return jnp.zeros((*batch_shape, self.history_len), dtype)

    def apply_block(self, x, history):
        """[..., in_block] + [..., hist] -> ([..., out_block], new history).

        Default ('dense'): one banded-matrix matmul (see _dense).  Fallback
        (BEATRICE_RESAMPLE_MODE=slices): phase-decomposed evaluation --
        outputs of phase p are strided slices weighted by scalar taps, L*K
        slices + fused multiply-adds, no gather ops (a [n_out, K] index
        gather here was a compile-time cliff on the Mosaic backend; the
        slice form in turn lost ~1.4 ms/tick at B=12288 to relayouts vs
        the matmul).
        """
        W, K, hist, _ = self._table
        full = jnp.concatenate([history.astype(x.dtype), x], axis=-1)
        if os.environ.get("BEATRICE_RESAMPLE_MODE", "dense") == "dense":
            sub = self._dense_sub_block()
            if sub:
                # Large blocks: the [hist+in_block, out_block] matrix is
                # O(block^2) -- at frames_per_tick=25 the 48k->16k edge
                # would embed a ~190 MB constant in the compile request
                # (the known relay/compile cliff; the whole serving engine
                # failed to build).  The band is SHIFT-INVARIANT across
                # frames, so apply the small per-sub-block matrix to
                # overlapping windows instead: identical taps, identical
                # per-output accumulation order, bitwise-equal outputs.
                s_sub = jnp.asarray(self._dense_for(sub)).astype(x.dtype)
                outs = []
                for c in range(self.in_block // sub):
                    win = full[..., c * sub: c * sub + hist + sub]
                    outs.append(jnp.dot(
                        win, s_sub, preferred_element_type=jnp.float32
                    ).astype(x.dtype))
                y = jnp.concatenate(outs, axis=-1)
            else:
                y = jnp.dot(
                    full, jnp.asarray(self._dense).astype(x.dtype),
                    preferred_element_type=jnp.float32,
                ).astype(x.dtype)
            return y, full[..., full.shape[-1] - hist:]
        n_j = self.out_block // self.L  # outputs per residue class
        M = self.M
        res = None
        if M > 1:
            # Residue decomposition: stride-M lane slices are a relayout per
            # tap on TPU (measured ~10x the traffic-implied cost for the
            # 48k->16k edge at serving batch); instead pay ONE [.., M, n/M]
            # transpose and make every tap read a stride-1 lane slice of a
            # residue row.  Bit-exact same accumulation order as the strided
            # form.
            length = full.shape[-1]
            nrows = -(-length // M)
            pad = nrows * M - length
            full_p = full
            if pad:
                full_p = jnp.concatenate(
                    [full, jnp.zeros((*full.shape[:-1], pad), full.dtype)],
                    axis=-1,
                )
            res = jnp.swapaxes(
                full_p.reshape(*full.shape[:-1], nrows, M), -1, -2
            )  # [..., M, nrows]
        residues = []
        for r in range(self.L):
            # outputs n = q*L + r: base = q*M + (r*M)//L, phase = (r*M) % L
            base_r = (r * self.M) // self.L
            w_row = W[(r * self.M) % self.L]
            acc = None
            for k in range(K):
                w = float(w_row[k])
                if w == 0.0:
                    continue
                start = hist + base_r - k
                if res is not None:
                    sl = jax.lax.slice_in_dim(
                        res[..., start % M, :], start // M,
                        start // M + n_j, 1, axis=-1,
                    )
                else:
                    sl = jax.lax.slice_in_dim(
                        full, start, start + (n_j - 1) * self.M + 1, self.M,
                        axis=-1,
                    )
                acc = sl * w if acc is None else acc + sl * w
            residues.append(acc)
        # interleave residue classes: out[q*L + r] = residues[r][q]
        y = jnp.stack(residues, axis=-1).reshape(*x.shape[:-1], n_j * self.L)
        new_history = full[..., full.shape[-1] - hist:]
        return y, new_history

    def apply_offline(self, x):
        """Whole-signal resample with zero left-padding; trims the delay so
        output sample n aligns with input time n*M/L."""
        n = x.shape[-1]
        pad = (-n) % self.M
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((*x.shape[:-1], pad), x.dtype)], axis=-1
            )
        blocks = x.shape[-1] // self.in_block
        rem = x.shape[-1] - blocks * self.in_block
        y_parts = []
        state = self.init_state(x.shape[:-1], x.dtype)
        for b in range(blocks):
            yb, state = self.apply_block(
                x[..., b * self.in_block:(b + 1) * self.in_block], state
            )
            y_parts.append(yb)
        if rem:
            r = Resampler(self.L, self.M, rem + ((-rem) % self.M), self.taps, self.cutoff)
            tail = x[..., blocks * self.in_block:]
            if tail.shape[-1] < r.in_block:
                tail = jnp.concatenate(
                    [tail, jnp.zeros((*x.shape[:-1], r.in_block - tail.shape[-1]), x.dtype)],
                    axis=-1,
                )
            state = state[..., state.shape[-1] - r.history_len:]
            yb, _ = r.apply_block(tail, state)
            y_parts.append(yb)
        y = jnp.concatenate(y_parts, axis=-1)
        # compensate the causal delay: drop delay*L/M output samples
        lead = (self.delay_in_samples * self.L) // self.M
        out_len = (n * self.L) // self.M
        return y[..., lead:lead + out_len]


def make_resampler(rate_in: float, rate_out: float, in_block: int,
                   taps: int = 16, cutoff: float = 0.99) -> Resampler:
    """Resampler between two rates via the Stern-Brocot rational ratio."""
    L, M = rational_rate_ratio(rate_in, rate_out)
    if in_block % M:
        raise ValueError(
            f"in_block {in_block} incompatible with ratio {L}/{M} for "
            f"{rate_in}->{rate_out}; use a multiple of {M}"
        )
    return Resampler(L=L, M=M, in_block=in_block, taps=taps, cutoff=cutoff)


# Fixed-grid edge converters for the model contract: streams ride the 48 kHz
# common grid (resample.h:401-417 uses the same grid); each 10 ms tick is
# 480 samples @48k -> 160 @16k into the model and 240 @24k -> 480 @48k out.
def input_resampler_48k_to_16k(n_frames: int = 1, taps: int = 16) -> Resampler:
    return Resampler(L=1, M=3, in_block=480 * n_frames, taps=taps, cutoff=0.99)


def output_resampler_24k_to_48k(n_frames: int = 1, taps: int = 16) -> Resampler:
    return Resampler(L=2, M=1, in_block=240 * n_frames, taps=taps, cutoff=0.99)
