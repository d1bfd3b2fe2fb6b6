"""Framed log-mel front end as matmuls (MXU-friendly).

The reference's closed inference library computes its framed feature front
end on CPU with PocketFFT (`/root/reference/LICENSES_BUNDLED.txt:13-27`).
On TPU, small fixed-size FFTs are fastest as *matmuls* against precomputed
real-DFT bases: a [B, win] x [win, bins] contraction maps straight onto the
128x128 systolic array and fuses with the mel projection, so the whole
front end (window -> power spectrum -> mel -> log) is two matmuls and a few
VPU elementwise ops per frame batch.

The model consumes 160 new samples per 10 ms frame and keeps `win - 160`
samples of raw history in its streaming state (the scan carry), mirroring
the persistent frame context of the reference pipeline.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp


def hann_window(win: int) -> np.ndarray:
    """Periodic Hann window."""
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(win) / win)


@functools.lru_cache(maxsize=1)
def _ring_slot_stride_env() -> int:
    import os

    return int(os.environ.get("BEATRICE_RING_SLOT_STRIDE", "256"))


def ring_slot_stride(hop: int) -> int:
    """Per-slot storage stride of the merged hop ring (>= hop).

    Default 256 (lane-aligned slots): every tick's one-row DUS write
    starts at a 128-lane-aligned offset (docs/ROOFLINE.md named fat #4:
    the dense 160-sample hop write straddles lane tiles).  The pad rows
    are never written (stay zero) and the DFT bases carry zero rows
    there, so the mels are exactly unchanged -- the cost is a wider ring
    read matmul (L grows hop->stride per slot), the win is the aligned
    write.  On-chip A/B (docs/BENCH_AB_R4.json, v5e): 19968 9.500 ->
    9.356 ms, 20480 9.60 -> 9.55-9.59 (never worse).
    BEATRICE_RING_SLOT_STRIDE=0 restores the dense r3 layout.
    """
    s = _ring_slot_stride_env()
    return max(s, hop) if s else hop


@functools.lru_cache(maxsize=None)
def real_dft_matrices(win: int) -> tuple[np.ndarray, np.ndarray]:
    """Cos/sin bases for an rFFT of length `win`: two [win, win//2+1] mats."""
    n = np.arange(win)[:, None]
    k = np.arange(win // 2 + 1)[None, :]
    ang = 2.0 * np.pi * n * k / win
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float) -> np.ndarray:
    """Triangular mel filterbank, Slaney-style area-normalized: [bins, n_mels]."""

    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)

    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sr / 2.0, n_bins)
    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    fb = np.zeros((n_bins, n_mels), dtype=np.float32)
    for m in range(n_mels):
        lo, ctr, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (fft_freqs - lo) / max(ctr - lo, 1e-9)
        down = (hi - fft_freqs) / max(hi - ctr, 1e-9)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
        # area normalization keeps per-band energy comparable
        fb[:, m] *= 2.0 / max(hi - lo, 1e-9)
    return fb


@dataclasses.dataclass(frozen=True)
class MelFrontend:
    """Log-mel front end over a sliding window with hop = 160 samples."""

    sample_rate: int = 16_000
    win: int = 512
    hop: int = 160
    n_mels: int = 80
    fmin: float = 0.0
    fmax: float | None = None
    log_floor: float = 1e-5

    @property
    def history(self) -> int:
        return self.win - self.hop

    @functools.cached_property
    def _consts_np(self):
        fmax = self.fmax if self.fmax is not None else self.sample_rate / 2.0
        w = hann_window(self.win).astype(np.float32)
        cos_m, sin_m = real_dft_matrices(self.win)
        mel = mel_filterbank(self.sample_rate, self.win, self.n_mels, self.fmin, fmax)
        # Drop DFT bins the filterbank never reads (all-zero mel rows above
        # fmax) -- exact, and with fmax well under Nyquist (the 4 kHz pitch
        # front end) it halves the DFT matmul flops and the power
        # intermediate at serving batch.
        n_bins = int(np.max(np.nonzero(mel.any(axis=1))[0])) + 1 if mel.any() else 1
        cos_m, sin_m, mel = cos_m[:, :n_bins], sin_m[:, :n_bins], mel[:n_bins]
        # Fold the window into the DFT bases so windowing is free.
        return cos_m * w[:, None], sin_m * w[:, None], mel

    @property
    def _consts(self):
        # converted per call, NEVER cached as jnp: a jnp array created
        # inside a jit trace is a tracer, and caching one on this
        # long-lived object leaks it across traces (UnexpectedTracerError).
        # Under jit the conversion is a free constant; only eager callers
        # pay a (small) repeat transfer.
        cos_m, sin_m, mel = self._consts_np
        return jnp.asarray(cos_m), jnp.asarray(sin_m), jnp.asarray(mel)

    def __call__(self, frames):
        """[..., win] windowed raw audio -> [..., n_mels] log-mel."""
        cos_m, sin_m, mel = self._consts
        x = frames.astype(cos_m.dtype)
        re = x @ cos_m
        im = x @ sin_m
        power = re * re + im * im
        return jnp.log(jnp.maximum(power @ mel, self.log_floor))

    # ------------------------------------------------ streaming ring path --

    @property
    def ring_slots(self) -> int:
        """Hop-sized slots covering one analysis window (ceil(win/hop))."""
        return -(-self.win // self.hop)

    @property
    def ring_len(self) -> int:
        return self.ring_slots * self.hop

    def _ring_bases_for(self, p_total: int, stride: int | None = None):
        """Time-ordered windowed-DFT bases over a p_total-slot hop ring
        ([p_total, stride, bins] each; stride defaults to hop).  p_total
        may EXCEED this front end's own ring_slots (a shared ring sized
        for a larger window: the merged phone+pitch audio ring) -- the
        extra leading slots are zero rows, so the products are unchanged.
        With stride > hop (lane-aligned slots, ring_slot_stride), rows
        hop..stride-1 of every slot are zero: those ring positions are
        never written."""
        stride = stride or self.hop
        cache = self.__dict__.setdefault("_ring_bases_cache", {})
        key = (p_total, stride)
        if key not in cache:
            cos_np, sin_np, _ = self._consts_np
            rl = p_total * self.hop
            if rl < self.win:
                raise ValueError(f"ring of {p_total} slots < win {self.win}")
            nb = cos_np.shape[1]
            base = np.zeros((rl, nb), np.float32)
            base[rl - self.win:] = cos_np
            sbase = np.zeros((rl, nb), np.float32)
            sbase[rl - self.win:] = sin_np
            base = base.reshape(p_total, self.hop, nb)
            sbase = sbase.reshape(p_total, self.hop, nb)
            if stride != self.hop:
                pad = ((0, 0), (0, stride - self.hop), (0, 0))
                base = np.pad(base, pad)
                sbase = np.pad(sbase, pad)
            cache[key] = (base, sbase)
        return cache[key]

    @functools.cached_property
    def _ring_bases(self):
        """Phase-indexed DFT bases over the hop-ring: [P, ring_len, bins].

        The streaming step keeps the last P=ceil(win/hop) chunks in a ring
        of hop-sized slots (ONE slot written per frame) instead of shifting
        a [B, win-hop] history and materializing a [B, win] window each
        tick (measured ~0.5 ms/tick at B=10240 on v5e).  Because the ring
        rotation period is P, the window->ring permutation has exactly P
        variants; each variant is folded into its own windowed-DFT basis
        (rows for the <hop samples older than the window are ZERO, so the
        result is exact), and the step one-hot-selects the phase's basis
        and runs the same two matmuls directly on the ring.
        """
        # ONE time-ordered base (slot j = j-th oldest chunk): the windowed
        # DFT rows zero-padded at the front for the <hop samples older than
        # the window.  Every phase's basis is a slot-block rotation of this
        # (selected per tick with a [P, P] one-hot matmul), so only
        # ring_len*bins floats embed in the compiled program instead of P
        # times that -- the P-variant form added ~16 MB of serialized
        # constants and ~55 s to the first compile through the dev relay.
        return self._ring_bases_for(self.ring_slots)

    def ring_state(self, batch_shape=(), dtype=jnp.float32):
        return jnp.zeros((*batch_shape, self.ring_len), dtype)

    def mel_from_ring(self, ring, chunk, pos):
        """One streaming frame: write `chunk` [..., hop] into the ring
        [..., ring_len] at slot pos%P, return (log-mel [..., 1, n_mels],
        new_ring).  Exactly equals frames_from_chunk+__call__ from the
        matching history (same products; zero rows contribute nothing)."""
        p_n = ring.shape[-1] // self.hop
        phase = jnp.mod(jnp.asarray(pos, jnp.int32), p_n)
        new_ring = jax.lax.dynamic_update_slice_in_dim(
            ring, chunk.astype(ring.dtype), phase * self.hop, axis=-1
        )
        return self.mel_read_ring(new_ring, pos), new_ring

    def mel_read_ring(self, ring, pos):
        """Log-mel of the newest window in an ALREADY-written hop ring
        (the read half of mel_from_ring).  The ring may be LARGER than
        this front end's own window (shared phone+pitch audio ring): the
        basis rows for slots older than the window are zero, so the
        products are identical to the dedicated-ring form."""
        stride = ring_slot_stride(self.hop)
        p_n = ring.shape[-1] // stride
        cos_np, sin_np = self._ring_bases_for(p_n, stride)  # [P, stride, nb]
        cos_b, sin_b = jnp.asarray(cos_np), jnp.asarray(sin_np)
        _, _, mel = self._consts
        phase = jnp.mod(jnp.asarray(pos, jnp.int32), p_n)
        # ring slot q holds the chunk of age (phase - q) mod P, i.e. the
        # (q - phase - 1) mod P -th oldest: rotate the base's slot blocks
        rot = jax.nn.one_hot(
            jnp.mod(jnp.arange(p_n) - phase - 1, p_n), p_n, dtype=cos_b.dtype
        )  # [Q, J]
        w_cos = jnp.einsum("qj,jhk->qhk", rot, cos_b).reshape(
            p_n * stride, -1)
        w_sin = jnp.einsum("qj,jhk->qhk", rot, sin_b).reshape(
            p_n * stride, -1)
        x = ring.astype(w_cos.dtype)
        re = x @ w_cos
        im = x @ w_sin
        power = re * re + im * im
        out = jnp.log(jnp.maximum(power @ mel, self.log_floor))
        return out[..., None, :]

    def mel_project(self, re, im):
        """(re, im) DFT products -> log-mel (the tail of mel_read_ring)."""
        _, _, mel = self._consts
        power = re * re + im * im
        return jnp.log(jnp.maximum(power @ mel, self.log_floor))

    def frames_from_chunk(self, history, chunk):
        """Slice a [..., T*hop] chunk plus [..., history] left-context into
        per-frame windows [..., T, win]; returns (windows, new_history).

        Gather-free framing: view the signal as hop-sized rows and stack
        ceil(win/hop) shifted row-slices, then trim to the window length --
        reshapes and slices only, which XLA fuses and the Mosaic backend
        compiles instantly (an explicit [T, win] index gather was a
        compile-time cliff).
        """
        t = chunk.shape[-1] // self.hop
        full = jnp.concatenate([history.astype(chunk.dtype), chunk], axis=-1)
        new_history = full[..., t * self.hop:]
        nrows = -(-self.win // self.hop)  # hop rows covering one window
        pad = (t + nrows) * self.hop - full.shape[-1]
        padded = jnp.concatenate(
            [full, jnp.zeros((*full.shape[:-1], pad), full.dtype)], axis=-1
        )
        rows = padded.reshape(*full.shape[:-1], t + nrows, self.hop)
        parts = [rows[..., j: j + t, :] for j in range(nrows)]
        windows = jnp.concatenate(parts, axis=-1)[..., : self.win]
        return windows, new_history


def dual_mel_read_ring(fe_a: MelFrontend, fe_b: MelFrontend, ring, pos):
    """Both front ends' log-mels from ONE shared hop ring in ONE fused
    DFT matmul.

    The merged phone+pitch ring (models/chain.py) lets each front end
    read the same [B, ring_len] buffer, but two separate mel_read_ring
    calls still read the ring four times (cos+sin per front end) and
    rotate two basis pairs.  Concatenating the four windowed-DFT bases
    along the bin axis makes it one [B, ring_len] x [ring_len, 2(na+nb)]
    contraction -- column blocks of a matmul are independent, so the
    products are bitwise the per-frontend ones.  Requires equal hops.
    """
    assert fe_a.hop == fe_b.hop
    hop = fe_a.hop
    stride = ring_slot_stride(hop)
    p_n = ring.shape[-1] // stride
    ca, sa = fe_a._ring_bases_for(p_n, stride)
    cb, sb = fe_b._ring_bases_for(p_n, stride)
    na, nb = ca.shape[-1], cb.shape[-1]
    w_np = np.concatenate([ca, sa, cb, sb], axis=-1)  # [P, stride, 2na+2nb]
    w = jnp.asarray(w_np)
    phase = jnp.mod(jnp.asarray(pos, jnp.int32), p_n)
    rot = jax.nn.one_hot(
        jnp.mod(jnp.arange(p_n) - phase - 1, p_n), p_n, dtype=w.dtype)
    w_rot = jnp.einsum("qj,jhk->qhk", rot, w).reshape(p_n * stride, -1)
    prod = ring.astype(w.dtype) @ w_rot
    re_a, im_a = prod[..., :na], prod[..., na:2 * na]
    re_b, im_b = prod[..., 2 * na:2 * na + nb], prod[..., 2 * na + nb:]
    mel_a = fe_a.mel_project(re_a, im_a)[..., None, :]
    mel_b = fe_b.mel_project(re_b, im_b)[..., None, :]
    return mel_a, mel_b
