"""Spherical average vs a NumPy float64 port of spherical_average.h."""

import numpy as np
import jax.numpy as jnp

from beatrice_vst_tpu.ops.spherical_average import spherical_average


class RefSphericalAverage:
    """Direct float64 port of the reference algorithm (K=2 L-BFGS)."""

    def __init__(self, p_raw):
        self.p_raw = np.asarray(p_raw, np.float64)
        norms = np.linalg.norm(self.p_raw, axis=1, keepdims=True)
        self.p = np.where(norms > 0, self.p_raw / np.maximum(norms, 1e-300), self.p_raw)
        self.K = 2
        self.M = self.p_raw.shape[1]

    def set_weights(self, w):
        self.converged = False
        w = np.asarray(w, np.float64)
        self.w = w / w.sum() if w.sum() > 0 else w
        if w.sum() <= 0:
            self.converged = True
            self.v = np.zeros_like(w)
            return
        q = self.w @ self.p
        n = np.linalg.norm(q)
        if n <= 0:
            self.converged = True
            self.v = np.zeros_like(w)
            return
        self.q = q / n
        self.mem = 0
        self.gamma = 1.0
        self.s = np.zeros((self.K, self.M))
        self.t = np.zeros((self.K, self.M))
        self.r = np.zeros(self.K)
        self._update_vgd()

    def _update_vgd(self):
        eps = np.finfo(np.float64).eps
        cos = np.clip(self.p @ self.q, -1, 1)
        theta = np.arccos(cos)
        sinc = np.sinc(theta / np.pi)
        inv_sinc = 1.0 / (sinc + eps)
        v_un = self.w * inv_sinc
        sum_wcs = np.sum(self.w * cos * inv_sinc)
        self.v = v_un / (sum_wcs + eps)
        g = (-2.0 * v_un) @ self.p
        g = g - (self.q @ g) * self.q
        self.g = g
        d = g.copy()
        a = np.zeros(self.K)
        for k in range(self.K):
            idx = (self.mem - k - 1 + self.K) % self.K
            a[idx] = self.r[idx] * (self.s[idx] @ d)
            d -= a[idx] * self.t[idx]
        d *= self.gamma
        for k in range(self.K):
            idx = (self.mem + k) % self.K
            b = self.r[idx] * (self.t[idx] @ d)
            d += (a[idx] - b) * self.s[idx]
        self.d = d

    def update(self):
        if self.converged:
            return True
        eps = np.finfo(np.float64).eps
        if np.linalg.norm(self.d) >= 8 * eps:
            # UpdateQS
            q_old = self.q.copy()
            self.s[self.mem] = self.q.copy()
            self.q = self.q - self.d
            self.q /= np.linalg.norm(self.q)
            self.s[self.mem] = self.q - self.s[self.mem]
            # UpdateVGDT
            self.t[self.mem] = self.g.copy()
            self._update_vgd()
            self.t[self.mem] = self.g - self.t[self.mem]
            self.t[self.mem] -= (self.q @ self.t[self.mem]) * self.q
            # UpdateGammaR
            self.gamma = self.s[self.mem] @ self.t[self.mem]
            self.r[self.mem] = 1.0 / self.gamma
            self.gamma /= self.t[self.mem] @ self.t[self.mem]
            self.mem = (self.mem + 1) % self.K
            del q_old
        else:
            self.converged = True
        return self.converged

    def result(self, n_updates):
        for _ in range(n_updates):
            if self.update():
                break
        nz = self.v if hasattr(self, "v") else np.zeros(self.p_raw.shape[0])
        return nz @ self.p_raw


def test_two_point_slerp():
    """Spherical average of two unit vectors with equal weight = midpoint on
    the great circle (the defining slerp property)."""
    a = np.array([1.0, 0.0, 0.0, 0.0])
    b = np.array([0.0, 1.0, 0.0, 0.0])
    p = np.stack([a, b])
    out = spherical_average(jnp.asarray(p, jnp.float32), jnp.asarray([0.5, 0.5], jnp.float32), n_iters=16)
    want = (a + b) / np.sqrt(2)  # unit midpoint
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-4)


def test_single_point_identity():
    rng = np.random.default_rng(3)
    p = rng.standard_normal((4, 64)).astype(np.float32) * 3.0
    w = np.array([0.0, 1.0, 0.0, 0.0], np.float32)
    out = spherical_average(jnp.asarray(p), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(out), p[1], rtol=1e-4, atol=1e-4)


def test_matches_reference_port():
    rng = np.random.default_rng(4)
    p = rng.standard_normal((8, 256)).astype(np.float32)
    w = rng.uniform(0, 1, 8).astype(np.float32)
    w[w < 0.1] = 0.0
    ref = RefSphericalAverage(p)
    ref.set_weights(w)
    want = ref.result(4)
    got = spherical_average(jnp.asarray(p), jnp.asarray(w), n_iters=4)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_batched_rows():
    """vmap over KV rows: [R, N, M] points with shared weights per row."""
    rng = np.random.default_rng(5)
    p = rng.standard_normal((16, 4, 32)).astype(np.float32)
    w = np.tile(np.asarray([0.4, 0.3, 0.2, 0.1], np.float32), (16, 1))
    out = spherical_average(jnp.asarray(p), jnp.asarray(w))
    assert out.shape == (16, 32)
    for r in [0, 7, 15]:
        ref = RefSphericalAverage(p[r])
        ref.set_weights(w[r])
        np.testing.assert_allclose(
            np.asarray(out[r]), ref.result(4), rtol=2e-3, atol=2e-3
        )


def test_zero_weights_give_zeros():
    p = np.ones((4, 8), np.float32)
    w = np.zeros(4, np.float32)
    out = spherical_average(jnp.asarray(p), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(out), 0.0)
