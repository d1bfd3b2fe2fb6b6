"""Mel front end: matmul-DFT == numpy rFFT; framing/history correctness."""

import numpy as np
import jax.numpy as jnp

from beatrice_vst_tpu.ops.frontend import MelFrontend, hann_window, mel_filterbank


def test_matmul_dft_equals_rfft():
    fe = MelFrontend()
    rng = np.random.default_rng(9)
    x = rng.standard_normal((3, fe.win)).astype(np.float32)
    got = np.asarray(fe(jnp.asarray(x)))
    w = hann_window(fe.win)
    spec = np.abs(np.fft.rfft(x * w, axis=-1)) ** 2
    mel = mel_filterbank(fe.sample_rate, fe.win, fe.n_mels, fe.fmin, fe.sample_rate / 2)
    want = np.log(np.maximum(spec @ mel, fe.log_floor))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_frames_from_chunk_stride_and_history():
    fe = MelFrontend()
    t = 4
    x = np.arange(fe.hop * t, dtype=np.float32)[None]
    hist = np.full((1, fe.history), -1.0, np.float32)
    windows, new_hist = fe.frames_from_chunk(jnp.asarray(hist), jnp.asarray(x))
    windows = np.asarray(windows)
    assert windows.shape == (1, t, fe.win)
    # frame 0 = [history | first hop]
    assert np.all(windows[0, 0, : fe.history] == -1.0)
    np.testing.assert_array_equal(windows[0, 0, fe.history:], x[0, : fe.hop])
    # last win samples of the concatenated signal become the new history
    full = np.concatenate([hist, x], axis=1)
    np.testing.assert_array_equal(np.asarray(new_hist), full[:, -fe.history:])
    # frame k starts at k*hop in the concatenated signal
    np.testing.assert_array_equal(windows[0, 2], full[0, 2 * fe.hop: 2 * fe.hop + fe.win])


def test_mel_filterbank_covers_band():
    fb = mel_filterbank(16000, 512, 80, 0.0, 8000.0)
    assert fb.shape == (257, 80)
    # every mel band has some support; interior fft bins covered
    assert (fb.sum(axis=0) > 0).all()
    assert (fb[5:250].sum(axis=1) > 0).all()
