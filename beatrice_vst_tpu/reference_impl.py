"""Independent NumPy (float64) oracle of the Beatrice-2 stage chain.

The closed reference binary only ships Windows/macOS static libraries, so
the executable golden reference for waveform parity on this platform is an
independent reimplementation: this module forwards the *same parameter
pytree* through a from-scratch NumPy implementation (np.fft instead of
matmul-DFT, argsort instead of top_k, float64 throughout, no JAX imports
in the compute path) and the golden tests require the JAX chain to match
it within the 1e-3 waveform gate (SURVEY.md section 4, strategy #2).

Everything here is deliberately written to the *spec* of models/ (the
docstrings and the reference C ABI contract), not by importing its code --
a bug shared between both implementations would have to be a spec bug.
Offline whole-utterance only; no streaming state (the chunk path is the
reference; streaming==chunk is tested separately).
"""

from __future__ import annotations

import numpy as np

from .constants import (
    IN_HOP_LENGTH,
    OUT_HOP_LENGTH,
    OUT_SAMPLE_RATE,
    PITCH_BIN_ZERO_HZ,
    PITCH_BINS_PER_OCTAVE,
    PITCH_BINS_PER_SEMITONE,
)
from .ops.frontend import mel_filterbank


def _np(tree):
    if isinstance(tree, dict):
        return {k: _np(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [_np(v) for v in tree]
    return np.asarray(tree, np.float64)


def gelu(x):
    # tanh approximation (jax.nn.gelu default)
    return 0.5 * x * (1.0 + np.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x**3)))


def layer_norm(p, x, eps=1e-5):
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps) * p["g"] + p["b"]


def linear(p, x):
    return x @ p["w"] + p["b"]


def causal_conv(p, x, dilation=1):
    """x: [T, Cin] zero left-padded; returns [T, Cout]."""
    w, b = p["w"], p["b"]
    k = w.shape[0]
    t = x.shape[0]
    pad = (k - 1) * dilation
    full = np.concatenate([np.zeros((pad, x.shape[1])), x], axis=0)
    out = np.zeros((t, w.shape[2]))
    for j in range(k):
        out += full[j * dilation: j * dilation + t] @ w[j]
    return out + b


def conv_block(p, x, dilation=1):
    h = layer_norm(p["ln"], x)
    h = causal_conv(p["conv"], h, dilation)
    h = gelu(h)
    h = gelu(linear(p["mlp_in"], h))
    h = linear(p["mlp_out"], h)
    return x + h


def cross_attention(p, x, kv):
    h = layer_norm(p["ln"], x)
    q = linear(p["q"], h)          # [T, A]
    k = linear(p["k"], kv)         # [L, A]
    v = linear(p["v"], kv)
    scores = q @ k.T / np.sqrt(q.shape[-1])
    scores -= scores.max(axis=-1, keepdims=True)
    w = np.exp(scores)
    w /= w.sum(axis=-1, keepdims=True)
    return x + linear(p["o"], w @ v)


def snake(p, x):
    """Polynomial periodic snake: x + Q(a*x)/a with Q(y) = 16*(u*(1-u))^2,
    u = frac(y/pi) -- the model spec (see models/layers.snake)."""
    a = np.exp(p["log_alpha"])
    y = x * (a / np.pi)
    u = y - np.floor(y)
    q = u * (1.0 - u)
    return x + 16.0 * (q * q) / (a + 1e-9)


def hash_noise(counter, n, salt):
    """Bit-exact NumPy mirror of models/layers.hash_noise."""
    with np.errstate(over="ignore"):
        c = np.asarray(counter, np.uint32)[..., None] * np.uint32(0x9E3779B9)
        idx = c + (np.arange(n, dtype=np.uint32) + np.uint32(salt & 0xFFFFFFFF)) * np.uint32(0x85EBCA6B)
        z = idx
        z = (z ^ (z >> np.uint32(16))) * np.uint32(0x7FEB352D)
        z = (z ^ (z >> np.uint32(15))) * np.uint32(0x846CA68B)
        z = z ^ (z >> np.uint32(16))
    return z.astype(np.float64) * (2.0 / 4294967296.0) - 1.0


def logmel(audio, win, n_mels, fmax, hop=IN_HOP_LENGTH, sr=16000, floor=1e-5):
    """Framed log-mel: [T, n_mels] from [T*hop] with zero history."""
    t = len(audio) // hop
    full = np.concatenate([np.zeros(win - hop), audio])
    wnd = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(win) / win)
    frames = np.stack([full[i * hop: i * hop + win] * wnd for i in range(t)])
    power = np.abs(np.fft.rfft(frames, axis=-1)) ** 2
    mel = mel_filterbank(sr, win, n_mels, 0.0, fmax).astype(np.float64)
    return np.log(np.maximum(power @ mel, floor))


def phone_forward(p, cfg, audio):
    mel = logmel(audio, cfg.phone.win, cfg.phone.n_mels, 8000.0)
    h = linear(p["prenet"], mel)
    for blk, d in zip(p["blocks"], cfg.phone.dilations):
        h = conv_block(blk, h, d)
    return linear(p["out"], layer_norm(p["out_ln"], h))


def pitch_forward(p, cfg, audio, min_q=1, max_q=None):
    max_q = max_q if max_q is not None else cfg.pitch.pitch_bins - 1
    mel = logmel(audio, cfg.pitch.win, cfg.pitch.n_mels, 4000.0)
    h = linear(p["prenet"], mel)
    for blk, d in zip(p["blocks"], cfg.pitch.dilations):
        h = conv_block(blk, h, d)
    h = layer_norm(p["out_ln"], h)
    logits = linear(p["logits"], h)
    feats = linear(p["features"], h)
    bins = np.arange(cfg.pitch.pitch_bins)
    masked = np.where((bins >= min_q) & (bins <= max_q), logits, -np.inf)
    return masked.argmax(axis=-1), feats


def vq_knn(phone, codebook, n):
    if n <= 0:
        return phone
    c2 = (codebook**2).sum(axis=-1)
    out = np.empty_like(phone)
    for t in range(phone.shape[0]):
        dist = c2 - 2.0 * codebook @ phone[t]
        idx = np.argsort(dist, kind="stable")[:n]
        out[t] = codebook[idx].mean(axis=0)
    return out


def transform_pitch(q, avg, inton, shift, corr, ctype, bins):
    bps = PITCH_BINS_PER_SEMITONE
    tmp = avg + (q.astype(np.float64) - avg) * inton + bps * shift
    if corr != 0.0:
        if ctype == 0:
            nearest = (np.floor(tmp / bps) + 0.5) * bps
            delta = (tmp - nearest) * (2.0 / bps)
            absd = np.abs(delta)
            safe = np.maximum(absd, 1e-4)
            corrected = nearest + delta * safe**-corr * (bps / 2.0)
            tmp = np.where(absd < 1e-4, nearest, corrected)
        else:
            nearest = np.round(tmp / bps) * bps
            delta = (tmp - nearest) * (2.0 / bps)
            if corr > 1 - 1e-4:
                tmp = nearest
            else:
                tmp = nearest + np.sign(delta) * np.abs(delta) ** (
                    1.0 / (1.0 - corr)
                ) * (bps / 2.0)
    return np.clip(np.round(tmp), 1, bins - 1).astype(np.int64)


def waveform_forward(p, cfg, phone, qp, feats, spk, kv=None):
    wcfg = cfg.wg
    t = len(qp)
    qp = np.clip(qp, 0, wcfg.pitch_bins - 1)
    h = linear(p["phone_in"], phone) + p["pitch_emb"][qp] + linear(p["feat_in"], feats)
    h = h + linear(p["spk_in"], spk)[None, :]
    for blk in p["blocks"]:
        h = conv_block(blk["conv"], h, 1)
        if wcfg.use_kv_attention:
            h = cross_attention(blk["attn"], h, kv)
    h = layer_norm(p["out_ln"], h)

    # harmonic source with carried phase (zero initial)
    f0 = PITCH_BIN_ZERO_HZ * 2.0 ** (qp / PITCH_BINS_PER_OCTAVE)
    step = 2.0 * np.pi * f0 / OUT_SAMPLE_RATE
    frame_inc = step * OUT_HOP_LENGTH
    start = np.cumsum(frame_inc) - frame_inc
    start = np.mod(start, 2.0 * np.pi)
    n = np.arange(1, OUT_HOP_LENGTH + 1)
    phases = start[:, None] + step[:, None] * n  # [T, 240]
    harm = np.sin(phases[..., None] * np.arange(1, wcfg.n_harmonics + 1))
    gate = 1.0 / (1.0 + np.exp(-feats[:, 0]))
    harm = harm * gate[:, None, None]
    counters = np.arange(t, dtype=np.uint32)

    x = h
    samples_per_frame = 1
    for i, (r, c_out) in enumerate(wcfg.upsample):
        y = causal_conv(p["up"][i]["conv"], x, 1)
        y = y.reshape(y.shape[0] * r, c_out)
        samples_per_frame *= r
        stride = OUT_HOP_LENGTH // samples_per_frame
        harm_r = harm[:, stride - 1:: stride, :].reshape(t * samples_per_frame, -1)
        noise_r = hash_noise(counters, samples_per_frame,
                             wcfg.noise_salt + i * 0x2545F491).reshape(-1, 1)
        src = np.concatenate([harm_r, 0.1 * noise_r], axis=-1)
        y = y + linear(p["up"][i]["src"], src)
        x = snake(p["up"][i]["snake"], y)
    y = causal_conv(p["final"], x, 1)
    return np.tanh(y[:, 0])


def chain_forward(params, cfg, audio16, *, target_settings=None):
    """Full offline forward for ONE stream: [T*160] @16k -> [T*240] @24k.

    target_settings: dict with speaker_embedding [256], kv [384,128],
    codebook [512,128], vq_num_neighbors, min_q, max_q,
    average_source_pitch, intonation_intensity, pitch_shift,
    pitch_correction, pitch_correction_type.
    """
    s = dict(target_settings or {})
    p = _np(params)
    spec = cfg.spec
    phone = phone_forward(p["phone"], cfg, np.asarray(audio16, np.float64))
    if spec.has_vq:
        phone = vq_knn(phone, np.asarray(s["codebook"], np.float64),
                       int(s.get("vq_num_neighbors", 0)))
    qp_raw, feats = pitch_forward(
        p["pitch"], cfg, np.asarray(audio16, np.float64),
        int(s.get("min_q", 1)), int(s.get("max_q", spec.pitch_bins - 1)),
    )
    qp = transform_pitch(
        qp_raw,
        float(s.get("average_source_pitch", 52.0)),
        float(s.get("intonation_intensity", 1.0)),
        float(s.get("pitch_shift", 0.0)),
        float(s.get("pitch_correction", 0.0)),
        int(s.get("pitch_correction_type", 0)),
        spec.pitch_bins,
    )
    kv = np.asarray(s["kv"], np.float64) if spec.has_kv else None
    spk = np.asarray(s.get("speaker_embedding", np.zeros(256)), np.float64)
    return waveform_forward(p["wg"], cfg, phone, qp, feats, spk, kv)
