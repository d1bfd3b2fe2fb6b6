"""Model directory IO, WAV IO, and the CLI driven end-to-end."""

import json
import os

import numpy as np
import pytest

from beatrice_vst_tpu.audio_io import read_wav, write_wav
from beatrice_vst_tpu.cli import main as cli_main
from beatrice_vst_tpu.errors import BeatriceError
from beatrice_vst_tpu.models.io import (
    flatten_params,
    init_random_model_dir,
    load_model_dir,
    load_weights,
    save_weights,
    unflatten_params,
)


def test_flatten_unflatten_roundtrip():
    import jax
    from beatrice_vst_tpu.constants import V20RC0
    from beatrice_vst_tpu.models import chain
    from beatrice_vst_tpu.models.chain import VoiceConverterConfig

    cfg = VoiceConverterConfig.for_version(V20RC0)
    params = chain.init(jax.random.PRNGKey(0), cfg)
    flat = flatten_params(params)
    assert all("/" in k or k.isidentifier() for k in flat)
    rebuilt = unflatten_params(flat)
    for (p1, a), (p2, b) in zip(
        sorted(flatten_params(rebuilt).items()), sorted(flat.items())
    ):
        assert p1 == p2
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # lists reconstructed as lists
    assert isinstance(rebuilt["phone"]["blocks"], list)


def test_model_dir_roundtrip(tmp_path):
    d = str(tmp_path / "model")
    config, cfg, params, bank = init_random_model_dir(d, n_voices=3)
    config2, cfg2, params2, bank2 = load_model_dir(d)
    assert config2.version == "2.0.0-rc.0" and config2.voice_count == 3
    assert cfg2 == cfg
    f1, f2 = flatten_params(params), flatten_params(params2)
    assert f1.keys() == f2.keys()
    np.testing.assert_array_equal(
        np.asarray(f1["wg/pitch_emb"]), np.asarray(f2["wg/pitch_emb"])
    )


def test_load_missing_weights_raises(tmp_path):
    with pytest.raises(BeatriceError):
        load_weights(str(tmp_path / "nope.npz"))


def test_wav_roundtrip(tmp_path):
    sr = 48000
    x = (0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(np.float32)
    p = str(tmp_path / "t.wav")
    write_wav(p, x, sr)
    y, sr2 = read_wav(p)
    assert sr2 == sr
    np.testing.assert_allclose(y, x, atol=1e-3)


def test_cli_end_to_end(tmp_path, capsys):
    d = str(tmp_path / "model")
    cli_main(["init-model", d, "--voices", "3"])
    capsys.readouterr()
    cli_main(["info", "--model", d])
    info = json.loads(capsys.readouterr().out)
    assert info["version"] == "2.0.0-rc.0" and len(info["voices"]) == 3
    sr = 48000
    wav_in = str(tmp_path / "in.wav")
    wav_out = str(tmp_path / "out.wav")
    t = np.arange(sr // 2) / sr
    write_wav(wav_in, 0.3 * np.sin(2 * np.pi * 220 * t).astype(np.float32), sr)
    cli_main([
        "convert", wav_in, wav_out, "--model", d,
        "--voice", "1", "--pitch-shift", "5", "--vq-neighbors", "2",
    ])
    assert os.path.exists(wav_out)
    y, sr2 = read_wav(wav_out)
    assert sr2 == sr and np.isfinite(y).all()
    assert abs(len(y) - sr // 2) < 1000


def test_cli_convert_seq_parallel(tmp_path, capsys):
    d = str(tmp_path / "model_sp")
    cli_main(["init-model", d, "--voices", "2"])
    capsys.readouterr()
    sr = 16000
    wav_in = str(tmp_path / "in_sp.wav")
    out_seq = str(tmp_path / "out_seq.wav")
    out_sp = str(tmp_path / "out_sp.wav")
    t = np.arange(3 * sr) / sr  # 3 s: long enough for >1 segment (~71f RF)
    write_wav(wav_in, 0.3 * np.sin(2 * np.pi * 200 * t).astype(np.float32), sr)
    cli_main(["convert", wav_in, out_seq, "--model", d, "--voice", "1"])
    cli_main(["convert", wav_in, out_sp, "--model", d, "--voice", "1",
              "--seq-parallel", "3"])
    a, _ = read_wav(out_seq)
    b, _ = read_wav(out_sp)
    n = min(len(a), len(b))
    assert n > sr and np.isfinite(b).all()
    assert np.max(np.abs(a[:n] - b[:n])) < 2e-3  # wav is 16-bit quantized
