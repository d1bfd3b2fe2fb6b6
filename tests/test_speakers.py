"""Speaker bank + morphing: IO roundtrip, morph math, lottery distribution."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from beatrice_vst_tpu.constants import V20A2, V20RC0
from beatrice_vst_tpu.errors import BeatriceError
from beatrice_vst_tpu.speakers import bank as bank_mod
from beatrice_vst_tpu.speakers.morpher import (
    codebook_lottery,
    pruned_morph_weights,
    select_conditioning,
    update_morphed_embeddings,
)


def test_bank_roundtrip(tmp_path):
    b = bank_mod.random_bank(jax.random.PRNGKey(0), V20RC0, 12)
    p = str(tmp_path / "spk.npz")
    bank_mod.save(p, b)
    b2 = bank_mod.load(p, V20RC0)
    assert bank_mod.n_speakers(b2) == 12
    for k in b:
        np.testing.assert_array_equal(np.asarray(b[k]), np.asarray(b2[k]))


def test_raw_float32_reader(tmp_path):
    raw = np.random.default_rng(0).standard_normal((7, 256)).astype(np.float32)
    p = str(tmp_path / "speaker_embeddings.bin")
    raw.tofile(p)
    b = bank_mod.load(p, V20A2)
    assert bank_mod.n_speakers(b) == 7
    np.testing.assert_array_equal(np.asarray(b["additive"]), raw)


def test_raw_reader_sibling_formant_file(tmp_path):
    raw = np.random.default_rng(0).standard_normal((3, 256)).astype(np.float32)
    raw.tofile(str(tmp_path / "speaker_embeddings.bin"))
    formant = np.random.default_rng(1).standard_normal((9, 256)).astype(np.float32)
    formant.tofile(str(tmp_path / "formant_shift_embeddings.bin"))
    b = bank_mod.load(str(tmp_path / "speaker_embeddings.bin"), V20A2)
    np.testing.assert_array_equal(np.asarray(b["formant"]), formant)


def test_raw_formant_reader_size_checks(tmp_path):
    p = str(tmp_path / "formant_shift_embeddings.bin")
    np.zeros(9 * 256 - 1, np.float32).tofile(p)
    with pytest.raises(BeatriceError):
        bank_mod.load_raw_formant(p)
    np.zeros(9 * 256 + 1, np.float32).tofile(p)
    with pytest.raises(BeatriceError):
        bank_mod.load_raw_formant(p)
    np.arange(9 * 256, dtype=np.float32).tofile(p)
    got = bank_mod.load_raw_formant(p)
    assert got.shape == (9, 256)


def test_raw_rc0_dir_reader(tmp_path):
    from beatrice_vst_tpu.constants import V20RC0

    rng = np.random.default_rng(0)
    n = 3
    rng.standard_normal((n, 256)).astype(np.float32).tofile(
        str(tmp_path / "additive_speaker_embeddings.bin"))
    rng.standard_normal((9, 256)).astype(np.float32).tofile(
        str(tmp_path / "formant_shift_embeddings.bin"))
    cb = rng.standard_normal((n, 512, 128)).astype(np.float32)
    cb.tofile(str(tmp_path / "speaker_embeddings.bin"))
    kv = rng.standard_normal((n, 384, 128)).astype(np.float32)
    kv.tofile(str(tmp_path / "key_value_speaker_embeddings.bin"))
    b = bank_mod.load_raw_rc0_dir(str(tmp_path), V20RC0)
    assert bank_mod.n_speakers(b) == n
    np.testing.assert_array_equal(np.asarray(b["codebook"]), cb)
    np.testing.assert_array_equal(np.asarray(b["kv"]), kv)


def test_raw_rc0_dir_size_mismatch(tmp_path):
    from beatrice_vst_tpu.constants import V20RC0

    rng = np.random.default_rng(0)
    rng.standard_normal((2, 256)).astype(np.float32).tofile(
        str(tmp_path / "additive_speaker_embeddings.bin"))
    # codebook sized for 3 speakers, additive says 2 -> error
    rng.standard_normal((3, 512, 128)).astype(np.float32).tofile(
        str(tmp_path / "speaker_embeddings.bin"))
    rng.standard_normal((2, 384, 128)).astype(np.float32).tofile(
        str(tmp_path / "key_value_speaker_embeddings.bin"))
    with pytest.raises(BeatriceError):
        bank_mod.load_raw_rc0_dir(str(tmp_path), V20RC0)


def test_raw_reader_invalid_size(tmp_path):
    p = str(tmp_path / "bad.bin")
    np.zeros(100, np.float32).tofile(p)
    with pytest.raises(BeatriceError):
        bank_mod.load(p, V20A2)


def test_morphed_embeddings_single_speaker_identity():
    b = bank_mod.random_bank(jax.random.PRNGKey(1), V20RC0, 8)
    dense = jnp.zeros((2, 16)).at[:, 3].set(1.0)
    pruned, idx = pruned_morph_weights(dense, jnp.asarray([8, 8]))
    m = update_morphed_embeddings(b, pruned, idx)
    np.testing.assert_allclose(
        np.asarray(m["additive"][0]), np.asarray(b["additive"][3]), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(m["kv"][1]), np.asarray(b["kv"][3]), rtol=1e-4, atol=1e-4
    )


def test_lottery_distribution_and_determinism():
    pruned = jnp.asarray([[0.7, 0.3, 0, 0, 0, 0, 0, 0]], jnp.float32)
    idx = jnp.asarray([[0, 1, 2, 3, 4, 5, 6, 7]])
    frames = jnp.arange(4000, dtype=jnp.uint32)[None, :]  # [1, T]
    picks = codebook_lottery(pruned, idx, jnp.asarray([8]), frames)
    picks = np.asarray(picks)[0]
    frac0 = (picks == 0).mean()
    assert 0.65 < frac0 < 0.75, frac0
    assert set(np.unique(picks)) <= {0, 1}
    # deterministic
    picks2 = np.asarray(codebook_lottery(pruned, idx, jnp.asarray([8]), frames))[0]
    np.testing.assert_array_equal(picks, picks2)


def test_lottery_degenerate_uniform():
    pruned = jnp.zeros((1, 8), jnp.float32)
    idx = jnp.asarray([[0, 1, 2, 3, 4, 5, 6, 7]])
    frames = jnp.arange(2000, dtype=jnp.uint32)[None, :]
    picks = np.asarray(codebook_lottery(pruned, idx, jnp.asarray([5]), frames))[0]
    assert picks.min() >= 0 and picks.max() <= 4
    assert len(np.unique(picks)) == 5


def test_select_conditioning_direct_vs_morph():
    b = bank_mod.random_bank(jax.random.PRNGKey(2), V20RC0, 4)
    # stream 0: direct speaker 2; stream 1: morph mode (target == n)
    target = jnp.asarray([2, 4])
    dense = jnp.zeros((2, 8)).at[:, 0].set(0.5).at[:, 1].set(0.5)
    pruned, idx = pruned_morph_weights(dense, jnp.asarray([4, 4]))
    morphed = update_morphed_embeddings(b, pruned, idx)
    additive, kv, cb = select_conditioning(
        b, target, morphed, jnp.asarray([4, 4]),
        frame_counter=jnp.zeros((2,), jnp.uint32),
        pruned_weights=pruned, top_idx=idx,
    )
    want0 = np.asarray(b["additive"][2] + b["formant"][4])
    np.testing.assert_allclose(np.asarray(additive[0]), want0, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(additive[1]),
        np.asarray(morphed["additive"][1] + b["formant"][4]), rtol=1e-5,
    )
    np.testing.assert_array_equal(np.asarray(kv[0]), np.asarray(b["kv"][2]))
    assert int(cb[0]) == 2
    assert int(cb[1]) in (0, 1)  # lottery over the two morph speakers
