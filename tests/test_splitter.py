"""Golden-value tests for the splitter/combiner round trip (process.py:16-52)."""

import numpy as np

import jax.numpy as jnp

from fqss_tpu.separation import postprocess, preprocess, split_msb_lsb


def test_preprocess_identity_when_single_stream():
    x = np.random.default_rng(0).uniform(-1, 1, (2, 100)).astype(np.float32)
    y = preprocess(jnp.asarray(x), n_splitter=1)
    assert y.shape == (2, 1, 100)
    np.testing.assert_array_equal(np.asarray(y)[:, 0], x)


def test_splitter_combiner_round_trip_error_bound():
    """combiner(splitter(x)) reconstructs x to within (0.5*delta)^n of the
    normalized signal — the identity the mechanism is built on."""
    rng = np.random.default_rng(1)
    x = rng.uniform(-0.8, 0.8, (2, 1, 4096)).astype(np.float32)
    delta = 1.0 / 128

    for n in (2, 3):
        streams = preprocess(jnp.asarray(x), n_splitter=n)  # [B, n, T]
        assert streams.shape == (2, n, 4096)
        # Invert the splitter's residual remapping: stream_i+1 encodes the
        # quantization error of stream_i scaled by 2/delta and shifted.
        planes = [streams[:, i] for i in range(n)]
        recon = planes[0]
        scale = 1.0
        for i in range(1, n):
            scale *= 0.5 * delta
            recon = recon + (planes[i] + 1.0) * scale
        x_norm = np.asarray(x)[:, 0] / np.abs(x).max()
        err = np.abs(np.asarray(recon) - x_norm).max()
        assert err <= (0.5 * delta) ** (n - 1) * delta * 2, f"n={n}: err {err}"


def test_splitter_streams_are_on_grid_and_in_range():
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, (1, 1, 1000)).astype(np.float32)
    streams = np.asarray(preprocess(jnp.asarray(x), n_splitter=2))
    delta = 1.0 / 128
    for i in range(2):
        q = streams[0, i] / delta
        np.testing.assert_allclose(q, np.round(q), atol=1e-3)
        assert streams[0, i].min() >= -1.0 - 1e-6
        assert streams[0, i].max() <= 1.0 - delta + 1e-6  # 127 * delta


def test_postprocess_combines_planes():
    rng = np.random.default_rng(3)
    planes = rng.standard_normal((2, 3, 2, 1, 50)).astype(np.float32)  # [n_comb, B, S, C=1, T]
    y = postprocess(jnp.asarray(planes), n_combiner=2)
    delta = 1.0 / 128
    want = planes[0] + planes[1] * (0.5 * delta)
    assert y.shape == (3, 2, 50)  # squeezed channel
    np.testing.assert_allclose(np.asarray(y), want[:, :, 0, :], rtol=1e-6)


def test_postprocess_single_plane_squeeze():
    planes = np.zeros((1, 3, 2, 1, 50), np.float32)
    y = postprocess(jnp.asarray(planes), n_combiner=1)
    assert y.shape == (3, 2, 50)


def test_split_msb_lsb_reconstruction():
    rng = np.random.default_rng(4)
    x = rng.uniform(-0.9, 0.9, (1, 2, 1024)).astype(np.float32)
    msb, lsb = split_msb_lsb(jnp.asarray(x))
    delta = 1.0 / 128
    recon = np.asarray(msb) + np.asarray(lsb) * 0.5 * delta
    np.testing.assert_allclose(recon, x, atol=1e-6)


def test_split_msb_lsb_per_sample_batch():
    """B>1: each sample is split against its own threshold (regression:
    the x[0] index distilled every batch element vs sample 0)."""
    rng = np.random.default_rng(5)
    x = rng.uniform(-0.9, 0.9, (3, 2, 512)).astype(np.float32)
    x[1] *= 0.05  # very different dynamic range per sample
    msb, lsb = split_msb_lsb(jnp.asarray(x))
    assert msb.shape == x.shape and lsb.shape == x.shape
    delta = 1.0 / 128
    np.testing.assert_allclose(np.asarray(msb) + np.asarray(lsb) * 0.5 * delta, x, atol=1e-6)
    # each sample's split must equal the batch-1 split of that sample alone
    for b in range(3):
        msb_b, lsb_b = split_msb_lsb(jnp.asarray(x[b : b + 1]))
        np.testing.assert_allclose(np.asarray(msb)[b], np.asarray(msb_b)[0], atol=1e-7)
        np.testing.assert_allclose(np.asarray(lsb)[b], np.asarray(lsb_b)[0], atol=1e-7)
