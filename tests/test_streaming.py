"""Streaming separation (serve/streaming.py): a drained stream must be
sample-identical to offline ola_infer, regardless of push sizing; latency
and memory are bounded; source alignment keeps channel order consistent
across windows."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fqss_tpu.models import ConvTasNet
from fqss_tpu.quant import QuantSpec
from fqss_tpu.separation.ola import ola_infer
from fqss_tpu.serve.streaming import StreamingSeparator

SEG, OVERLAP = 512, 0.25


@pytest.fixture(scope="module")
def tiny_model():
    q = QuantSpec(qat=True, observer=False, n_splitter=2, n_combiner=2, out_quant=True)
    model = ConvTasNet(n_srcs=2, kernel_size=16, stride=8, n_filters=32, bn_chan=16,
                       hid_chan=32, n_blocks=2, n_repeats=1, q=q)
    x = jnp.zeros((1, SEG))
    variables = model.init(jax.random.PRNGKey(0), x)
    fwd = jax.jit(lambda xx: model.apply(variables, xx))
    return fwd


@pytest.mark.parametrize("push_sizes", [[5000], [700, 1300, 3000], [1] * 0 + [64] * 78 + [8]])
def test_stream_equals_offline_ola(tiny_model, push_sizes):
    rng = np.random.default_rng(0)
    total = sum(push_sizes)
    mix = rng.uniform(-1, 1, (1, total)).astype(np.float32)
    # chunk_batch=1: the same [1, seg] executable as streaming — batched
    # shapes are separate XLA compilations whose fake-quant outputs can
    # differ by grid LSBs (the cross-compilation noise floor, PARITY.md)
    ref = ola_infer(tiny_model, mix, n_srcs=2, segment=SEG, overlap=OVERLAP, chunk_batch=1)

    eng = StreamingSeparator(tiny_model, n_srcs=2, segment=SEG, overlap=OVERLAP)
    outs, off = [], 0
    for n in push_sizes:
        y = eng.push(mix[:, off : off + n][0])
        outs.append(y)
        off += n
    outs.append(eng.flush())
    got = np.concatenate(outs, axis=-1)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_latency_bound(tiny_model):
    """Emitted sample count never lags the live edge by more than segment."""
    rng = np.random.default_rng(1)
    eng = StreamingSeparator(tiny_model, n_srcs=2, segment=SEG, overlap=OVERLAP)
    fed = emitted = 0
    for _ in range(12):
        n = int(rng.integers(100, 500))
        y = eng.push(rng.uniform(-1, 1, n).astype(np.float32))
        fed += n
        emitted += y.shape[-1]
        assert fed - emitted <= eng.latency_samples
    # ring memory stays O(segment), not O(stream)
    assert eng._mix.shape[-1] <= SEG + 500


def test_flush_then_push_raises(tiny_model):
    eng = StreamingSeparator(tiny_model, n_srcs=2, segment=SEG)
    eng.push(np.zeros(100, np.float32))
    eng.flush()
    with pytest.raises(RuntimeError):
        eng.push(np.zeros(10, np.float32))
    with pytest.raises(RuntimeError):
        eng.flush()


def test_align_sources_fixes_permutation_flips():
    """A 'model' that flips its source order on every call: with alignment
    the emitted streams stay consistent; without it they interleave."""
    # sources are deterministic functions of the input samples (absolute
    # position encoded in the mix), so every window agrees wherever it
    # overlaps and OLA reconstructs f1/f2 exactly — only the ORDER flips.
    f1 = lambda p: np.sin(2 * np.pi * 0.01 * p)
    f2 = lambda p: np.cos(2 * np.pi * 0.003 * p)
    calls = {"n": 0}

    def flipper(x):
        p = np.asarray(x)[0]
        calls["n"] += 1
        pair = (f1(p), f2(p)) if calls["n"] % 2 == 1 else (f2(p), f1(p))
        return np.stack(pair)[None]

    total = SEG * 4
    mix = np.arange(total, dtype=np.float32)

    for align, should_match in ((True, True), (False, False)):
        calls["n"] = 0
        eng = StreamingSeparator(flipper, n_srcs=2, segment=SEG, overlap=0.5,
                                 align_sources=align)
        y = np.concatenate([eng.push(mix), eng.flush()], axis=-1)
        # source 0 should track f1 throughout if aligned
        tgt = f1(mix)
        err = float(np.mean((y[0] - tgt) ** 2))
        if should_match:
            assert err < 1e-6, err
        else:
            assert err > 1e-3, err


def test_stereo_stream_equals_offline(tiny_model):
    """Stereo plumbing: channels=2 round-trips through the same geometry."""

    def stereo_fwd(x):
        # fake stereo separator: per-channel copy of the mono tiny model
        x = np.asarray(x)  # [1, 2, T]
        y0 = np.asarray(tiny_model(x[:, 0]))
        y1 = np.asarray(tiny_model(x[:, 1]))
        return np.stack([y0, y1], axis=2)  # [1, S, C, T]

    rng = np.random.default_rng(2)
    mix = rng.uniform(-1, 1, (2, 3000)).astype(np.float32)
    ref = ola_infer(stereo_fwd, mix, n_srcs=2, segment=SEG, overlap=OVERLAP, chunk_batch=1)
    eng = StreamingSeparator(stereo_fwd, n_srcs=2, segment=SEG, overlap=OVERLAP, channels=2)
    got = np.concatenate([eng.push(mix[:, :1700]), eng.push(mix[:, 1700:]), eng.flush()],
                         axis=-1)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_stream_with_int8_engine():
    """StreamingSeparator composes with a deployment engine (the docstring's
    claim): drain a stream through ConvTasNetInt8Engine and match offline
    ola_infer over the same engine forward."""
    import dataclasses

    from fqss_tpu.serve import ConvTasNetInt8Engine

    q = QuantSpec(qat=True, observer=True, n_splitter=2, n_combiner=2, out_quant=True)
    model = ConvTasNet(n_srcs=2, kernel_size=16, stride=8, n_filters=32, bn_chan=16,
                       hid_chan=32, n_blocks=2, n_repeats=1, q=q)
    x = jnp.asarray(np.random.default_rng(2).uniform(-1, 1, (1, SEG)), jnp.float32)
    variables = dict(model.init(jax.random.PRNGKey(0), x))  # observer pass seeds ranges
    eng_model = ConvTasNet(n_srcs=2, kernel_size=16, stride=8, n_filters=32, bn_chan=16,
                           hid_chan=32, n_blocks=2, n_repeats=1,
                           q=dataclasses.replace(q, observer=False))
    engine = ConvTasNetInt8Engine(eng_model, variables, compute_dtype="float32")

    rng = np.random.default_rng(3)
    mix = rng.uniform(-1, 1, (1, 1800)).astype(np.float32)
    ref = ola_infer(engine, mix, n_srcs=2, segment=SEG, overlap=OVERLAP, chunk_batch=1)

    stream = StreamingSeparator(engine, n_srcs=2, segment=SEG, overlap=OVERLAP)
    outs = [stream.push(mix[0, :900]), stream.push(mix[0, 900:]), stream.flush()]
    got = np.concatenate(outs, axis=-1)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_reset_reuses_executable_for_new_stream():
    """reset() starts a fresh stream on the same compiled fn: two identical
    streams produce identical output, and state does not leak between them."""
    calls = []

    def fake_fwd(x):  # [1, seg] -> [1, 2, seg]: deterministic, model-free
        calls.append(x.shape)
        return np.stack([x * 0.5, x * -0.25], axis=1)

    rng = np.random.default_rng(7)
    mix = rng.uniform(-1, 1, 1500).astype(np.float32)
    eng = StreamingSeparator(fake_fwd, n_srcs=2, segment=SEG, overlap=OVERLAP)
    y1 = np.concatenate([eng.push(mix), eng.flush()], axis=-1)
    eng.reset()
    y2 = np.concatenate([eng.push(mix[:400]), eng.push(mix[400:]), eng.flush()], axis=-1)
    np.testing.assert_array_equal(y1, y2)
    assert all(s == (1, SEG) for s in calls)  # one fixed-shape executable
