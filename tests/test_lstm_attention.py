"""QLSTM and QMultiheadAttention parity tests vs torch oracles."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import torch

from fqss_tpu.nn.attention import QMultiheadAttention
from fqss_tpu.nn.lstm import QLSTM
from fqss_tpu.quant import QPARAMS, QSTATS, QuantSpec

QAT = QuantSpec(qat=True, observer=False)


def test_qlstm_float_matches_torch_bilstm():
    B, T, C, H = 2, 12, 6, 8
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, T, C)).astype(np.float32)

    m = QLSTM(hidden_size=H, bidirectional=True)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = m.apply(v, jnp.asarray(x))

    tl = torch.nn.LSTM(C, H, 1, bidirectional=True, batch_first=True)
    sd = tl.state_dict()
    p = v["params"]
    sd["weight_ih_l0"] = torch.tensor(np.asarray(p["fw"]["w_ih"]).T)
    sd["weight_hh_l0"] = torch.tensor(np.asarray(p["fw"]["w_hh"]).T)
    sd["bias_ih_l0"] = torch.tensor(np.asarray(p["fw"]["b_ih"]))
    sd["bias_hh_l0"] = torch.tensor(np.asarray(p["fw"]["b_hh"]))
    sd["weight_ih_l0_reverse"] = torch.tensor(np.asarray(p["bw"]["w_ih"]).T)
    sd["weight_hh_l0_reverse"] = torch.tensor(np.asarray(p["bw"]["w_hh"]).T)
    sd["bias_ih_l0_reverse"] = torch.tensor(np.asarray(p["bw"]["b_ih"]))
    sd["bias_hh_l0_reverse"] = torch.tensor(np.asarray(p["bw"]["b_hh"]))
    tl.load_state_dict(sd)
    with torch.no_grad():
        yt, _ = tl(torch.tensor(x))
    np.testing.assert_allclose(np.asarray(y), yt.numpy(), rtol=1e-4, atol=1e-5)


def test_qlstm_fused_quantized_runs_and_differs():
    B, T, C, H = 2, 10, 6, 8
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, C))
    # observer=True: first call observes weights (float), second quantizes
    m = QLSTM(hidden_size=H, mode="fused", q=QuantSpec(qat=True, observer=True))
    v = m.init(jax.random.PRNGKey(0), x)
    assert "wq_ih" in v[QPARAMS]["fw"]
    y, upd = m.apply(v, x, mutable=[QPARAMS, QSTATS])
    y2, _ = m.apply({**v, QPARAMS: upd[QPARAMS], QSTATS: upd[QSTATS]}, x, mutable=[QPARAMS, QSTATS])
    assert y.shape == (B, T, 2 * H)
    assert not np.allclose(np.asarray(y), np.asarray(y2))  # float obs step vs quantized


@pytest.mark.parametrize("mode", ["dynamic", "static"])
def test_qlstm_internal_quant_modes(mode):
    B, T, C, H = 2, 8, 4, 6
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, C)) * 0.5
    q = QuantSpec(qat=True, observer=(mode == "static"), lstm_mode=mode)
    m = QLSTM(hidden_size=H, mode=mode, q=q)
    v = m.init(jax.random.PRNGKey(0), x)
    y, upd = m.apply(v, x, mutable=[QPARAMS, QSTATS])
    assert y.shape == (B, T, 2 * H)
    assert bool(jnp.isfinite(y).all())
    if mode == "static":
        # per-site ranges observed through the scan carry (T steps counted)
        assert int(upd[QSTATS]["fw"]["site_n_iter"]) == T
        assert upd[QPARAMS]["fw"]["site_min"].shape == (12,)
        moved = not np.allclose(np.asarray(upd[QPARAMS]["fw"]["site_min"]), -0.5)
        assert moved


def test_qmha_float_matches_torch():
    B, L, E, h = 2, 10, 16, 4
    rng = np.random.default_rng(2)
    x = rng.standard_normal((B, L, E)).astype(np.float32)

    m = QMultiheadAttention(embed_dim=E, num_heads=h)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(x), jnp.asarray(x))
    y = m.apply(v, jnp.asarray(x), jnp.asarray(x), jnp.asarray(x))

    tm = torch.nn.MultiheadAttention(E, h, batch_first=True)
    sd = tm.state_dict()
    p = v["params"]
    sd["in_proj_weight"] = torch.tensor(np.asarray(p["in_proj_kernel"]).T)
    sd["in_proj_bias"] = torch.tensor(np.asarray(p["in_proj_bias"]))
    sd["out_proj.weight"] = torch.tensor(np.asarray(p["out_proj_kernel"]).T)
    sd["out_proj.bias"] = torch.tensor(np.asarray(p["out_proj_bias"]))
    tm.load_state_dict(sd)
    tm.eval()
    with torch.no_grad():
        yt, _ = tm(torch.tensor(x), torch.tensor(x), torch.tensor(x), need_weights=False)
    np.testing.assert_allclose(np.asarray(y), yt.numpy(), rtol=1e-3, atol=1e-5)


def test_qmha_quantized_attn_noop_quirk():
    """By default the attn/softmax quant sites are evaluated but discarded
    (reference qat_layers.py:934,936 bug); fix_attn_quant=True applies them."""
    B, L, E, h = 1, 6, 8, 2
    x = jax.random.normal(jax.random.PRNGKey(3), (B, L, E))
    m0 = QMultiheadAttention(E, h, q=QAT)
    v = m0.init(jax.random.PRNGKey(0), x, x, x)
    y0, _ = m0.apply(v, x, x, x, mutable=[QPARAMS, QSTATS])

    m1 = QMultiheadAttention(E, h, q=QAT, fix_attn_quant=True)
    y1, _ = m1.apply(v, x, x, x, mutable=[QPARAMS, QSTATS])
    # same variables tree (quirk sites exist either way), different outputs
    assert not np.allclose(np.asarray(y0), np.asarray(y1))
    # both have attn/softmax quantizer state
    assert "activation_fake_quantize_attn" in v[QPARAMS]
    assert "activation_fake_quantize_softmax" in v[QPARAMS]


@pytest.mark.parametrize("spec", [None, QAT, QuantSpec(qat=True, observer=False, compute_dtype="bfloat16")])
def test_qlstm_fuse_bidir_matches_two_scans(spec):
    """The joint bidirectional recurrence (one scan, gate-interleaved
    block-diagonal weights) is term-for-term the same math as two
    per-direction scans — values AND input gradient."""
    B, T, C, H = 2, 14, 6, 8
    x = jnp.asarray(np.random.default_rng(1).standard_normal((B, T, C)).astype(np.float32))
    kw = dict(hidden_size=H, bidirectional=True, mode="fused")
    if spec is not None:
        kw["q"] = spec
    joint = QLSTM(fuse_bidir=True, **kw)
    two = QLSTM(fuse_bidir=False, **kw)
    v = joint.init(jax.random.PRNGKey(3), x)  # identical param trees

    yj = joint.apply(v, x)
    ys = two.apply(v, x)
    np.testing.assert_allclose(np.asarray(yj), np.asarray(ys), rtol=1e-6, atol=1e-6)

    gj = jax.grad(lambda xx: jnp.sum(joint.apply(v, xx) ** 2))(x)
    gs = jax.grad(lambda xx: jnp.sum(two.apply(v, xx) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gj), np.asarray(gs), rtol=1e-5, atol=1e-5)


def test_qlstm_fuse_bidir_pallas_route_falls_back_cleanly():
    """fuse_bidir + pallas_lstm: the joint path defers to the per-direction
    Pallas route (lstm_sequence; scan fallback for unsupported H here) and
    still matches the plain two-scan path."""
    B, T, C, H = 2, 9, 5, 8
    q = QuantSpec(qat=True, observer=False, pallas_lstm=True)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((B, T, C)).astype(np.float32))
    joint = QLSTM(hidden_size=H, bidirectional=True, mode="fused", fuse_bidir=True, q=q)
    two = QLSTM(hidden_size=H, bidirectional=True, mode="fused", fuse_bidir=False,
                q=QuantSpec(qat=True, observer=False))
    v = joint.init(jax.random.PRNGKey(4), x)
    np.testing.assert_allclose(
        np.asarray(joint.apply(v, x)), np.asarray(two.apply(v, x)), rtol=1e-6, atol=1e-6
    )
