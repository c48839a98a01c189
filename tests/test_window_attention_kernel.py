"""Parity test for the fused window-attention Pallas kernel (interpret mode
on CPU) against the XLA reference path."""

import numpy as np
import pytest

import tests.conftest  # noqa: F401

import jax
import jax.numpy as jnp

from empirical_mvm_tpu.ops.window_attention import (
    fused_window_attention, window_attention_reference)


@pytest.mark.parametrize("nh,n,hd,nw", [(4, 196, 32, 8), (2, 49, 16, 4)])
def test_kernel_matches_reference(nh, n, hd, nw):
    rs = np.random.RandomState(0)
    b = 2
    b_ = b * nw
    q = jnp.asarray(rs.randn(b_, nh, n, hd).astype(np.float32))
    k = jnp.asarray(rs.randn(b_, nh, n, hd).astype(np.float32))
    v = jnp.asarray(rs.randn(b_, nh, n, hd).astype(np.float32))
    bias = jnp.asarray(rs.randn(nh, n, n).astype(np.float32) * 0.1)
    mask = np.zeros((nw, n, n), np.float32)
    mask[::2, : n // 2, n // 2:] = -100.0   # some shifted windows
    mask = jnp.asarray(mask)
    scale = hd ** -0.5

    ref = window_attention_reference(q, k, v, bias, mask, nw, scale)
    out = fused_window_attention(q, k, v, bias, mask, nw, scale,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


from tests.conftest import requires_reference


@requires_reference
def test_swin_parity_with_pallas_path(monkeypatch):
    """Full VideoSwin forward with the fused kernel (interpret mode) must
    still match the torch reference."""
    monkeypatch.setenv("EMVM_PALLAS_INTERPRET", "1")
    from tests.test_video_swin_parity import _parity_case
    from empirical_mvm_tpu.core.config import SwinConfig
    cfg = SwinConfig(embed_dim=32, depths=(2, 2), num_heads=(2, 4),
                     drop_path_rate=0.0, use_pallas_attention=True)
    _parity_case(cfg, (2, 4, 64, 64))


def test_kernel_vjp_matches_reference_grads():
    """Custom-VJP backward (recompute in VMEM) vs autodiff of the XLA path."""
    rs = np.random.RandomState(0)
    nh, n, hd, nw, b = 4, 49, 16, 4, 2
    b_ = b * nw
    q = jnp.asarray(rs.randn(b_, nh, n, hd).astype(np.float32))
    k = jnp.asarray(rs.randn(b_, nh, n, hd).astype(np.float32))
    v = jnp.asarray(rs.randn(b_, nh, n, hd).astype(np.float32))
    bias = jnp.asarray(rs.randn(nh, n, n).astype(np.float32) * 0.1)
    mask = np.zeros((nw, n, n), np.float32)
    mask[1::2, :10, 10:] = -100.0
    mask = jnp.asarray(mask)
    scale = hd ** -0.5
    tgt = jnp.asarray(rs.randn(b_, nh, n, hd).astype(np.float32))

    def loss_pal(q, k, v, bias):
        o = fused_window_attention(q, k, v, bias, mask, nw, scale, True)
        return jnp.sum((o - tgt) ** 2)

    def loss_ref(q, k, v, bias):
        o = window_attention_reference(q, k, v, bias, mask, nw, scale)
        return jnp.sum((o - tgt) ** 2)

    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b2, name in zip(g_pal, g_ref, "qkv b"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                   atol=3e-4, rtol=1e-3, err_msg=name)


def _pack(q, k, v):
    """(B_, nH, N, hd) triple -> (B_, 3*nH, N, hd) packed qkv (dim-1 order
    (3, nH), ref visbackbone/video_swin.py:147)."""
    return jnp.concatenate([q, k, v], axis=1)


@pytest.mark.parametrize("nh,n,hd,nw", [(4, 196, 32, 8), (2, 49, 16, 4),
                                        (8, 196, 32, 1)])
def test_packed_kernel_matches_reference(nh, n, hd, nw):
    from empirical_mvm_tpu.ops.window_attention import packed_window_attention
    rs = np.random.RandomState(0)
    b_ = 2 * nw
    q = jnp.asarray(rs.randn(b_, nh, n, hd).astype(np.float32))
    k = jnp.asarray(rs.randn(b_, nh, n, hd).astype(np.float32))
    v = jnp.asarray(rs.randn(b_, nh, n, hd).astype(np.float32))
    bias = jnp.asarray(rs.randn(nh, n, n).astype(np.float32) * 0.1)
    mask = np.zeros((nw, n, n), np.float32)
    mask[::2, : n // 2, n // 2:] = -100.0
    mask = jnp.asarray(mask)
    scale = hd ** -0.5

    ref = window_attention_reference(q, k, v, bias, mask, nw, scale)
    out = packed_window_attention(_pack(q, k, v), bias, mask, nw, nh, scale,
                                  True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_packed_kernel_vjp_matches_reference_grads():
    from empirical_mvm_tpu.ops.window_attention import packed_window_attention
    rs = np.random.RandomState(1)
    nh, n, hd, nw, b = 4, 49, 16, 4, 2
    b_ = b * nw
    q = jnp.asarray(rs.randn(b_, nh, n, hd).astype(np.float32))
    k = jnp.asarray(rs.randn(b_, nh, n, hd).astype(np.float32))
    v = jnp.asarray(rs.randn(b_, nh, n, hd).astype(np.float32))
    bias = jnp.asarray(rs.randn(nh, n, n).astype(np.float32) * 0.1)
    mask = np.zeros((nw, n, n), np.float32)
    mask[1::2, :10, 10:] = -100.0
    mask = jnp.asarray(mask)
    scale = hd ** -0.5
    tgt = jnp.asarray(rs.randn(b_, nh, n, hd).astype(np.float32))

    def loss_pk(qkv, bias):
        o = packed_window_attention(qkv, bias, mask, nw, nh, scale, True)
        return jnp.sum((o - tgt) ** 2)

    def loss_ref(qkv, bias):
        o = window_attention_reference(qkv[:, :nh], qkv[:, nh:2 * nh],
                                       qkv[:, 2 * nh:], bias, mask, nw,
                                       scale)
        return jnp.sum((o - tgt) ** 2)

    qkv = _pack(q, k, v)
    g_pk = jax.grad(loss_pk, argnums=(0, 1))(qkv, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(qkv, bias)
    for a, b2, name in zip(g_pk, g_ref, ("qkv", "bias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                   atol=3e-4, rtol=1e-3, err_msg=name)


def test_fused_self_attention_matches_bert_layer(monkeypatch):
    """BertSelfAttention with the fused kernel (interpret, no dropout) must
    match the XLA einsum path bit-for-tolerance, including per-row masks."""
    monkeypatch.setenv("EMVM_PALLAS_INTERPRET", "1")
    import dataclasses

    from empirical_mvm_tpu.core.config import BertConfig
    from empirical_mvm_tpu.models.bert import (BertSelfAttention,
                                               extended_attention_mask)

    cfg = BertConfig(hidden_size=64, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=128)
    rs = np.random.RandomState(0)
    b, l = 4, 24
    x = jnp.asarray(rs.randn(b, l, 64).astype(np.float32))
    mask01 = np.ones((b, l), np.int32)
    mask01[1, 17:] = 0
    mask01[3, 5:] = 0
    bias = extended_attention_mask(jnp.asarray(mask01))

    ref_mod = BertSelfAttention(cfg, dtype=jnp.float32)
    params = ref_mod.init(jax.random.PRNGKey(0), x, bias)["params"]
    ref, _ = ref_mod.apply({"params": params}, x, bias, True)

    pal_mod = BertSelfAttention(
        dataclasses.replace(cfg, use_pallas_attention=True),
        dtype=jnp.float32)
    out, _ = pal_mod.apply({"params": params}, x, bias, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)

    # seq2seq 3D mask variant (caption/smtm path)
    m3 = np.tril(np.ones((l, l), np.int32))[None].repeat(b, 0)
    bias3 = extended_attention_mask(jnp.asarray(m3))
    ref3, _ = ref_mod.apply({"params": params}, x, bias3, True)
    out3, _ = pal_mod.apply({"params": params}, x, bias3, True)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(ref3),
                               atol=2e-5, rtol=1e-4)


def test_fused_self_attention_dropout_grads_consistent():
    """With dropout active, fwd and bwd must see the SAME mask (the bwd
    recomputes it from the same seed). Extract the dropped probs pd exactly
    by feeding identity-valued v blocks, then check dv == pd^T @ do.
    (Finite differences are useless here: the MXU's bf16 rounding noise on a
    large loss dwarfs a small directional derivative.)"""
    if jax.default_backend() != "tpu":
        pytest.skip("in-kernel PRNG requires the TPU backend")
    from empirical_mvm_tpu.ops.window_attention import fused_self_attention
    rs = np.random.RandomState(0)
    b, nh, n, hd = 2, 2, 16, 8
    q = jnp.asarray(rs.randn(b, nh, n, hd).astype(np.float32))
    k = jnp.asarray(rs.randn(b, nh, n, hd).astype(np.float32))
    v = jnp.asarray(rs.randn(b, nh, n, hd).astype(np.float32))
    mask = jnp.zeros((b, n, n), jnp.float32)
    seed = jnp.asarray([123], jnp.int32)
    f = jax.jit(lambda v: fused_self_attention(q, k, v, mask, seed,
                                               hd ** -0.5, 0.5))
    e1 = np.zeros((b, nh, n, hd), np.float32)
    e1[:, :, :hd, :] = np.eye(hd)
    e2 = np.zeros((b, nh, n, hd), np.float32)
    e2[:, :, hd:, :] = np.eye(hd)
    pd = np.concatenate([np.asarray(f(jnp.asarray(e1))),
                         np.asarray(f(jnp.asarray(e2)))], axis=-1)
    zero_frac = (pd == 0).mean()
    assert 0.4 < zero_frac < 0.6, zero_frac        # ~p_drop of probs dropped

    o = np.asarray(f(v))
    np.testing.assert_allclose(o, np.einsum("bhqk,bhkd->bhqd", pd,
                                            np.asarray(v)),
                               atol=1e-2)          # fwd consistent with pd
    dv_ref = np.einsum("bhqk,bhqd->bhkd", pd, 2 * o)
    g = np.asarray(jax.jit(jax.grad(lambda v: jnp.sum(f(v) ** 2)))(v))
    np.testing.assert_allclose(g, dv_ref, atol=5e-2)   # bwd used same mask


def test_superwindow_fold_matches_unfolded(monkeypatch):
    """Per-frame 2D swin (window (1,7,7), T=4): the fused path folds 4
    temporal slices into one N=196 superwindow with an exact block-diagonal
    mask. Outputs must match the unfolded XLA path (which never folds)."""
    monkeypatch.setenv("EMVM_PALLAS_INTERPRET", "1")
    import dataclasses

    import jax
    import jax.numpy as jnp

    from empirical_mvm_tpu.core.config import SwinConfig
    from empirical_mvm_tpu.models.video_swin import SwinTransformer3D

    cfg = SwinConfig(patch_size=(1, 4, 4), embed_dim=16, depths=(2, 2),
                     num_heads=(2, 4), window_size=(1, 7, 7),
                     drop_path_rate=0.0, final_norm=False)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 4, 56, 56, 3),
                    jnp.float32)
    m_ref = SwinTransformer3D(config=dataclasses.replace(
        cfg, use_pallas_attention=False))
    m_fused = SwinTransformer3D(config=dataclasses.replace(
        cfg, use_pallas_attention=True))
    params = m_ref.init(jax.random.PRNGKey(0), x)["params"]
    ref = m_ref.apply({"params": params}, x)
    out = m_fused.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# Lane-sliced kernels (round 3): consume the qkv GEMM output (B_, N, 3C)
# directly, heads split in-kernel (ops/window_attention.py lane_* entries).
# ---------------------------------------------------------------------------


def _to_x3(q, k, v):
    """(B_, nH, N, hd) triple -> (B_, N, 3C) qkv-GEMM-output layout
    (last axis ordered (3, nH, hd))."""
    b_, nh, n, hd = q.shape
    flat = lambda a: a.transpose(0, 2, 1, 3).reshape(b_, n, nh * hd)
    return jnp.concatenate([flat(q), flat(k), flat(v)], axis=-1)


@pytest.mark.parametrize("nh,n,hd,nw", [(4, 49, 32, 4), (4, 196, 32, 1),
                                        (8, 49, 32, 2)])
def test_lane_kernel_matches_reference(nh, n, hd, nw):
    from empirical_mvm_tpu.ops.window_attention import lane_window_attention
    rs = np.random.RandomState(0)
    b_ = 2 * nw
    q = jnp.asarray(rs.randn(b_, nh, n, hd).astype(np.float32))
    k = jnp.asarray(rs.randn(b_, nh, n, hd).astype(np.float32))
    v = jnp.asarray(rs.randn(b_, nh, n, hd).astype(np.float32))
    bias = jnp.asarray(rs.randn(nh, n, n).astype(np.float32) * 0.1)
    mask = np.zeros((nw, n, n), np.float32)
    mask[::2, : n // 2, n // 2:] = -100.0
    mask = jnp.asarray(mask)
    scale = hd ** -0.5

    ref = window_attention_reference(q, k, v, bias, mask, nw, scale)
    b2, nh2, n2, hd2 = ref.shape
    ref_flat = ref.transpose(0, 2, 1, 3).reshape(b2, n2, nh2 * hd2)
    out = lane_window_attention(_to_x3(q, k, v), bias, mask, nw, nh, scale,
                                True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_flat),
                               atol=2e-5, rtol=1e-4)


def test_lane_kernel_vjp_matches_reference_grads():
    from empirical_mvm_tpu.ops.window_attention import lane_window_attention
    rs = np.random.RandomState(1)
    nh, n, hd, nw, b = 4, 49, 32, 4, 2
    b_ = b * nw
    c = nh * hd
    x3 = jnp.asarray(rs.randn(b_, n, 3 * c).astype(np.float32) * 0.3)
    bias = jnp.asarray(rs.randn(nh, n, n).astype(np.float32) * 0.1)
    mask = np.zeros((nw, n, n), np.float32)
    mask[1::2, :10, 10:] = -100.0
    mask = jnp.asarray(mask)
    scale = hd ** -0.5
    tgt = jnp.asarray(rs.randn(b_, n, c).astype(np.float32))

    def loss_lane(x3, bias):
        o = lane_window_attention(x3, bias, mask, nw, nh, scale, True)
        return jnp.sum((o - tgt) ** 2)

    def loss_ref(x3, bias):
        qkv = x3.reshape(b_, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        o = window_attention_reference(qkv[0], qkv[1], qkv[2], bias, mask,
                                       nw, scale)
        o = o.transpose(0, 2, 1, 3).reshape(b_, n, c)
        return jnp.sum((o - tgt) ** 2)

    g_l = jax.grad(loss_lane, argnums=(0, 1))(x3, bias)
    g_r = jax.grad(loss_ref, argnums=(0, 1))(x3, bias)
    for a, b2, name in zip(g_l, g_r, ("x3", "bias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                   atol=3e-4, rtol=1e-3, err_msg=name)


def test_lane_self_attention_matches_bert_layer(monkeypatch):
    """BertSelfAttention at a 128-divisible width routes through
    lane_self_attention; it must match the XLA einsum path (per-row padding
    masks and the 3D seq2seq mask)."""
    monkeypatch.setenv("EMVM_PALLAS_INTERPRET", "1")
    import dataclasses

    from empirical_mvm_tpu.core.config import BertConfig
    from empirical_mvm_tpu.models.bert import (BertSelfAttention,
                                               extended_attention_mask)

    cfg = BertConfig(hidden_size=128, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=256)
    rs = np.random.RandomState(0)
    b, l = 4, 24
    x = jnp.asarray(rs.randn(b, l, 128).astype(np.float32))
    mask01 = np.ones((b, l), np.int32)
    mask01[1, 17:] = 0
    mask01[3, 5:] = 0
    bias = extended_attention_mask(jnp.asarray(mask01))

    ref_mod = BertSelfAttention(cfg, dtype=jnp.float32)
    params = ref_mod.init(jax.random.PRNGKey(0), x, bias)["params"]
    ref, _ = ref_mod.apply({"params": params}, x, bias, True)

    pal_mod = BertSelfAttention(
        dataclasses.replace(cfg, use_pallas_attention=True),
        dtype=jnp.float32)
    out, _ = pal_mod.apply({"params": params}, x, bias, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)

    m3 = np.tril(np.ones((l, l), np.int32))[None].repeat(b, 0)
    bias3 = extended_attention_mask(jnp.asarray(m3))
    ref3, _ = ref_mod.apply({"params": params}, x, bias3, True)
    out3, _ = pal_mod.apply({"params": params}, x, bias3, True)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(ref3),
                               atol=2e-5, rtol=1e-4)


def test_lane_swin_module_matches_xla(monkeypatch):
    """SwinTransformer3D at 128-divisible widths (the real stages) routes
    window attention through the lane kernel; outputs and input grads must
    match the pure-XLA module."""
    monkeypatch.setenv("EMVM_PALLAS_INTERPRET", "1")
    import dataclasses

    from empirical_mvm_tpu.core.config import SwinConfig
    from empirical_mvm_tpu.models.video_swin import SwinTransformer3D

    cfg = SwinConfig(patch_size=(2, 4, 4), embed_dim=128, depths=(2, 2),
                     num_heads=(4, 8), window_size=(8, 7, 7),
                     drop_path_rate=0.0, final_norm=False)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 2, 28, 28, 3),
                    jnp.float32)
    m_ref = SwinTransformer3D(config=dataclasses.replace(
        cfg, use_pallas_attention=False))
    m_lane = SwinTransformer3D(config=dataclasses.replace(
        cfg, use_pallas_attention=True))
    params = m_ref.init(jax.random.PRNGKey(0), x)["params"]
    ref = m_ref.apply({"params": params}, x)
    out = m_lane.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)

    g_ref = jax.grad(lambda xx: jnp.sum(
        m_ref.apply({"params": params}, xx) ** 2))(x)
    g_out = jax.grad(lambda xx: jnp.sum(
        m_lane.apply({"params": params}, xx) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref),
                               atol=3e-3, rtol=1e-2)


def test_lane_kernel_resident_mask_multi_period(monkeypatch):
    """Round-4 change: g may exceed the shift-mask period n_windows (the
    whole mask goes VMEM-resident and the kernel tile-adds it). Force a
    budget where _lane_g picks g = k*nw (k > 1) and check fwd + grads
    against the XLA reference."""
    monkeypatch.setenv("EMVM_LANE_BUDGET_MB", "64")
    from empirical_mvm_tpu.ops.window_attention import (
        _lane_g, lane_window_attention)
    rs = np.random.RandomState(2)
    nh, n, hd, nw, b = 4, 49, 32, 4, 8
    b_ = b * nw
    c = nh * hd
    assert _lane_g(b_, n, c, nh, nw, backward=False) > nw
    assert _lane_g(b_, n, c, nh, nw, backward=True) > nw
    x3 = jnp.asarray(rs.randn(b_, n, 3 * c).astype(np.float32) * 0.3)
    bias = jnp.asarray(rs.randn(nh, n, n).astype(np.float32) * 0.1)
    mask = np.zeros((nw, n, n), np.float32)
    mask[1::2, :10, 10:] = -100.0
    mask = jnp.asarray(mask)
    scale = hd ** -0.5
    tgt = jnp.asarray(rs.randn(b_, n, c).astype(np.float32))

    def loss_lane(x3, bias):
        o = lane_window_attention(x3, bias, mask, nw, nh, scale, True)
        return jnp.sum((o - tgt) ** 2)

    def loss_ref(x3, bias):
        qkv = x3.reshape(b_, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        o = window_attention_reference(qkv[0], qkv[1], qkv[2], bias, mask,
                                       nw, scale)
        o = o.transpose(0, 2, 1, 3).reshape(b_, n, c)
        return jnp.sum((o - tgt) ** 2)

    np.testing.assert_allclose(
        np.asarray(loss_lane(x3, bias)), np.asarray(loss_ref(x3, bias)),
        rtol=1e-4)
    g_l = jax.grad(loss_lane, argnums=(0, 1))(x3, bias)
    g_r = jax.grad(loss_ref, argnums=(0, 1))(x3, bias)
    for a, b2, name in zip(g_l, g_r, ("x3", "bias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                   atol=3e-4, rtol=1e-3, err_msg=name)


def test_lane_kernel_packed_bwd_fallback(monkeypatch):
    """Round-4 change: when the lane backward doesn't fit VMEM at g=1 (swin
    stage 3's resident dbias twin), _lane_bwd reroutes through the packed
    kernel on a transposed view while the forward stays lane. Force the
    budget between the fwd and bwd footprints and check grads."""
    monkeypatch.setenv("EMVM_LANE_BUDGET_MB", "2")
    from empirical_mvm_tpu.ops.window_attention import (
        _lane_budget, _lane_bytes, lane_window_attention)
    nh, n, hd, nw = 8, 49, 128, 4
    b_ = nw
    c = nh * hd
    assert _lane_bytes(1, n, c, nh, backward=False, itemsize=4,
                       n_windows=nw) <= _lane_budget()
    assert _lane_bytes(1, n, c, nh, backward=True, itemsize=4,
                       n_windows=nw) > _lane_budget()
    rs = np.random.RandomState(3)
    x3 = jnp.asarray(rs.randn(b_, n, 3 * c).astype(np.float32) * 0.3)
    bias = jnp.asarray(rs.randn(nh, n, n).astype(np.float32) * 0.1)
    mask = np.zeros((nw, n, n), np.float32)
    mask[1::2, :10, 10:] = -100.0
    mask = jnp.asarray(mask)
    scale = hd ** -0.5
    tgt = jnp.asarray(rs.randn(b_, n, c).astype(np.float32))

    def loss_lane(x3, bias):
        o = lane_window_attention(x3, bias, mask, nw, nh, scale, True)
        return jnp.sum((o - tgt) ** 2)

    def loss_ref(x3, bias):
        qkv = x3.reshape(b_, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        o = window_attention_reference(qkv[0], qkv[1], qkv[2], bias, mask,
                                       nw, scale)
        o = o.transpose(0, 2, 1, 3).reshape(b_, n, c)
        return jnp.sum((o - tgt) ** 2)

    g_l = jax.grad(loss_lane, argnums=(0, 1))(x3, bias)
    g_r = jax.grad(loss_ref, argnums=(0, 1))(x3, bias)
    for a, b2, name in zip(g_l, g_r, ("x3", "bias")):
        # hd=128 dot sums: f32 summation-order noise reaches ~8e-4 on O(3)
        # gradient entries
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                   atol=1.5e-3, rtol=1e-2, err_msg=name)


def test_lane_kernel_tsliced_matches_unfolded_swin(monkeypatch):
    """Round-4 t-sliced lane path: per-frame 2D swin (window (1,7,7), T=4,
    C=128 so the lane kernel engages) folds 4 temporal slices into one
    superwindow LAYOUT but computes per-slice (49, 49) attention via a t
    grid dimension — no -1e9 score inflation. Outputs and grads (incl. the
    rel-pos bias table through the t-sliced dbias accumulation) must match
    the unfolded XLA path."""
    monkeypatch.setenv("EMVM_PALLAS_INTERPRET", "1")
    import dataclasses

    from empirical_mvm_tpu.core.config import SwinConfig
    from empirical_mvm_tpu.models.video_swin import SwinTransformer3D

    cfg = SwinConfig(patch_size=(1, 4, 4), embed_dim=128, depths=(2,),
                     num_heads=(4,), window_size=(1, 7, 7),
                     drop_path_rate=0.0, final_norm=False)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 4, 56, 56, 3),
                    jnp.float32)
    m_ref = SwinTransformer3D(config=dataclasses.replace(
        cfg, use_pallas_attention=False))
    m_fused = SwinTransformer3D(config=dataclasses.replace(
        cfg, use_pallas_attention=True))
    params = m_ref.init(jax.random.PRNGKey(0), x)["params"]

    # the lane t-sliced path must actually engage (C=128 fits)
    from empirical_mvm_tpu.ops.window_attention import lane_attention_fits
    assert lane_attention_fits(64, 49, 128, 4, 4)

    ref = m_ref.apply({"params": params}, x)
    out = m_fused.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)

    loss_ref = jax.grad(lambda p: jnp.sum(
        m_ref.apply({"params": p}, x) ** 2))(params)
    loss_fus = jax.grad(lambda p: jnp.sum(
        m_fused.apply({"params": p}, x) ** 2))(params)
    flat_r = jax.tree_util.tree_leaves_with_path(loss_ref)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(loss_fus))
    for path, g_r in flat_r:
        g_f = flat_f[path]
        np.testing.assert_allclose(
            np.asarray(g_f), np.asarray(g_r), atol=3e-3, rtol=1e-2,
            err_msg=jax.tree_util.keystr(path))


def test_direct_kernel_matches_reference():
    """Round-5 5D-direct path: direct_window_attention on the native
    (B, D, Hp, Wp, 3C) layout must equal partition -> reference oracle ->
    reverse, for outputs and (x3, bias) grads (the direct backward
    repartitions internally through the lane backward)."""
    from empirical_mvm_tpu.models.video_swin import (window_partition,
                                                     window_reverse)
    from empirical_mvm_tpu.ops.window_attention import (
        direct_attention_fits, direct_window_attention)
    rs = np.random.RandomState(0)
    b, d, hp, wp, c, nh = 2, 2, 6, 9, 128, 4
    win = (2, 3, 3)
    n = 2 * 3 * 3
    nw = (hp // 3) * (wp // 3)
    hd = c // nh
    x3 = jnp.asarray(rs.randn(b, d, hp, wp, 3 * c).astype(np.float32) * 0.3)
    bias = jnp.asarray(rs.randn(nh, n, n).astype(np.float32) * 0.1)
    mask = np.zeros((nw, n, n), np.float32)
    mask[1::2, : n // 2, n // 2:] = -100.0
    mask = jnp.asarray(mask)
    scale = hd ** -0.5
    assert direct_attention_fits(b, d, hp, wp, c, nh, win)
    tgt = jnp.asarray(rs.randn(b, d, hp, wp, c).astype(np.float32))

    def loss_direct(x3, bias):
        o = direct_window_attention(x3, bias, mask, win, nh, scale, True)
        return jnp.sum((o - tgt) ** 2), o

    def loss_ref(x3, bias):
        xw = window_partition(x3, win)
        b_ = xw.shape[0]
        qkv = xw.reshape(b_, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        o = window_attention_reference(qkv[0], qkv[1], qkv[2], bias, mask,
                                       nw, scale)
        o = o.transpose(0, 2, 1, 3).reshape(b_, n, c)
        o = window_reverse(o, win, b, d, hp, wp)
        return jnp.sum((o - tgt) ** 2), o

    (l_d, o_d), g_d = jax.value_and_grad(loss_direct, argnums=(0, 1),
                                         has_aux=True)(x3, bias)
    (l_r, o_r), g_r = jax.value_and_grad(loss_ref, argnums=(0, 1),
                                         has_aux=True)(x3, bias)
    np.testing.assert_allclose(np.asarray(o_d), np.asarray(o_r),
                               atol=2e-5, rtol=1e-4)
    for a, b2, name in zip(g_d, g_r, ("x3", "bias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                   atol=3e-4, rtol=1e-3, err_msg=name)


def test_direct_swin_matches_lane_swin(monkeypatch):
    """Full swin stage under EMVM_DIRECT_ATTN=1 (5D-direct kernel, shifted
    and unshifted blocks) must match the XLA einsum path."""
    monkeypatch.setenv("EMVM_PALLAS_INTERPRET", "1")
    import dataclasses

    from empirical_mvm_tpu.core.config import SwinConfig
    from empirical_mvm_tpu.models.video_swin import SwinTransformer3D

    cfg = SwinConfig(patch_size=(1, 4, 4), embed_dim=128, depths=(2,),
                     num_heads=(4,), window_size=(8, 7, 7),
                     drop_path_rate=0.0, final_norm=False)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 4, 56, 56, 3),
                    jnp.float32)
    m_ref = SwinTransformer3D(config=dataclasses.replace(
        cfg, use_pallas_attention=False))
    m_fused = SwinTransformer3D(config=dataclasses.replace(
        cfg, use_pallas_attention=True))
    params = m_ref.init(jax.random.PRNGKey(0), x)["params"]

    ref = m_ref.apply({"params": params}, x)
    monkeypatch.setenv("EMVM_DIRECT_ATTN", "1")
    out = m_fused.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)

    g_ref = jax.grad(lambda p: jnp.sum(
        m_ref.apply({"params": p}, x) ** 2))(params)
    g_dir = jax.grad(lambda p: jnp.sum(
        m_fused.apply({"params": p}, x) ** 2))(params)
    flat_r = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_d = dict(jax.tree_util.tree_leaves_with_path(g_dir))
    for path, gr in flat_r:
        np.testing.assert_allclose(
            np.asarray(flat_d[path]), np.asarray(gr), atol=3e-3, rtol=1e-2,
            err_msg=jax.tree_util.keystr(path))
