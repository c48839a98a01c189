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
def test_swin_parity_with_pallas_path():
    """Full VideoSwin forward with the fused kernel (interpret mode) must
    still match the torch reference."""
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
