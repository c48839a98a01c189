"""Parity tests for the fused LayerNorm Pallas kernel (interpret mode on
CPU) against the fp32 XLA oracle, plus the flax drop-in's checkpoint
compatibility with nn.LayerNorm."""

import numpy as np
import pytest

import tests.conftest  # noqa: F401

import jax
import jax.numpy as jnp

from empirical_mvm_tpu.ops.layernorm import (
    FusedLayerNorm, fused_layer_norm, layer_norm_reference)


@pytest.mark.parametrize("shape,eps", [
    ((6, 196, 128), 1e-5),      # swin stage-0 windows
    ((4, 232, 768), 1e-12),     # BERT fusion rows
    ((3136, 1024), 1e-5),       # swin stage-3 rows (row block must shrink)
])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_matches_oracle(shape, eps, dtype):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(*shape), dtype)
    c = shape[-1]
    g = jnp.asarray(1.0 + 0.1 * rs.randn(c), jnp.float32)
    b = jnp.asarray(0.1 * rs.randn(c), jnp.float32)
    ref = layer_norm_reference(x, g, b, eps)
    out = fused_layer_norm(x, g, b, eps, True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=(1e-5 if dtype == jnp.float32 else 1e-2), rtol=1e-4)


def test_vjp_matches_oracle_grads():
    rs = np.random.RandomState(1)
    shape, eps = (8, 49, 256), 1e-5
    x = jnp.asarray(rs.randn(*shape), jnp.float32)
    g = jnp.asarray(1.0 + 0.1 * rs.randn(shape[-1]), jnp.float32)
    b = jnp.asarray(0.1 * rs.randn(shape[-1]), jnp.float32)
    cot = jnp.asarray(rs.randn(*shape), jnp.float32)

    def loss_k(x, g, b):
        return jnp.sum(fused_layer_norm(x, g, b, eps, True) * cot)

    def loss_r(x, g, b):
        return jnp.sum(layer_norm_reference(x, g, b, eps) * cot)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, g, b)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, g, b)
    for a, e in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   atol=2e-4, rtol=1e-3)


def test_module_param_tree_matches_nn_layernorm():
    """FusedLayerNorm must produce the exact ('scale','bias') tree of
    nn.LayerNorm so existing checkpoints/importers keep working."""
    from flax import linen as nn
    x = jnp.ones((2, 5, 128), jnp.float32)
    p_f = FusedLayerNorm(epsilon=1e-5).init(jax.random.PRNGKey(0), x)
    p_n = nn.LayerNorm(epsilon=1e-5).init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p_f) == \
        jax.tree_util.tree_structure(p_n)
    shapes_f = jax.tree.map(lambda a: a.shape, p_f)
    shapes_n = jax.tree.map(lambda a: a.shape, p_n)
    assert shapes_f == shapes_n


def test_module_fallback_matches_nn_layernorm_numerics():
    """Off-TPU (no interpret env), the module runs the fp32 oracle, which
    must match nn.LayerNorm's fp32 output."""
    from flax import linen as nn
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(4, 7, 384), jnp.float32)
    m_f = FusedLayerNorm(epsilon=1e-5)
    m_n = nn.LayerNorm(epsilon=1e-5)
    p = m_n.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(m_f.apply(p, x)), np.asarray(m_n.apply(p, x)),
        atol=1e-5, rtol=1e-5)


def test_kernel_path_in_module(monkeypatch):
    """With EMVM_PALLAS_INTERPRET the module takes the kernel path and still
    matches the oracle."""
    monkeypatch.setenv("EMVM_PALLAS_INTERPRET", "1")
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(4, 49, 128), jnp.bfloat16)
    m = FusedLayerNorm(epsilon=1e-5, dtype=jnp.bfloat16)
    p = m.init(jax.random.PRNGKey(0), x)
    got = m.apply(p, x)
    want = layer_norm_reference(x, p["params"]["scale"],
                                p["params"]["bias"], 1e-5)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=1e-2, rtol=1e-2)


def test_dot_layer_norm_matches_nn_layernorm_fwd_and_grads():
    """DotLayerNorm (the kept EMVM_DOT_LN=1 probe — a measured net loss as a
    default, see ops/layernorm.py) must stay numerically a LayerNorm: fp32
    fwd and grads match flax nn.LayerNorm."""
    from flax import linen as nn

    from empirical_mvm_tpu.ops.layernorm import dot_layer_norm

    rs = np.random.RandomState(4)
    x = jnp.asarray(rs.randn(2, 3, 7, 7, 128).astype(np.float32) * 3 + 1.5)
    g = jnp.asarray(rs.randn(128), jnp.float32)
    b = jnp.asarray(rs.randn(128), jnp.float32)
    ref_mod = nn.LayerNorm(epsilon=1e-5)
    p = {"params": {"scale": g, "bias": b}}
    np.testing.assert_allclose(
        np.asarray(dot_layer_norm(x, g, b, 1e-5, jnp.float32)),
        np.asarray(ref_mod.apply(p, x)), atol=2e-5, rtol=1e-5)

    def loss(fn):
        return lambda x, g, b: jnp.sum(jnp.sin(fn(x, g, b)))

    gr = jax.grad(loss(lambda x, g, b: ref_mod.apply(
        {"params": {"scale": g, "bias": b}}, x)), argnums=(0, 1, 2))(x, g, b)
    gd = jax.grad(loss(lambda x, g, b: dot_layer_norm(
        x, g, b, 1e-5, jnp.float32)), argnums=(0, 1, 2))(x, g, b)
    for a, c in zip(gr, gd):
        scale = max(float(jnp.max(jnp.abs(a))), 1.0)
        np.testing.assert_allclose(np.asarray(c) / scale,
                                   np.asarray(a) / scale, atol=2e-6)
