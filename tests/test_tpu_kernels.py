"""On-chip Pallas kernel parity suite (VERDICT r2 item 6).

Runs the real Mosaic-compiled kernels (interpret=False) against the XLA
oracles ON THE TPU BACKEND. The CPU suite runs these kernels only in
interpreter mode, which cannot catch Mosaic lowering/compile regressions
(a channel-last kernel variant once passed every CPU test and crashed the
Mosaic compiler — round-1 finding).

Run:  EMVM_TPU_TESTS=1 python -m pytest -m tpu -q
(alone — never concurrently with a TPU bench; see BENCH_LOCAL_r2.txt).

Off-TPU (the default CI run pins the CPU backend) every test here skips.
"""

import dataclasses

import numpy as np
import pytest

import tests.conftest  # noqa: F401

import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(jax.default_backend() != "tpu",
                       reason="real-chip kernel suite (EMVM_TPU_TESTS=1)"),
]

# bf16 MXU matmuls: tolerances are bf16-rounding-scale, not fp32
_ATOL = 5e-2


def test_packed_window_attention_on_chip():
    from empirical_mvm_tpu.ops.window_attention import (
        packed_window_attention, window_attention_reference)
    rs = np.random.RandomState(0)
    nh, n, hd, nw, b = 4, 196, 32, 8, 2
    b_ = b * nw
    qkv = jnp.asarray(rs.randn(b_, 3 * nh, n, hd).astype(np.float32))
    bias = jnp.asarray(rs.randn(nh, n, n).astype(np.float32) * 0.1)
    mask = np.zeros((nw, n, n), np.float32)
    mask[::2, : n // 2, n // 2:] = -100.0
    mask = jnp.asarray(mask)
    scale = hd ** -0.5
    q, k, v = qkv[:, :nh], qkv[:, nh:2 * nh], qkv[:, 2 * nh:]

    out = jax.jit(lambda qkv: packed_window_attention(
        qkv, bias, mask, nw, nh, scale))(qkv)
    ref = window_attention_reference(q, k, v, bias, mask, nw, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=_ATOL, rtol=1e-2)


def test_packed_window_attention_vjp_on_chip():
    from empirical_mvm_tpu.ops.window_attention import (
        packed_window_attention, window_attention_reference)
    rs = np.random.RandomState(1)
    nh, n, hd, nw, b = 4, 196, 32, 8, 1
    b_ = b * nw
    qkv = jnp.asarray(rs.randn(b_, 3 * nh, n, hd).astype(np.float32))
    bias = jnp.asarray(rs.randn(nh, n, n).astype(np.float32) * 0.1)
    mask = jnp.zeros((nw, n, n), jnp.float32)
    cot = jnp.asarray(rs.randn(b_, nh, n, hd).astype(np.float32))
    scale = hd ** -0.5

    def loss_k(qkv, bias):
        return jnp.sum(packed_window_attention(
            qkv, bias, mask, nw, nh, scale) * cot)

    def loss_r(qkv, bias):
        q, k, v = qkv[:, :nh], qkv[:, nh:2 * nh], qkv[:, 2 * nh:]
        return jnp.sum(window_attention_reference(
            q, k, v, bias, mask, nw, scale) * cot)

    gk = jax.jit(jax.grad(loss_k, argnums=(0, 1)))(qkv, bias)
    gr = jax.jit(jax.grad(loss_r, argnums=(0, 1)))(qkv, bias)
    for a, e in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   atol=_ATOL, rtol=1e-2)


def test_packed_self_attention_on_chip():
    from empirical_mvm_tpu.ops.window_attention import packed_self_attention
    rs = np.random.RandomState(2)
    b, nh, n, hd = 4, 12, 232, 64
    qkv = jnp.asarray(rs.randn(b, 3 * nh, n, hd).astype(np.float32))
    mask = np.zeros((b, n, n), np.float32)
    mask[1, :, 200:] = -1e9
    mask = jnp.asarray(mask)
    seed = jnp.zeros((1,), jnp.int32)
    scale = hd ** -0.5

    out = jax.jit(lambda qkv: packed_self_attention(
        qkv, mask, seed, nh, scale, 0.0))(qkv)
    q, k, v = qkv[:, :nh], qkv[:, nh:2 * nh], qkv[:, 2 * nh:]
    s = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k) + mask[:, None]
    ref = jnp.einsum("bhnm,bhmd->bhnd", jax.nn.softmax(s, axis=-1), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=_ATOL, rtol=1e-2)


def test_fused_layer_norm_on_chip():
    from empirical_mvm_tpu.ops.layernorm import (fused_layer_norm,
                                                 layer_norm_reference)
    rs = np.random.RandomState(3)
    for shape, eps, dtype in [((6, 196, 128), 1e-5, jnp.bfloat16),
                              ((64, 232, 768), 1e-12, jnp.bfloat16),
                              ((3136, 1024), 1e-5, jnp.float32)]:
        x = jnp.asarray(rs.randn(*shape), dtype)
        c = shape[-1]
        g = jnp.asarray(1 + 0.1 * rs.randn(c), jnp.float32)
        b = jnp.asarray(0.1 * rs.randn(c), jnp.float32)
        out = jax.jit(lambda x, g, b, e=eps: fused_layer_norm(x, g, b, e))(
            x, g, b)
        ref = layer_norm_reference(x, g, b, eps)
        tol = 5e-2 if dtype == jnp.bfloat16 else 1e-4
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=tol, rtol=tol)
        cot = jnp.asarray(rs.randn(*shape), jnp.float32)
        gk = jax.jit(jax.grad(
            lambda x, g, b, e=eps: jnp.sum(
                fused_layer_norm(x, g, b, e).astype(jnp.float32) * cot),
            argnums=(0, 1, 2)))(x, g, b)
        gr = jax.jit(jax.grad(
            lambda x, g, b, e=eps: jnp.sum(
                layer_norm_reference(x, g, b, e).astype(jnp.float32) * cot),
            argnums=(0, 1, 2)))(x, g, b)
        for a, e_ in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(e_, np.float32),
                                       atol=0.1, rtol=5e-2)


def test_in_kernel_dropout_grads_on_chip():
    """The previously TPU-skipped in-kernel-PRNG dropout test, as part of
    the -m tpu suite (VERDICT r2: the skip must disappear on the TPU host)."""
    from tests.test_window_attention_kernel import (
        test_fused_self_attention_dropout_grads_consistent)
    test_fused_self_attention_dropout_grads_consistent()
