"""Fused window attention Pallas kernel for Video Swin.

The reference computes window attention as separate cuDNN/cuBLAS calls with
the (B_, nH, N, N) attention matrix materialized in HBM
(ref: visbackbone/video_swin.py:147-172). On TPU that N x N intermediate is
the dominant HBM round-trip of the backbone (stage 0: ~B*64 windows x heads x
196^2 floats, written then re-read). This kernel keeps the whole
score -> +bias -> +shift-mask -> softmax -> @v chain in VMEM:

  grid = (B_,)  — one window per program, all heads in-program;
  q/k/v blocks (1, nH, N, hd) stream HBM->VMEM with double buffering;
  the relative-position bias (nH, N, N) stays resident in VMEM;
  the shift mask block (1, N, N) is indexed per window via the index map.

VMEM budget at the largest stage (nH=32, N=196): scores 32*196^2*4B ~= 4.9MB
+ qkv blocks ~1.2MB — comfortably under the ~16MB/core limit.

Falls back to the pure-XLA einsum path off-TPU (CPU tests run the kernel in
interpreter mode for parity).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref, *, scale):
    q = q_ref[0].astype(jnp.float32)          # (nH, N, hd)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0]

    s = jax.lax.dot_general(
        q * scale, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)    # (nH, N, N)
    s = s + bias_ref[...]                      # rel-pos bias (nH, N, N)
    s = s + mask_ref[0][None, :, :]            # shift mask (N, N)

    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jax.lax.dot_general(
        p, v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)    # (nH, N, hd)
    o_ref[0] = o.astype(o_ref.dtype)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, do_ref,
                     dq_ref, dk_ref, dv_ref, dbias_ref, *, scale):
    """Recompute-then-differentiate backward (flash-attention style, one
    window x one head-tile per program). The rel-pos-bias cotangent
    accumulates across the sequential grid into a single block."""
    b = pl.program_id(1)

    q = q_ref[0].astype(jnp.float32)          # (Hb, N, hd)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)

    s = jax.lax.dot_general(q * scale, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    s = s + bias_ref[...] + mask_ref[0][None, :, :]
    p = jax.nn.softmax(s, axis=-1)             # (Hb, N, N)

    # dv = p^T @ do
    dv = jax.lax.dot_general(p, do, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    # dp = do @ v^T
    dp = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))

    dq = jax.lax.dot_general(ds, k, (((2,), (1,)), ((0,), (0,)))) * scale
    dk = jax.lax.dot_general(ds, q, (((1,), (1,)), ((0,), (0,)))) * scale

    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)

    @pl.when(b == 0)
    def _():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    dbias_ref[...] += ds


def _head_tile(nh: int, n: int) -> int:
    """Largest head tile keeping the 4 (Hb, N, N) fp32 temporaries of the
    backward pass under ~8MB of VMEM."""
    budget = 8 * 1024 * 1024
    per_head = 4 * n * n * 4
    hb = max(1, min(nh, budget // per_head))
    while nh % hb:
        hb -= 1
    return hb


def _fwd_pallas(q, k, v, bias, mask, n_windows, scale, interpret):
    b_, nh, n, hd = q.shape
    hb = _head_tile(nh, n)
    n_ht = nh // hb
    flops = 2 * 2 * b_ * nh * n * n * hd
    qkv_spec = pl.BlockSpec((1, hb, n, hd), lambda ht, b: (b, ht, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=(n_ht, b_),
        in_specs=[
            qkv_spec, qkv_spec, qkv_spec,
            pl.BlockSpec((hb, n, n), lambda ht, b: (ht, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, n), lambda ht, b: (b % n_windows, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=3 * q.size * q.dtype.itemsize + q.size * 2,
            transcendentals=b_ * nh * n * n),
        interpret=interpret,
    )(q, k, v, bias, mask)


def _bwd_pallas(q, k, v, bias, mask, do, n_windows, scale, interpret):
    b_, nh, n, hd = q.shape
    hb = _head_tile(nh, n)
    n_ht = nh // hb
    qkv_spec = pl.BlockSpec((1, hb, n, hd), lambda ht, b: (b, ht, 0, 0),
                            memory_space=pltpu.VMEM)
    dq, dk, dv, dbias = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale),
        grid=(n_ht, b_),
        in_specs=[
            qkv_spec, qkv_spec, qkv_spec,
            pl.BlockSpec((hb, n, n), lambda ht, b: (ht, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, n), lambda ht, b: (b % n_windows, 0, 0),
                         memory_space=pltpu.VMEM),
            qkv_spec,
        ],
        out_specs=(qkv_spec, qkv_spec, qkv_spec,
                   pl.BlockSpec((hb, n, n), lambda ht, b: (ht, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(bias.shape, jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b_ * nh * n * n * hd,
            bytes_accessed=5 * q.size * q.dtype.itemsize,
            transcendentals=b_ * nh * n * n),
        interpret=interpret,
    )(q, k, v, bias, mask, do)
    return dq, dk, dv, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_window_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                           bias: jax.Array, mask: jax.Array,
                           n_windows: int, scale: float,
                           interpret: bool = False) -> jax.Array:
    """softmax(q k^T * scale + bias + mask) v, fused per window.

    Args:
      q, k, v: (B_, nH, N, hd) where B_ = batch * n_windows.
      bias:    (nH, N, N) fp32 relative-position bias (trainable -> has VJP).
      mask:    (n_windows, N, N) fp32 additive shift mask (constant).
    Returns:
      (B_, nH, N, hd) in q.dtype.
    """
    b_ = q.shape[0]
    assert b_ % n_windows == 0
    return _fwd_pallas(q, k, v, bias, mask, n_windows, scale, interpret)


def _fwa_fwd(q, k, v, bias, mask, n_windows, scale, interpret):
    out = _fwd_pallas(q, k, v, bias, mask, n_windows, scale, interpret)
    return out, (q, k, v, bias, mask)


def _fwa_bwd(n_windows, scale, interpret, res, do):
    q, k, v, bias, mask = res
    dq, dk, dv, dbias = _bwd_pallas(q, k, v, bias, mask, do, n_windows,
                                    scale, interpret)
    return dq, dk, dv, dbias, jnp.zeros_like(mask)


fused_window_attention.defvjp(_fwa_fwd, _fwa_bwd)


def window_attention_reference(q, k, v, bias, mask, n_windows, scale):
    """Pure-XLA path (also the numerical oracle for the kernel)."""
    b_, nh, n, hd = q.shape
    s = jnp.einsum("bhnd,bhmd->bhnm", q.astype(jnp.float32) * scale,
                   k.astype(jnp.float32))
    s = s + bias[None]
    m = jnp.broadcast_to(mask[None], (b_ // n_windows, n_windows, n, n))
    s = s + m.reshape(b_, 1, n, n)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)
