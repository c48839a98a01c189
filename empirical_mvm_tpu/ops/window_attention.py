"""Fused window attention Pallas kernel for Video Swin.

The reference computes window attention as separate cuDNN/cuBLAS calls with
the (B_, nH, N, N) attention matrix materialized in HBM
(ref: visbackbone/video_swin.py:147-172). On TPU that N x N intermediate is
the dominant HBM round-trip of the backbone. This kernel keeps the whole
score -> +bias -> +shift-mask -> softmax -> @v chain in VMEM.

Layout: q/k/v/out live in HBM as **channel-last (B_, N, nH*hd)** — the lane
dimension is the full channel width (>=128), so buffers are unpadded. A
head-major (B_, nH, N, hd) layout pads hd=32 lanes to 128 (4.1x memory,
observed in XLA's OOM breakdown); heads are split *inside* the kernel where
the relayout is a cheap VMEM shuffle.

  grid = (head_tiles, B_): one window x one head-tile per program;
  per-head-tile bias (hb, N, N) stays VMEM-resident; the shift mask block
  (1, N, N) is selected per window via the index map.

Backward is a recompute-style custom VJP (flash-attention pattern); the
relative-position-bias cotangent accumulates across the sequential grid.
Falls back to interpreter mode off-TPU (CPU tests run the same kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _split_heads(ref_block, hb, hd):
    """(1, N, hb*hd) VMEM block -> (hb, N, hd) fp32."""
    x = ref_block[0]                       # (N, hb*hd)
    n = x.shape[0]
    return x.reshape(n, hb, hd).transpose(1, 0, 2).astype(jnp.float32)


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref, *,
                 scale, hb, hd):
    q = _split_heads(q_ref, hb, hd)        # (hb, N, hd)
    k = _split_heads(k_ref, hb, hd)
    v = _split_heads(v_ref, hb, hd)
    n = q.shape[1]

    s = jax.lax.dot_general(
        q * scale, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)    # (hb, N, N)
    s = s + bias_ref[...]
    s = s + mask_ref[0][None, :, :]

    p = jax.nn.softmax(s, axis=-1)
    o = jax.lax.dot_general(
        p, v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)    # (hb, N, hd)
    o_ref[0] = o.transpose(1, 0, 2).reshape(n, hb * hd).astype(o_ref.dtype)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, do_ref,
                     dq_ref, dk_ref, dv_ref, dbias_ref, *, scale, hb, hd):
    """Recompute-then-differentiate backward."""
    b = pl.program_id(1)

    q = _split_heads(q_ref, hb, hd)
    k = _split_heads(k_ref, hb, hd)
    v = _split_heads(v_ref, hb, hd)
    do = _split_heads(do_ref, hb, hd)
    n = q.shape[1]

    s = jax.lax.dot_general(q * scale, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    s = s + bias_ref[...] + mask_ref[0][None, :, :]
    p = jax.nn.softmax(s, axis=-1)             # (hb, N, N)

    dv = jax.lax.dot_general(p, do, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))

    dq = jax.lax.dot_general(ds, k, (((2,), (1,)), ((0,), (0,)))) * scale
    dk = jax.lax.dot_general(ds, q, (((1,), (1,)), ((0,), (0,)))) * scale

    pack = lambda x: x.transpose(1, 0, 2).reshape(n, hb * hd)
    dq_ref[0] = pack(dq).astype(dq_ref.dtype)
    dk_ref[0] = pack(dk).astype(dk_ref.dtype)
    dv_ref[0] = pack(dv).astype(dv_ref.dtype)

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


def _specs(n, c, hb, hd, nh, n_windows):
    """Common block specs: channel-last qkv blocks sliced per head-tile."""
    qkv = pl.BlockSpec((1, n, hb * hd), lambda ht, b: (b, 0, ht),
                       memory_space=pltpu.VMEM)
    bias = pl.BlockSpec((hb, n, n), lambda ht, b: (ht, 0, 0),
                        memory_space=pltpu.VMEM)
    mask = pl.BlockSpec((1, n, n), lambda ht, b: (b % n_windows, 0, 0),
                        memory_space=pltpu.VMEM)
    return qkv, bias, mask


def _fwd_pallas(q, k, v, bias, mask, n_windows, scale, interpret):
    b_, n, c = q.shape
    nh = bias.shape[0]
    hd = c // nh
    hb = _head_tile(nh, n)
    qkv_spec, bias_spec, mask_spec = _specs(n, c, hb, hd, nh, n_windows)
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, hb=hb, hd=hd),
        grid=(nh // hb, b_),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, mask_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b_ * nh * n * n * hd,
            bytes_accessed=4 * q.size * q.dtype.itemsize,
            transcendentals=b_ * nh * n * n),
        interpret=interpret,
    )(q, k, v, bias, mask)


def _bwd_pallas(q, k, v, bias, mask, do, n_windows, scale, interpret):
    b_, n, c = q.shape
    nh = bias.shape[0]
    hd = c // nh
    hb = _head_tile(nh, n)
    qkv_spec, bias_spec, mask_spec = _specs(n, c, hb, hd, nh, n_windows)
    dq, dk, dv, dbias = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale, hb=hb, hd=hd),
        grid=(nh // hb, b_),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, mask_spec,
                  qkv_spec],
        out_specs=(qkv_spec, qkv_spec, qkv_spec, bias_spec),
        out_shape=(jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(bias.shape, jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b_ * nh * n * n * hd,
            bytes_accessed=6 * q.size * q.dtype.itemsize,
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
      q, k, v: (B_, N, nH*hd) channel-last, B_ = batch * n_windows.
      bias:    (nH, N, N) fp32 relative-position bias (trainable -> has VJP).
      mask:    (n_windows, N, N) fp32 additive shift mask (constant).
    Returns:
      (B_, N, nH*hd) in q.dtype.
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
    """Pure-XLA path on the same channel-last layout (the numerical oracle)."""
    b_, n, c = q.shape
    nh = bias.shape[0]
    hd = c // nh
    split = lambda x: x.reshape(b_, n, nh, hd).transpose(0, 2, 1, 3)
    qh, kh, vh = split(q), split(k), split(v)
    s = jnp.einsum("bhnd,bhmd->bhnm", qh.astype(jnp.float32) * scale,
                   kh.astype(jnp.float32))
    s = s + bias[None]
    m = jnp.broadcast_to(mask[None], (b_ // n_windows, n_windows, n, n))
    s = s + m.reshape(b_, 1, n, n)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhnm,bhmd->bhnd", p, vh,
                   preferred_element_type=jnp.float32)
    return o.transpose(0, 2, 1, 3).reshape(b_, n, c).astype(q.dtype)
