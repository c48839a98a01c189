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


@functools.partial(jax.jit, static_argnames=("n_windows", "scale", "interpret"))
def fused_window_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                           bias: jax.Array, mask: jax.Array,
                           n_windows: int, scale: float,
                           interpret: bool = False) -> jax.Array:
    """softmax(q k^T * scale + bias + mask) v, fused per window.

    Args:
      q, k, v: (B_, nH, N, hd) where B_ = batch * n_windows.
      bias:    (nH, N, N) fp32 relative-position bias.
      mask:    (n_windows, N, N) fp32 additive shift mask (zeros if unshifted).
    Returns:
      (B_, nH, N, hd) in q.dtype.
    """
    b_, nh, n, hd = q.shape
    assert b_ % n_windows == 0

    flops = 2 * 2 * b_ * nh * n * n * hd
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=(b_,),
        in_specs=[
            pl.BlockSpec((1, nh, n, hd), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nh, n, hd), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nh, n, hd), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, n, n), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, n), lambda b: (b % n_windows, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nh, n, hd), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=3 * q.size * q.dtype.itemsize + q.size * 2,
            transcendentals=b_ * nh * n * n),
        interpret=interpret,
    )(q, k, v, bias, mask)


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
