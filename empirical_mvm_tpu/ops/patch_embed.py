"""Fused 3D patch embedding as a single MXU GEMM.

Replaces the reference's cuDNN ``Conv3d(kernel=(2,4,4), stride=(1,4,4))``
(ref: visbackbone/video_swin.py:383-400) with an im2col reshape + one matmul.
Because the spatial stride equals the spatial kernel (non-overlapping 4x4
patches) and the temporal kernel is 2 with stride 1, the conv is exactly:

    out[t] = patches[t] @ W[0] + patches[t+1] @ W[1] + b     (patches[T] = 0)

which we fuse into one ``(B*T*h*w, kd*kh*kw*C) @ (kd*kh*kw*C, E)`` GEMM —
reshape/transpose are free on TPU, and XLA tiles the GEMM onto the MXU.

Replicates the reference's padding quirks: W and H padded up to multiples of
the spatial patch, and D padded by +1 at the END regardless of divisibility
(ref: visbackbone/video_swin.py:392-398) — with stride_t=1, kernel_t=2 this
yields output depth == input depth (no temporal downsampling).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def patch_embed_3d(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    patch_size: tuple[int, int, int] = (2, 4, 4),
    dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Args:
      x:      (B, T, H, W, C) video, channel-last.
      kernel: (kd, kh, kw, C, E) conv kernel (torch OIDHW -> transpose(2,3,4,1,0)).
      bias:   (E,).
    Returns:
      (B, T, H//kh, W//kw, E).
    """
    kd, kh, kw = patch_size
    b, t, h, w, c = x.shape
    if w % kw:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, kw - w % kw), (0, 0)))
    if h % kh:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, kh - h % kh), (0, 0), (0, 0)))
    _, _, hp, wp, _ = x.shape
    nh, nw = hp // kh, wp // kw

    # im2col for the non-overlapping spatial patches: (B, T, nh, nw, kh*kw*C)
    p = x.reshape(b, t, nh, kh, nw, kw, c)
    p = p.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b, t, nh, nw, kh * kw * c)

    # temporal taps: tap d sees frame t+d, zero-padded past the end
    # (the reference's F.pad(x, (..., 0, 1)) at visbackbone/video_swin.py:398)
    taps = [p]
    for d in range(1, kd):
        taps.append(jnp.pad(p[:, d:], ((0, 0), (0, d), (0, 0), (0, 0), (0, 0))))
    p = jnp.concatenate(taps, axis=-1)                     # (B,T,nh,nw, kd*kh*kw*C)

    wmat = kernel.reshape(-1, kernel.shape[-1])            # (kd*kh*kw*C, E)
    out = jnp.dot(p.astype(dtype), wmat.astype(dtype),
                  preferred_element_type=jnp.float32)
    out = out + bias.astype(jnp.float32)
    return out.astype(dtype)
