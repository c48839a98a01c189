"""On-device preprocessing: uint8 clips -> normalized float, crops, resize.

The reference normalizes/crops on CPU in DataLoader workers and ships fp32
tensors to the GPU (ref: dataset.py:91-134 torchvision transforms,
dataset.py:252 move_to_cuda). TPU-native pipeline: host workers only JPEG-
decode to uint8; the (B, T, H, W, 3) uint8 clip crosses PCIe/ICI at 1/4 the
bytes, and normalization + augmentation fuse into the training step
(BASELINE.json north-star: "on-device fused preprocessing").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def normalize_uint8(img: jax.Array, dtype=jnp.float32) -> jax.Array:
    """uint8 (..., 3) -> ImageNet-normalized float (fuses into the first
    conv's input in practice)."""
    x = img.astype(jnp.float32) / 255.0
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    return x.astype(dtype)


def maybe_normalize(img: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Pass floats through, normalize uint8 — lets every model accept either
    host-normalized fp32 clips or raw uint8 clips."""
    if img.dtype == jnp.uint8:
        return normalize_uint8(img, dtype)
    return img


def random_crop_clip(rng: jax.Array, img: jax.Array, size: int) -> jax.Array:
    """Clip-consistent random crop on device (vid_rand_crop semantics,
    ref: visbackbone/video_transform.py:248-306). img (B, T, H, W, C)."""
    b, t, h, w, c = img.shape
    kh, kw = jax.random.split(rng)
    tops = jax.random.randint(kh, (b,), 0, max(h - size, 0) + 1)
    lefts = jax.random.randint(kw, (b,), 0, max(w - size, 0) + 1)

    def crop_one(x, top, left):
        return jax.lax.dynamic_slice(x, (0, top, left, 0),
                                     (t, size, size, c))

    return jax.vmap(crop_one)(img, tops, lefts)


def center_crop_clip(img: jax.Array, size: int) -> jax.Array:
    """(B, T, H, W, C) center crop."""
    h, w = img.shape[2], img.shape[3]
    top, left = (h - size) // 2, (w - size) // 2
    return img[:, :, top:top + size, left:left + size, :]


def random_hflip_clip(rng: jax.Array, img: jax.Array) -> jax.Array:
    """Per-sample horizontal flip (ref: main_retrieval.py:20
    RandomHorizontalFlip(0.5))."""
    b = img.shape[0]
    flip = jax.random.bernoulli(rng, 0.5, (b,))
    return jnp.where(flip[:, None, None, None, None], img[:, :, :, ::-1, :],
                     img)
