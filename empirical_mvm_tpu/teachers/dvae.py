"""Frozen DALL-E dVAE encoder teacher: on-device VQ token extraction.

Parity target: the vendored OpenAI discrete-VAE encoder the reference uses
for on-the-fly MVM-VQ targets (ref: visbackbone/dalle/encoder.py:42 Encoder,
visbackbone/dalle/utils.py map_pixels/logit-laplace, visbackbone/dalle/
__init__.py:44 extract_vq_token + ImageNet de-normalization; vq patch 8).

TPU-native: channel-last convs, bf16-friendly (the reference runs it under
autocast too, main_pretrain.py:481), one jitted call per batch — no separate
teacher process, the extraction fuses into the pretrain step.
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

LOGIT_LAPLACE_EPS = 0.1
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def map_pixels(x: jax.Array) -> jax.Array:
    """(ref: visbackbone/dalle/utils.py:46)"""
    return (1 - 2 * LOGIT_LAPLACE_EPS) * x + LOGIT_LAPLACE_EPS


def unnormalize_imagenet(x: jax.Array) -> jax.Array:
    """Invert ImageNet normalization back to [0,1] pixels
    (ref: visbackbone/dalle/__init__.py:184-190)."""
    return x * IMAGENET_STD + IMAGENET_MEAN


class _Conv(nn.Module):
    """same-padded conv, torch weight layout importable."""

    n_out: int
    kw: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.n_out, (self.kw, self.kw), padding="SAME",
                       dtype=self.dtype, name="conv")(x)


class EncoderBlock(nn.Module):
    """(ref: visbackbone/dalle/encoder.py:13-39)"""

    n_out: int
    n_layers: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n_hid = self.n_out // 4
        post_gain = 1.0 / (self.n_layers ** 2)
        if x.shape[-1] != self.n_out:
            idp = _Conv(self.n_out, 1, self.dtype, name="id_path")(x)
        else:
            idp = x
        h = nn.relu(x)
        h = _Conv(n_hid, 3, self.dtype, name="conv_1")(h)
        h = nn.relu(h)
        h = _Conv(n_hid, 3, self.dtype, name="conv_2")(h)
        h = nn.relu(h)
        h = _Conv(n_hid, 3, self.dtype, name="conv_3")(h)
        h = nn.relu(h)
        h = _Conv(self.n_out, 1, self.dtype, name="conv_4")(h)
        return idp + post_gain * h


class DvaeEncoder(nn.Module):
    """(ref: visbackbone/dalle/encoder.py:42-96). Input (B, H, W, 3) pixels
    already mapped by ``map_pixels``; output (B, H/8, W/8, vocab) logits."""

    n_hid: int = 256
    n_blk_per_group: int = 2
    vocab_size: int = 8192
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n_layers = 4 * self.n_blk_per_group
        x = _Conv(self.n_hid, 7, self.dtype, name="input")(x)
        for g, mult in enumerate((1, 2, 4, 8), start=1):
            for i in range(self.n_blk_per_group):
                x = EncoderBlock(mult * self.n_hid, n_layers, self.dtype,
                                 name=f"group_{g}_block_{i + 1}")(x)
            if g < 4:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(x)
        x = _Conv(self.vocab_size, 1, jnp.float32, name="output")(x)
        return x


class DvaeTeacher:
    """extract_vq_token equivalent (ref: visbackbone/dalle/__init__.py:44-53),
    operating on ImageNet-normalized channel-last clips."""

    def __init__(self, params, n_hid: int = 256, vocab_size: int = 8192,
                 n_blk_per_group: int = 2, dtype=jnp.bfloat16):
        self.model = DvaeEncoder(n_hid=n_hid, vocab_size=vocab_size,
                                 n_blk_per_group=n_blk_per_group, dtype=dtype)
        self.params = params
        self.vq_patch = 8  # (ref: visbackbone/dalle/__init__.py:56-58)

    def extract_vq_tokens(self, img_normalized: jax.Array) -> jax.Array:
        """(B, H, W, 3) ImageNet-normalized -> (B, H/8, W/8) int32 tokens."""
        x = unnormalize_imagenet(img_normalized.astype(jnp.float32))
        x = map_pixels(jnp.clip(x, 0.0, 1.0))
        logits = self.model.apply({"params": self.params}, x)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def dvae_params_from_torch(sd: Mapping[str, np.ndarray],
                           n_blk_per_group: int = 2) -> dict:
    """Torch dVAE Encoder state_dict -> DvaeEncoder params.

    Torch keys (ref module tree): ``blocks.input.{w,b}``,
    ``blocks.group_{g}.block_{i}.id_path.{w,b}`` (when present),
    ``blocks.group_{g}.block_{i}.res_path.conv_{j}.{w,b}``,
    ``blocks.output.conv.{w,b}``. Conv weights (O, I, kh, kw) -> (kh, kw, I, O).
    """

    def conv(prefix):
        return {"conv": {
            "kernel": np.ascontiguousarray(
                sd[f"{prefix}.w"].transpose(2, 3, 1, 0)),
            "bias": sd[f"{prefix}.b"]}}

    tree: dict = {"input": conv("blocks.input")}
    for g in range(1, 5):
        for i in range(1, n_blk_per_group + 1):
            base = f"blocks.group_{g}.block_{i}"
            blk: dict = {}
            if f"{base}.id_path.w" in sd:
                blk["id_path"] = conv(f"{base}.id_path")
            for j in range(1, 5):
                blk[f"conv_{j}"] = conv(f"{base}.res_path.conv_{j}")
            tree[f"group_{g}_block_{i}"] = blk
    tree["output"] = conv("blocks.output.conv")
    return tree
