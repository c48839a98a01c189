"""Alternate visual encoders: 2D Swin (mean/concat fusion), ResNet-50
(mean/concat), and the MERLOT-style R50+ViT encoder.

Parity targets (selected by ``vis_backbone``/``temporal_fusion``, ref:
model.py:135-148):
* EncImgSwinMean / EncImgSwinConcat (ref: visbackbone/swin.py:37-160): HF
  2D Swin per frame, 1x1 ``swin2bert`` projection, optional temporal mean;
* EncImgR50Concat / EncImgR50Mean (ref: visbackbone/resnet50.py:6-120):
  torchvision ResNet-50 trunk + 1x1 conv + ReLU;
* EncImgMerlot (ref: visbackbone/merlot.py:7-95): R50 trunk + per-frame
  ViT-base encoder with a double position-embedding add.

Design notes (TPU-native, documented deviations):
* the 2D Swin is our :class:`SwinTransformer3D` with ``patch_size=(1,4,4)``
  and ``window_size=(1,7,7)`` — mathematically a per-frame 2D Swin (temporal
  kernel/stride/window of 1); HF microsoft/swin-* weights import via
  :func:`swin2d_params_from_hf` (parity-tested in tests/test_encoders2d.py);
* ResNet BatchNorm defaults to frozen statistics (standard serving-mode
  choice on TPU); ``ModelConfig.r50_train_bn`` enables torch train-mode BN
  (batch statistics + momentum-updated running stats via the ``bn_stats``
  collection and :func:`fold_bn_stats`) for fine-tune parity with the
  reference, whose R50 BNs run in train() mode while stem+layer1 PARAMS are
  frozen when pretrained (ref resnet50.py:18-21).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from empirical_mvm_tpu.ops.layernorm import layer_norm
from empirical_mvm_tpu.core.config import ModelConfig, SwinConfig
from empirical_mvm_tpu.models.video_swin import SwinTransformer3D
from empirical_mvm_tpu.teachers.dpt import ViTBlock


SWIN2D_SIZES = {
    # (embed_dim, depths, num_heads) for microsoft/swin-{size}-patch4-window7-224
    "tiny": (96, (2, 2, 6, 2), (3, 6, 12, 24)),
    "small": (96, (2, 2, 18, 2), (3, 6, 12, 24)),
    "base": (128, (2, 2, 18, 2), (4, 8, 16, 32)),
    "large": (192, (2, 2, 18, 2), (6, 12, 24, 48)),
}


def swin2d_config(size: str) -> SwinConfig:
    dim, depths, heads = SWIN2D_SIZES[size]
    # final_norm=False: the reference consumes HF hidden_states[-1], which is
    # the LAST STAGE output BEFORE SwinModel's final LayerNorm
    # (ref: visbackbone/swin.py:75-77, main_pretrain.py:537)
    return SwinConfig(patch_size=(1, 4, 4), embed_dim=dim, depths=depths,
                      num_heads=heads, window_size=(1, 7, 7),
                      final_norm=False)


class _PosEmbeds(nn.Module):
    """Shared cls/pos/len embedding + norm block used by every 2D encoder
    (ref: visbackbone/swin.py:46-54 and siblings)."""

    hidden_size: int
    max_size_frame: int = 6
    max_size_patch: int = 14
    with_odr: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        init = nn.initializers.normal(stddev=0.02)
        d = self.hidden_size
        self.emb_cls = self.param("emb_cls", init, (1, 1, 1, d))
        self.emb_pos = self.param("emb_pos", init,
                                  (1, 1, 1 + self.max_size_patch ** 2, d))
        self.emb_len = self.param("emb_len", init,
                                  (1, self.max_size_frame, 1, d))
        if self.with_odr:
            self.emb_odr = self.param("emb_odr", init, (1, 1, 1, d))
        self.norm = layer_norm(1e-5, self.dtype, "norm")

    def __call__(self, f, add_len: bool = True, apply_norm: bool = True):
        """f: (B, T, hw, D) -> tokens (B, T, 1+hw, D)."""
        b, t, hw, d = f.shape
        cls = jnp.broadcast_to(self.emb_cls.astype(f.dtype), (b, t, 1, d))
        f = jnp.concatenate([cls, f], axis=2)
        f = f + self.emb_pos[:, :, :1 + hw, :].astype(f.dtype)
        if add_len:
            f = f + self.emb_len[:, :t, :, :].astype(f.dtype)
        if apply_norm:
            f = self.norm(f)
        return f


class EncImgSwin(nn.Module):
    """2D Swin encoder with mean or concat temporal fusion
    (ref: visbackbone/swin.py:37-160)."""

    config: ModelConfig
    fusion: str = "concat"           # "mean" | "concat"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        # swin_custom override wins (research/tests); note it must carry a
        # 2D-style geometry (patch (1,4,4), window (1,7,7)) to mirror HF
        cfg2d = (self.config.swin_custom
                 if self.config.swin_custom is not None
                 else swin2d_config(self.config.vis_backbone_size))
        self.swin = SwinTransformer3D(config=cfg2d, dtype=self.dtype,
                                      name="swin")
        self.swin2bert = nn.Dense(self.config.hidden_size, dtype=self.dtype,
                                  name="swin2bert")
        self.embeds = _PosEmbeds(self.config.hidden_size,
                                 self.config.max_size_frame,
                                 self.config.max_size_patch,
                                 with_odr=(self.fusion == "concat"),
                                 dtype=self.dtype, name="embeds")

    def __call__(self, img, odr=None, vt_mask=None,
                 deterministic: bool = True):
        b, t, hh, ww, _ = img.shape
        h, w = hh // 32, ww // 32
        f = self.swin(img, deterministic=deterministic)   # (B,T,h,w,latent)
        f = self.swin2bert(f.reshape(b, t, h * w, -1))
        if self.fusion == "mean":
            f = f.mean(axis=1, keepdims=True)             # (ref: swin.py:79-80)
            t = 1
        f = self.embeds(f)
        d = f.shape[-1]
        m = jnp.ones((b, t * (1 + h * w)), jnp.int32)
        if vt_mask is not None and self.fusion == "concat":
            m = m * vt_mask.reshape(b, -1)
        return f.reshape(b, t * (1 + h * w), d), m


class BatchNorm2d(nn.Module):
    """torch BatchNorm2d with a train/eval switch (VERDICT r2 item 8).

    Param layout matches :class:`FrozenBatchNorm` (scale/bias/mean/var all in
    ``params``) so the torchvision importer and existing checkpoints are
    shared. ``use_batch_stats=False`` is bit-identical to FrozenBatchNorm
    (eval mode / frozen trunk). ``use_batch_stats=True`` reproduces torch
    train-mode normalization — per-channel batch mean and BIASED variance —
    which is what the reference's R50 runs during fine-tuning (its BN modules
    stay in train() mode even where stem+layer1 params are frozen,
    ref: visbackbone/resnet50.py:18-21; param freezing maps to optimizer
    freeze groups here).

    Running statistics (torch semantics: ``running = (1-m)*running +
    m*batch`` with momentum 0.1 and the UNBIASED batch variance) are sown
    into the ``bn_stats`` collection during train-mode calls; the train step
    folds them back into the mean/var params via :func:`fold_bn_stats`, so a
    fine-tune -> eval round trip sees the drifted statistics exactly like
    torch."""

    features: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_batch_stats: bool = False):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        xf = x.astype(jnp.float32)
        if use_batch_stats:
            mean = jnp.mean(xf, axis=(0, 1, 2))
            var = jnp.var(xf, axis=(0, 1, 2))      # biased, like torch train
            n = xf.shape[0] * xf.shape[1] * xf.shape[2]
            self.sow("bn_stats", "mean", jax.lax.stop_gradient(mean))
            self.sow("bn_stats", "var", jax.lax.stop_gradient(
                var * (n / max(n - 1, 1))))        # unbiased for the update
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return (xf - mean) * inv + bias


BN_MOMENTUM = 0.1   # torch nn.BatchNorm2d default, used by torchvision R50


def fold_bn_stats(params, bn_stats, momentum: float = BN_MOMENTUM):
    """Momentum-update the BN running mean/var params from the ``bn_stats``
    collection sown by train-mode :class:`BatchNorm2d` calls (torch
    semantics: ``running = (1-m)*running + m*batch_stat``,
    ref: visbackbone/resnet50.py:18-21 + torch BN docs). ``bn_stats`` paths
    mirror the param tree, so this is a recursive merge; no-op on empty."""
    if not bn_stats:
        return params

    def merge(p, s):
        out = dict(p)
        for k, v in s.items():
            if isinstance(v, dict):
                out[k] = merge(p[k], v)
            else:
                new = v[0] if isinstance(v, tuple) else v   # sow stores tuples
                out[k] = (1.0 - momentum) * p[k] + momentum * new
        return out

    return merge(params, bn_stats)


class BottleneckBlock(nn.Module):
    """torchvision ResNet bottleneck (1x1 -> 3x3 -> 1x1, expansion 4)."""

    features: int
    stride: int = 1
    project: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_batch_stats: bool = False):
        f = self.features
        y = nn.Conv(f, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = BatchNorm2d(f, name="bn1")(y, use_batch_stats)
        y = nn.relu(y)
        y = nn.Conv(f, (3, 3), strides=(self.stride, self.stride), padding=1,
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = BatchNorm2d(f, name="bn2")(y, use_batch_stats)
        y = nn.relu(y)
        y = nn.Conv(4 * f, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = BatchNorm2d(4 * f, name="bn3")(y, use_batch_stats)
        if self.project:
            x = nn.Conv(4 * f, (1, 1), strides=(self.stride, self.stride),
                        use_bias=False, dtype=self.dtype, name="down_conv")(x)
            x = BatchNorm2d(4 * f, name="down_bn")(x, use_batch_stats)
        return nn.relu(x + y)


class ResNet50(nn.Module):
    """torchvision resnet50 trunk without avgpool/fc
    (ref: visbackbone/resnet50.py:17-24 takes children()[:-2]).

    ``use_batch_stats=True`` runs every BN in torch train mode (see
    BatchNorm2d); the reference's stem+layer1 param freeze is an optimizer
    concern (freeze_prefixes), not a BN-mode one."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_batch_stats: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = BatchNorm2d(64, name="bn1")(x, use_batch_stats)
        x = nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        for li, (f, n, s) in enumerate(((64, 3, 1), (128, 4, 2),
                                        (256, 6, 2), (512, 3, 2)), start=1):
            for bi in range(n):
                x = BottleneckBlock(f, stride=(s if bi == 0 else 1),
                                    project=(bi == 0), dtype=self.dtype,
                                    name=f"layer{li}_{bi}")(x, use_batch_stats)
        return x                                           # (B, H/32, W/32, 2048)


class EncImgR50(nn.Module):
    """ResNet-50 encoder, mean or concat fusion
    (ref: visbackbone/resnet50.py:6-120)."""

    config: ModelConfig
    fusion: str = "concat"
    train_bn: bool = False     # torch train-mode BN during training
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.res = ResNet50(dtype=self.dtype, name="res")
        self.proj = nn.Dense(self.config.hidden_size, dtype=self.dtype,
                             name="proj")    # the 1x1 conv at resnet50.py:23
        self.embeds = _PosEmbeds(self.config.hidden_size,
                                 self.config.max_size_frame,
                                 self.config.max_size_patch,
                                 dtype=self.dtype, name="embeds")

    def __call__(self, img, odr=None, vt_mask=None,
                 deterministic: bool = True):
        b, t, hh, ww, _ = img.shape
        h, w = hh // 32, ww // 32
        f = self.res(img.reshape(b * t, hh, ww, 3),
                     use_batch_stats=self.train_bn and not deterministic)
        f = nn.relu(self.proj(f))
        f = f.reshape(b, t, h * w, -1)
        if self.fusion == "mean":
            f = f.mean(axis=1, keepdims=True)
            t = 1
        f = self.embeds(f)
        d = f.shape[-1]
        m = jnp.ones((b, t * (1 + h * w)), jnp.int32)
        return f.reshape(b, t * (1 + h * w), d), m


class EncImgMerlot(nn.Module):
    """MERLOT-style R50 + per-frame ViT encoder
    (ref: visbackbone/merlot.py:7-95): R50 features -> cls/pos -> norm ->
    per-frame ViT-base encoder -> second pos add -> temporal emb -> norm."""

    config: ModelConfig
    vit_depth: int = 12
    train_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        d = self.config.hidden_size
        heads = self.config.fusion.num_attention_heads  # ViT-base: 12 @ 768
        self.res = ResNet50(dtype=self.dtype, name="res")
        self.proj = nn.Dense(d, dtype=self.dtype, name="proj")
        self.embeds = _PosEmbeds(d, self.config.max_size_frame,
                                 self.config.max_size_patch,
                                 dtype=self.dtype, name="embeds")
        self.vit_blocks = [ViTBlock(d, heads, dtype=self.dtype,
                                    name=f"vit_{i}")
                           for i in range(self.vit_depth)]
        self.out_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                     name="out_norm")

    def __call__(self, img, odr=None, vt_mask=None,
                 deterministic: bool = True):
        b, t, hh, ww, _ = img.shape
        h, w = hh // 32, ww // 32
        f = self.res(img.reshape(b * t, hh, ww, 3),
                     use_batch_stats=self.train_bn and not deterministic)
        f = nn.relu(self.proj(f)).reshape(b, t, h * w, -1)
        f = self.embeds(f, add_len=False)                  # cls+pos, norm
        d = f.shape[-1]
        x = f.reshape(b * t, 1 + h * w, d)
        for blk in self.vit_blocks:
            x = blk(x)
        f = x.reshape(b, t, 1 + h * w, d)
        f = f + self.embeds.emb_pos[:, :, :1 + h * w, :].astype(f.dtype)
        f = f + self.embeds.emb_len[:, :t, :, :].astype(f.dtype)
        f = self.out_norm(f)
        m = jnp.ones((b, t * (1 + h * w)), jnp.int32)
        return f.reshape(b, t * (1 + h * w), d), m
