"""Frozen MiDaS DPT-Large monocular depth teacher.

Parity target: the reference's vendored MiDaS DPT
(ref: visbackbone/midas/dpt_depth.py:26-110 DPT/DPTDepthModel,
visbackbone/midas/vit.py:56-155 forward_vit/forward_flex + :183-270
act_postprocess stack with 'project' readout,
visbackbone/midas/blocks.py:49-76 _make_scratch, :231-345
ResidualConvUnit_custom/FeatureFusionBlock_custom). Used for the MVM depth
target (ref: main_pretrain.py:189-193,433-452).

Backbone: ViT-L/16 (timm layout), hooks after blocks (5, 11, 17, 23),
reassembled at strides 4/8/16/32 and fused by four RefineNet blocks.

TPU-native: channel-last, position embedding bilinearly resized at trace
time to the (static) input grid — the reference does this per forward
(vit.py:100-116 _resize_pos_embed); here it folds into the compiled program
as a constant-shape resize.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from empirical_mvm_tpu.ops.layernorm import layer_norm


class ViTBlock(nn.Module):
    """timm vision_transformer Block (norm1 -> MHA -> res, norm2 -> MLP -> res).

    ``use_pallas=True`` (frozen-teacher path, set by DPTDepth) routes the
    attention through the packed fused kernel (probs stay in VMEM) and the
    LayerNorms through the Pallas LN kernel — both fwd-only wins; trainable
    users (the MERLOT encoder) keep the XLA path, where the custom-VJP
    boundary is a measured net loss (BENCH_LOCAL_r3.txt)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        import os as _os
        b, l, d = x.shape
        nh = self.num_heads
        hd = self.dim // nh
        on_tpu = jax.default_backend() == "tpu"
        fused = (self.use_pallas
                 and (on_tpu or bool(_os.environ.get("EMVM_PALLAS_INTERPRET"))))
        y = layer_norm(1e-6, self.dtype, "norm1", fused or None)(x)
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(y)
        if fused:
            from empirical_mvm_tpu.ops.window_attention import (
                lane_sa_attention_fits, lane_self_attention,
                packed_self_attention)
            if lane_sa_attention_fits(b, l, self.dim, nh):
                # round 3: lane-sliced kernel off the raw qkv GEMM output —
                # (B, L, D) in and out, no packing transposes (ViT-L dim
                # 1024 is 128-divisible)
                ctx = lane_self_attention(
                    qkv, jnp.zeros((b, l, l), jnp.float32),
                    jnp.zeros((1,), jnp.int32), nh, float(hd ** -0.5), 0.0,
                    not on_tpu).astype(self.dtype)
            else:
                qkv = qkv.reshape(b, l, 3 * nh, hd).transpose(0, 2, 1, 3)
                ctx = packed_self_attention(
                    qkv, jnp.zeros((b, l, l), jnp.float32),
                    jnp.zeros((1,), jnp.int32), nh, float(hd ** -0.5), 0.0,
                    not on_tpu)
                ctx = ctx.astype(self.dtype)
        else:
            qkv = qkv.reshape(b, l, 3, nh, hd).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = jnp.einsum("bhqd,bhkd->bhqk", q * (hd ** -0.5), k,
                              preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            ctx = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                             preferred_element_type=jnp.float32
                             ).astype(self.dtype)
        if ctx.ndim == 4:                     # packed/XLA path (B, nH, L, hd)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, d)
        x = x + nn.Dense(self.dim, dtype=self.dtype, name="proj")(ctx)
        y = layer_norm(1e-6, self.dtype, "norm2", fused or None)(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)
        return x + y


class ResidualConvUnit(nn.Module):
    """(ref: visbackbone/midas/blocks.py:231-287, bn=False, ReLU)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = nn.relu(x)
        out = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                      name="conv1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                      name="conv2")(out)
        return out + x


def _interp2x(x: jax.Array) -> jax.Array:
    """F.interpolate(scale=2, bilinear, align_corners=True)."""
    b, h, w, c = x.shape
    # align_corners=True bilinear == linear resize with endpoint alignment
    new_h, new_w = 2 * h, 2 * w
    ys = jnp.linspace(0.0, h - 1.0, new_h)
    xs = jnp.linspace(0.0, w - 1.0, new_w)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy


class FeatureFusionBlock(nn.Module):
    """(ref: visbackbone/midas/blocks.py:291-345, deconv=False, expand=False,
    align_corners=True)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x0, x1=None):
        out = x0
        if x1 is not None:
            out = out + ResidualConvUnit(self.features, dtype=self.dtype,
                                         name="resConfUnit1")(x1)
        out = ResidualConvUnit(self.features, dtype=self.dtype,
                               name="resConfUnit2")(out)
        out = _interp2x(out)
        out = nn.Conv(self.features, (1, 1), dtype=self.dtype,
                      name="out_conv")(out)
        return out


class DPTDepth(nn.Module):
    """DPT-Large depth model (ref: visbackbone/midas/dpt_depth.py:88-110).

    Input (B, H, W, 3) with H, W multiples of 16; output (B, H, W) depth.
    """

    vit_dim: int = 1024
    vit_depth: int = 24
    vit_heads: int = 16
    hooks: Sequence[int] = (5, 11, 17, 23)
    reassemble_features: Sequence[int] = (256, 512, 1024, 1024)
    features: int = 256
    train_grid: int = 24          # pos-emb native grid (384/16)
    non_negative: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, _ = x.shape
        gh, gw = hh // 16, ww // 16
        d = self.vit_dim

        # --- ViT backbone with hook captures (ref: vit.py:56-155) ---
        patches = nn.Conv(d, (16, 16), strides=(16, 16), dtype=self.dtype,
                          name="patch_embed_proj")(x)
        tokens = patches.reshape(b, gh * gw, d)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, d))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, 1 + self.train_grid ** 2, d))
        # resize grid pos-emb to the input grid (ref: vit.py:100-116)
        pos_tok, pos_grid = pos[:, :1], pos[0, 1:]
        pos_grid = pos_grid.reshape(1, self.train_grid, self.train_grid, d)
        pos_grid = jax.image.resize(pos_grid, (1, gh, gw, d), "bilinear")
        pos_full = jnp.concatenate(
            [pos_tok, pos_grid.reshape(1, gh * gw, d)], axis=1)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(tokens.dtype), (b, 1, d)), tokens],
            axis=1) + pos_full.astype(tokens.dtype)

        captured = {}
        for i in range(self.vit_depth):
            # frozen teacher: fused attention + Pallas LN (fwd-only wins)
            tokens = ViTBlock(d, self.vit_heads, use_pallas=True,
                              dtype=self.dtype, name=f"block_{i}")(tokens)
            if i in self.hooks:
                captured[self.hooks.index(i)] = tokens

        # --- reassemble: project readout + conv + resample (ref: vit.py:183-270) ---
        layers = []
        for li in range(4):
            t = captured[li]
            readout = jnp.broadcast_to(t[:, :1], t[:, 1:].shape)
            feat = jnp.concatenate([t[:, 1:], readout], axis=-1)
            feat = nn.Dense(d, dtype=self.dtype,
                            name=f"readout_{li + 1}")(feat)
            feat = nn.gelu(feat, approximate=False)
            feat = feat.reshape(b, gh, gw, d)
            fch = self.reassemble_features[li]
            feat = nn.Conv(fch, (1, 1), dtype=self.dtype,
                           name=f"reassemble_conv_{li + 1}")(feat)
            if li == 0:    # x4 upsample (ConvTranspose 4x4 stride 4)
                feat = nn.ConvTranspose(fch, (4, 4), strides=(4, 4),
                                        dtype=self.dtype,
                                        name="reassemble_up_1")(feat)
            elif li == 1:  # x2 upsample
                feat = nn.ConvTranspose(fch, (2, 2), strides=(2, 2),
                                        dtype=self.dtype,
                                        name="reassemble_up_2")(feat)
            elif li == 3:  # /2 downsample (Conv 3x3 stride 2)
                feat = nn.Conv(fch, (3, 3), strides=(2, 2), padding=1,
                               dtype=self.dtype, name="reassemble_down_4")(feat)
            # scratch.layerN_rn 3x3 no-bias -> features (blocks.py:49-76)
            feat = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                           dtype=self.dtype, name=f"layer{li + 1}_rn")(feat)
            layers.append(feat)

        l1, l2, l3, l4 = layers
        path4 = FeatureFusionBlock(self.features, dtype=self.dtype,
                                   name="refinenet4")(l4)
        path3 = FeatureFusionBlock(self.features, dtype=self.dtype,
                                   name="refinenet3")(path4, l3)
        path2 = FeatureFusionBlock(self.features, dtype=self.dtype,
                                   name="refinenet2")(path3, l2)
        path1 = FeatureFusionBlock(self.features, dtype=self.dtype,
                                   name="refinenet1")(path2, l1)

        # head (ref: dpt_depth.py:91-100)
        out = nn.Conv(self.features // 2, (3, 3), padding=1, dtype=self.dtype,
                      name="head_conv1")(path1)
        out = _interp2x(out)
        out = nn.Conv(32, (3, 3), padding=1, dtype=self.dtype,
                      name="head_conv2")(out)
        out = nn.relu(out)
        out = nn.Conv(1, (1, 1), dtype=jnp.float32, name="head_conv3")(out)
        if self.non_negative:
            out = nn.relu(out)
        return out[..., 0]


def dpt_params_from_torch(sd: Mapping[str, np.ndarray],
                          vit_depth: int = 24) -> dict:
    """MiDaS dpt_large checkpoint -> DPTDepth param tree.

    Key layout per the reference module tree (visbackbone/midas/vit.py:183-270
    Sequential indices: 0=readout.project.0, 3=conv, 4=resample)."""

    def lin(tp):
        return {"kernel": np.ascontiguousarray(sd[f"{tp}.weight"].T),
                "bias": sd[f"{tp}.bias"]}

    def conv(tp, bias=True):
        out = {"kernel": np.ascontiguousarray(
            sd[f"{tp}.weight"].transpose(2, 3, 1, 0))}
        if bias:
            out["bias"] = sd[f"{tp}.bias"]
        return out

    def deconv(tp):
        # torch ConvTranspose2d weight (in, out, kh, kw) -> flax (kh, kw, in, out)
        return {"kernel": np.ascontiguousarray(
            sd[f"{tp}.weight"].transpose(2, 3, 0, 1)),
            "bias": sd[f"{tp}.bias"]}

    def ln(tp):
        return {"scale": sd[f"{tp}.weight"], "bias": sd[f"{tp}.bias"]}

    tree: dict = {
        "patch_embed_proj": conv("pretrained.model.patch_embed.proj"),
        "cls_token": sd["pretrained.model.cls_token"],
        "pos_embed": sd["pretrained.model.pos_embed"],
    }
    for i in range(vit_depth):
        tb = f"pretrained.model.blocks.{i}"
        tree[f"block_{i}"] = {
            "norm1": ln(f"{tb}.norm1"), "norm2": ln(f"{tb}.norm2"),
            "qkv": lin(f"{tb}.attn.qkv"), "proj": lin(f"{tb}.attn.proj"),
            "fc1": lin(f"{tb}.mlp.fc1"), "fc2": lin(f"{tb}.mlp.fc2"),
        }
    for li in range(1, 5):
        ap = f"pretrained.act_postprocess{li}"
        tree[f"readout_{li}"] = lin(f"{ap}.0.project.0")
        tree[f"reassemble_conv_{li}"] = conv(f"{ap}.3")
        if li == 1:
            tree["reassemble_up_1"] = deconv(f"{ap}.4")
        elif li == 2:
            tree["reassemble_up_2"] = deconv(f"{ap}.4")
        elif li == 4:
            tree["reassemble_down_4"] = conv(f"{ap}.4")
        tree[f"layer{li}_rn"] = conv(f"scratch.layer{li}_rn", bias=False)
    for ri in range(1, 5):
        rp = f"scratch.refinenet{ri}"
        blk = {
            "resConfUnit2": {"conv1": conv(f"{rp}.resConfUnit2.conv1"),
                             "conv2": conv(f"{rp}.resConfUnit2.conv2")},
            "out_conv": conv(f"{rp}.out_conv"),
        }
        if ri != 4:
            # refinenet4 is called with a single input, so its resConfUnit1
            # never runs (ref: dpt_depth.py:79 path_4 = refinenet4(l4))
            blk["resConfUnit1"] = {
                "conv1": conv(f"{rp}.resConfUnit1.conv1"),
                "conv2": conv(f"{rp}.resConfUnit1.conv2")}
        tree[f"refinenet{ri}"] = blk
    tree["head_conv1"] = conv("scratch.output_conv.0")
    tree["head_conv2"] = conv("scratch.output_conv.2")
    tree["head_conv3"] = conv("scratch.output_conv.4")
    return tree
