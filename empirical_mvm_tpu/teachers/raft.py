"""Frozen RAFT optical-flow teacher (torchvision raft_large architecture).

Parity target: the reference's vendored torchvision RAFT
(ref: visbackbone/optical_flow/raft.py — ResidualBlock :29, FeatureEncoder
:115, MotionEncoder :165, ConvGRU :205, RecurrentBlock :228, FlowHead :259,
UpdateBlock :276, MaskPredictor :298, CorrBlock :325, RAFT.forward :459-508,
raft_large :593; grid_sample/make_coords_grid/upsample_flow at
visbackbone/optical_flow/_utils.py:35-77). Used as the MVM optical-flow
target extractor (ref: main_pretrain.py:403-419).

TPU-native design:
* channel-last convs, bf16-friendly matmuls, fp32 flow state;
* the 12 ConvGRU refinement iterations run as one ``lax.scan`` —
  fixed trip count, no Python loop in the compiled program;
* correlation pyramid lookup is a batched bilinear gather implemented with
  static neighborhood offsets (the (2r+1)^2 window), not torch grid_sample;
* the whole teacher jits into the pretrain step and runs under
  ``stop_gradient`` (the reference wraps it in no_grad+autocast,
  main_pretrain.py:403-407).
"""

from __future__ import annotations

from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class FrozenBatchNorm(nn.Module):
    """BatchNorm in eval mode: running stats are parameters (the teacher is
    frozen; ref context encoder uses BatchNorm2d)."""

    features: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return (x.astype(jnp.float32) - mean) * inv + bias


def instance_norm(x, eps: float = 1e-5):
    """torch InstanceNorm2d(affine=False): per-sample per-channel over H,W."""
    x = x.astype(jnp.float32)
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class ConvNormAct(nn.Module):
    """Conv + optional norm + optional ReLU
    (ref: visbackbone/optical_flow/ops.py:120 Conv2dNormActivation)."""

    features: int
    kernel: int | tuple[int, int] = 3
    stride: int = 1
    norm: str | None = None          # 'in' | 'bn' | None
    act: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel if isinstance(self.kernel, tuple) else (self.kernel,
                                                                self.kernel)
        # torch-style symmetric padding (k-1)//2 — SAME pads asymmetrically
        # at stride 2, which shifts the sampling grid vs the reference
        pad = ((k[0] - 1) // 2, (k[0] - 1) // 2), ((k[1] - 1) // 2,
                                                   (k[1] - 1) // 2)
        x = nn.Conv(self.features, k, strides=(self.stride, self.stride),
                    padding=pad, use_bias=True, dtype=self.dtype,
                    name="conv")(x)
        if self.norm == "in":
            x = instance_norm(x)
        elif self.norm == "bn":
            x = FrozenBatchNorm(self.features, name="bn")(x)
        if self.act:
            x = nn.relu(x)
        return x.astype(self.dtype)


class ResidualBlock(nn.Module):
    """(ref: visbackbone/optical_flow/raft.py:29-70)"""

    features: int
    norm: str | None
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = ConvNormAct(self.features, 3, self.stride, self.norm,
                        dtype=self.dtype, name="convnormrelu1")(x)
        y = ConvNormAct(self.features, 3, 1, self.norm, dtype=self.dtype,
                        name="convnormrelu2")(y)
        if self.stride != 1:
            x = ConvNormAct(self.features, 1, self.stride, self.norm,
                            act=False, dtype=self.dtype, name="downsample")(x)
        return nn.relu(x + y)


class FeatureEncoder(nn.Module):
    """8x downsampling encoder (ref: visbackbone/optical_flow/raft.py:115-158).
    layers=(64, 64, 96, 128, 256)."""

    layers: Sequence[int] = (64, 64, 96, 128, 256)
    norm: str | None = "in"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        l = self.layers
        x = ConvNormAct(l[0], 7, 2, self.norm, dtype=self.dtype,
                        name="convnormrelu")(x)
        for i, (feat, stride) in enumerate(((l[1], 1), (l[2], 2), (l[3], 2)),
                                           start=1):
            x = ResidualBlock(feat, self.norm, stride, dtype=self.dtype,
                              name=f"layer{i}_0")(x)
            x = ResidualBlock(feat, self.norm, 1, dtype=self.dtype,
                              name=f"layer{i}_1")(x)
        x = nn.Conv(l[4], (1, 1), dtype=self.dtype, name="conv")(x)
        return x


class MotionEncoder(nn.Module):
    """(ref: visbackbone/optical_flow/raft.py:165-202)"""

    in_channels_corr: int
    corr_layers: Sequence[int] = (256, 192)
    flow_layers: Sequence[int] = (128, 64)
    out_channels: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, flow, corr_features):
        corr = ConvNormAct(self.corr_layers[0], 1, dtype=self.dtype,
                           name="convcorr1")(corr_features)
        if len(self.corr_layers) == 2:
            corr = ConvNormAct(self.corr_layers[1], 3, dtype=self.dtype,
                               name="convcorr2")(corr)
        f = ConvNormAct(self.flow_layers[0], 7, dtype=self.dtype,
                        name="convflow1")(flow.astype(corr.dtype))
        f = ConvNormAct(self.flow_layers[1], 3, dtype=self.dtype,
                        name="convflow2")(f)
        x = jnp.concatenate([corr, f], axis=-1)
        x = ConvNormAct(self.out_channels - 2, 3, dtype=self.dtype,
                        name="conv")(x)
        return jnp.concatenate([x, flow.astype(x.dtype)], axis=-1)


class ConvGRU(nn.Module):
    """(ref: visbackbone/optical_flow/raft.py:205-221)"""

    hidden_size: int
    kernel: tuple[int, int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        hx = jnp.concatenate([h, x], axis=-1)
        pad = (((self.kernel[0] - 1) // 2,) * 2, ((self.kernel[1] - 1) // 2,) * 2)
        conv = lambda name: nn.Conv(self.hidden_size, self.kernel,
                                    padding=pad, dtype=self.dtype,
                                    name=name)
        z = jax.nn.sigmoid(conv("convz")(hx))
        r = jax.nn.sigmoid(conv("convr")(hx))
        q = jnp.tanh(conv("convq")(
            jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * q


class RecurrentBlock(nn.Module):
    """Separable 1x5 + 5x1 GRU pair (ref: raft.py:228-256)."""

    hidden_size: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        h = ConvGRU(self.hidden_size, (1, 5), dtype=self.dtype,
                    name="convgru1")(h, x)
        h = ConvGRU(self.hidden_size, (5, 1), dtype=self.dtype,
                    name="convgru2")(h, x)
        return h


class FlowHead(nn.Module):
    """(ref: raft.py:259-273)"""

    hidden_size: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.hidden_size, (3, 3), padding="SAME",
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(x)
        return nn.Conv(2, (3, 3), padding="SAME", dtype=jnp.float32,
                       name="conv2")(x)


class MaskPredictor(nn.Module):
    """(ref: raft.py:298-322)"""

    hidden_size: int = 256
    multiplier: float = 0.25
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ConvNormAct(self.hidden_size, 3, dtype=self.dtype,
                        name="convrelu")(x)
        x = nn.Conv(8 * 8 * 9, (1, 1), dtype=jnp.float32, name="conv")(x)
        return self.multiplier * x


def bilinear_sample(img: jax.Array, coords: jax.Array) -> jax.Array:
    """Bilinear sampling at absolute pixel coords with zero padding —
    grid_sample(align_corners=True) on absolute coordinates
    (ref: visbackbone/optical_flow/_utils.py:35-47).

    img (N, H, W, C); coords (N, P, 2) as (x, y) -> (N, P, C).
    """
    n, h, w, c = img.shape
    x, y = coords[..., 0].astype(jnp.float32), coords[..., 1].astype(jnp.float32)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def gather(xi, yi):
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        flat = img.reshape(n, h * w, c)
        idx = yi_c * w + xi_c
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return jnp.where(inb[..., None], vals, 0.0)

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)
    top = v00 * (1 - wx)[..., None] + v01 * wx[..., None]
    bot = v10 * (1 - wx)[..., None] + v11 * wx[..., None]
    return top * (1 - wy)[..., None] + bot * wy[..., None]


def build_corr_pyramid(f1: jax.Array, f2: jax.Array,
                       num_levels: int = 4) -> list[jax.Array]:
    """All-pairs correlation volume + avg-pool pyramid
    (ref: raft.py:351-366,395-405). f (B, h, w, C) -> levels of
    (B*h*w, h_l, w_l, 1)."""
    b, h, w, c = f1.shape
    corr = jnp.einsum("bxc,byc->bxy", f1.reshape(b, h * w, c),
                      f2.reshape(b, h * w, c),
                      preferred_element_type=jnp.float32)
    corr = corr / np.sqrt(c)
    vol = corr.reshape(b * h * w, h, w, 1)
    pyramid = [vol]
    for _ in range(num_levels - 1):
        vol = nn.avg_pool(vol, (2, 2), strides=(2, 2))
        pyramid.append(vol)
    return pyramid


def index_corr_pyramid(pyramid: list[jax.Array], coords: jax.Array,
                       radius: int = 4) -> jax.Array:
    """Lookup (2r+1)^2 neighborhoods at every level
    (ref: raft.py:368-393). coords (B, h, w, 2) -> (B, h, w, L*(2r+1)^2).

    TPU formulation: bilinear sampling of an axis-aligned offset grid is
    SEPARABLE — the 2D bilinear weight of point (cx+di, cy+dj) against grid
    cell (x, y) factors into tent(cx+di-x) * tent(cy+dj-y), and torch's
    zero-padding drops out-of-range corners per axis independently. So the
    81-point lookup becomes two dense contractions per level with per-row
    tent-weight matrices, which XLA fuses into multiply-reduce ops on the
    VPU. The gather version (one take_along_axis per bilinear corner) moved
    ~585M scalars/step through the scalar pipeline and made optical-flow
    pretraining 22x slower than MVM-pixel.
    """
    b, h, w, _ = coords.shape
    side = 2 * radius + 1
    # torch delta order: the FIRST offset axis (di) adds to x
    # (ref: raft.py:375-381); output channel index is di*side+dj.
    offs = jnp.arange(-radius, radius + 1.0, dtype=jnp.float32)   # (S,)
    cen = coords.reshape(b * h * w, 2).astype(jnp.float32)
    feats = []
    for vol in pyramid:
        r, hl, wl, _ = vol.shape
        img = vol[..., 0]                                   # (R, hl, wl)
        px = cen[:, 0:1] + offs[None]                       # (R, S) x targets
        py = cen[:, 1:2] + offs[None]
        xs = jnp.arange(wl, dtype=jnp.float32)
        ys = jnp.arange(hl, dtype=jnp.float32)
        ax = jnp.maximum(0.0, 1.0 - jnp.abs(px[:, :, None] - xs))  # (R,S,wl)
        ay = jnp.maximum(0.0, 1.0 - jnp.abs(py[:, :, None] - ys))  # (R,S,hl)
        # t[p, y, i] = sum_x img[p, y, x] * ax[p, i, x]
        t = jnp.sum(img[:, :, None, :] * ax[:, None, :, :], axis=-1)
        # o[p, i, j] = sum_y t[p, y, i] * ay[p, j, y]
        o = jnp.sum(t[:, :, :, None] * ay.transpose(0, 2, 1)[:, :, None, :],
                    axis=1)                                 # (R, S, S)
        feats.append(o.reshape(r, side * side))
        cen = cen / 2
    out = jnp.concatenate(feats, axis=-1)                   # (BHW, L*S*S)
    return out.reshape(b, h, w, -1)


def convex_upsample(flow: jax.Array, up_mask: jax.Array) -> jax.Array:
    """Convex-combination 8x upsampling
    (ref: visbackbone/optical_flow/_utils.py:57-77). flow (B, h, w, 2),
    up_mask (B, h, w, 9*8*8) -> (B, 8h, 8w, 2)."""
    b, h, w, _ = flow.shape
    mask = up_mask.reshape(b, h, w, 9, 8, 8)
    mask = jax.nn.softmax(mask, axis=3)
    f8 = 8.0 * flow
    pad = jnp.pad(f8, ((0, 0), (1, 1), (1, 1), (0, 0)))
    neigh = jnp.stack([pad[:, 1 + dy:1 + dy + h, 1 + dx:1 + dx + w]
                       for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
                      axis=3)                               # (B, h, w, 9, 2)
    up = jnp.einsum("bhwkij,bhwkc->bhwijc", mask, neigh)    # (B, h, w, 8, 8, 2)
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(b, 8 * h, 8 * w, 2)


class RAFT(nn.Module):
    """raft_large (ref: raft.py:407-508,593-640). Inputs (B, H, W, 3) in
    [-1, 1] or ImageNet-normalized pixels; returns (B, H, W, 2) final flow."""

    num_levels: int = 4
    radius: int = 4
    hidden_size: int = 128
    num_updates: int = 12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image1, image2, num_updates: int | None = None):
        n_up = num_updates or self.num_updates
        b, h, w, _ = image1.shape
        assert h % 8 == 0 and w % 8 == 0

        fmaps = FeatureEncoder(norm="in", dtype=self.dtype,
                               name="feature_encoder")(
            jnp.concatenate([image1, image2], axis=0))
        f1, f2 = fmaps[:b], fmaps[b:]
        pyramid = build_corr_pyramid(f1.astype(jnp.float32),
                                     f2.astype(jnp.float32), self.num_levels)

        ctx_out = FeatureEncoder(norm="bn", dtype=self.dtype,
                                 name="context_encoder")(image1)
        hidden = jnp.tanh(ctx_out[..., :self.hidden_size])
        context = nn.relu(ctx_out[..., self.hidden_size:])

        h8, w8 = h // 8, w // 8
        grid = jnp.stack(jnp.meshgrid(jnp.arange(w8, dtype=jnp.float32),
                                      jnp.arange(h8, dtype=jnp.float32),
                                      indexing="xy"), axis=-1)  # (h8, w8, (x,y))
        coords0 = jnp.broadcast_to(grid, (b, h8, w8, 2))

        corr_ch = self.num_levels * (2 * self.radius + 1) ** 2
        motion = MotionEncoder(in_channels_corr=corr_ch, dtype=self.dtype,
                               name="motion_encoder")
        recur = RecurrentBlock(self.hidden_size, dtype=self.dtype,
                               name="recurrent_block")
        fhead = FlowHead(dtype=self.dtype, name="flow_head")
        maskp = MaskPredictor(dtype=self.dtype, name="mask_predictor")

        # refinement loop (ref: raft.py:495-506). The trip count is static
        # (12) and every iteration reuses the same weights, so a Python loop
        # under jit gives XLA the whole unrolled schedule to pipeline; only
        # the FINAL flow is the MVM target (ref: main_pretrain.py:407 takes
        # list_of_flows[-1]), so intermediate upsamples are skipped entirely.
        coords1 = coords0
        for _ in range(n_up):
            coords1 = jax.lax.stop_gradient(coords1)
            corr = index_corr_pyramid(pyramid, coords1, self.radius)
            flow = coords1 - coords0
            mf = motion(flow, corr.astype(self.dtype))
            x = jnp.concatenate([context, mf], axis=-1)
            hidden = recur(hidden, x)
            delta = fhead(hidden)
            coords1 = coords1 + delta

        up_mask = maskp(hidden)
        return convex_upsample(coords1 - coords0, up_mask)


def raft_params_from_torch(sd: Mapping[str, np.ndarray]) -> dict:
    """torchvision raft_large state_dict -> RAFT param tree."""

    def conv(tp):
        out = {"kernel": np.ascontiguousarray(
            sd[f"{tp}.weight"].transpose(2, 3, 1, 0))}
        if f"{tp}.bias" in sd:
            out["bias"] = sd[f"{tp}.bias"]
        return out

    def bn(tp):
        return {"scale": sd[f"{tp}.weight"], "bias": sd[f"{tp}.bias"],
                "mean": sd[f"{tp}.running_mean"],
                "var": sd[f"{tp}.running_var"]}

    def cna(tp, has_bn):
        # torchvision Conv2dNormActivation is a Sequential: 0=conv, 1=norm
        out = {"conv": conv(f"{tp}.0")}
        if has_bn and f"{tp}.1.running_mean" in sd:
            out["bn"] = bn(f"{tp}.1")
        return out

    def resblock(tp, has_bn, has_down):
        out = {"convnormrelu1": cna(f"{tp}.convnormrelu1", has_bn),
               "convnormrelu2": cna(f"{tp}.convnormrelu2", has_bn)}
        if has_down:
            out["downsample"] = cna(f"{tp}.downsample", has_bn)
        return out

    def encoder(tp, has_bn):
        out = {"convnormrelu": cna(f"{tp}.convnormrelu", has_bn),
               "conv": conv(f"{tp}.conv")}
        for i in (1, 2, 3):
            has_down = i > 1   # layer1 first_stride=1 (ref raft.py:133)
            out[f"layer{i}_0"] = resblock(f"{tp}.layer{i}.0", has_bn, has_down)
            out[f"layer{i}_1"] = resblock(f"{tp}.layer{i}.1", has_bn, False)
        return out

    def gru(tp):
        return {k: conv(f"{tp}.{k}") for k in ("convz", "convr", "convq")}

    tree = {
        "feature_encoder": encoder("feature_encoder", False),
        "context_encoder": encoder("context_encoder", True),
        "motion_encoder": {
            "convcorr1": cna("update_block.motion_encoder.convcorr1", False),
            "convcorr2": cna("update_block.motion_encoder.convcorr2", False),
            "convflow1": cna("update_block.motion_encoder.convflow1", False),
            "convflow2": cna("update_block.motion_encoder.convflow2", False),
            "conv": cna("update_block.motion_encoder.conv", False),
        },
        "recurrent_block": {
            "convgru1": gru("update_block.recurrent_block.convgru1"),
            "convgru2": gru("update_block.recurrent_block.convgru2"),
        },
        "flow_head": {
            "conv1": conv("update_block.flow_head.conv1"),
            "conv2": conv("update_block.flow_head.conv2"),
        },
        "mask_predictor": {
            "convrelu": cna("mask_predictor.convrelu", False),
            "conv": conv("mask_predictor.conv"),
        },
    }
    return tree
