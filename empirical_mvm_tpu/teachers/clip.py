"""Frozen CLIP ViT visual encoder — the paper's 8th MVM target family.

The EmpiricalMVM paper studies eight masked-visual-modeling targets; the
reference repo README lists "2D CLIP features" among them but ships NO code
branch for it (no ``clip`` import exists anywhere in the reference tree —
see SURVEY.md; the other seven targets live at ref: utils/args.py:124-126,
main_pretrain.py:374-553). This module supplies that missing capability:
a frozen CLIP vision tower whose patch-token features serve as the
``mvm_target="2d_clip"`` regression target, wired exactly like the frozen
2D-Swin feature teacher (ref: main_pretrain.py:527-545).

Architecture: the standard CLIP ViT visual encoder (ViT-B/32 by default) in
the HuggingFace ``CLIPVisionModel`` parameterization — patch conv (no bias),
class embedding, learned position embedding, pre-LayerNorm transformer with
quick-GELU MLPs, post-LayerNorm on the pooled CLS token. ``__call__``
returns HF's ``(last_hidden_state, pooled_output)`` contract so the parity
test can assert byte-level agreement with ``transformers.CLIPVisionModel``.

TPU-native choices: channel-last input, the patch conv lowered to a
reshape+matmul (one MXU GEMM), and — as a frozen teacher — the fused
lane/packed self-attention kernels plus Pallas LayerNorm (fwd-only wins,
same policy as the DPT teacher).

Grid match: ViT-B/32 at 224^2 yields a 7x7 patch grid — exactly the
student's fused-token grid (224 / 32), so the target aligns with
``patch_tokens`` with no resampling, like the 2d_feature target.
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from empirical_mvm_tpu.ops.layernorm import layer_norm

# CLIP's own input normalization (OpenAI CLIP preprocessing). The data
# pipeline ships ImageNet-normalized clips (the student's convention,
# ref: dataset.py:112-114); renormalize_imagenet_to_clip converts.
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def renormalize_imagenet_to_clip(x: jax.Array) -> jax.Array:
    """(..., 3) ImageNet-normalized -> CLIP-normalized, fused elementwise."""
    im_m = jnp.asarray(IMAGENET_MEAN, x.dtype)
    im_s = jnp.asarray(IMAGENET_STD, x.dtype)
    cl_m = jnp.asarray(CLIP_MEAN, x.dtype)
    cl_s = jnp.asarray(CLIP_STD, x.dtype)
    return (x * im_s + im_m - cl_m) / cl_s


def quick_gelu(x: jax.Array) -> jax.Array:
    """OpenAI CLIP activation: x * sigmoid(1.702 x) (HF hidden_act
    "quick_gelu")."""
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPLayer(nn.Module):
    """One pre-LN CLIP encoder layer (HF CLIPEncoderLayer)."""

    dim: int
    num_heads: int
    mlp_dim: int
    eps: float = 1e-5
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
        y = layer_norm(self.eps, self.dtype, "ln1", fused or None)(x)
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(y)
        if fused:
            from empirical_mvm_tpu.ops.window_attention import (
                lane_sa_attention_fits, lane_self_attention,
                packed_self_attention)
            if lane_sa_attention_fits(b, l, self.dim, nh):
                ctx = lane_self_attention(
                    qkv, jnp.zeros((b, l, l), jnp.float32),
                    jnp.zeros((1,), jnp.int32), nh, float(hd ** -0.5), 0.0,
                    not on_tpu).astype(self.dtype)
            else:
                qkv = qkv.reshape(b, l, 3 * nh, hd).transpose(0, 2, 1, 3)
                ctx = packed_self_attention(
                    qkv, jnp.zeros((b, l, l), jnp.float32),
                    jnp.zeros((1,), jnp.int32), nh, float(hd ** -0.5), 0.0,
                    not on_tpu).astype(self.dtype)
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
        y = layer_norm(self.eps, self.dtype, "ln2", fused or None)(x)
        y = nn.Dense(self.mlp_dim, dtype=self.dtype, name="fc1")(y)
        y = quick_gelu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)
        return x + y


class CLIPVisual(nn.Module):
    """CLIP vision tower (HF CLIPVisionModel semantics). ViT-B/32 defaults."""

    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    patch_size: int = 32
    eps: float = 1e-5
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) CLIP-normalized, channel-last.

        Returns ``(last_hidden_state, pooled)`` matching HF
        CLIPVisionModel: last_hidden_state (B, 1+h*w, D) WITHOUT the post
        LayerNorm (HF applies post_layernorm only to the pooled CLS).
        """
        b, hh, ww, c = x.shape
        ps = self.patch_size
        d = self.hidden_size
        h, w = hh // ps, ww // ps
        # patch conv (stride == kernel, no bias) as one reshape+GEMM
        kernel = self.param("patch_kernel", nn.initializers.lecun_normal(),
                            (ps * ps * c, d))
        patches = x.reshape(b, h, ps, w, ps, c).transpose(0, 1, 3, 2, 4, 5)
        patches = patches.reshape(b, h * w, ps * ps * c)
        tok = (patches.astype(self.dtype) @ kernel.astype(self.dtype))
        cls = self.param("class_embedding",
                         nn.initializers.normal(stddev=0.02), (d,))
        tok = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, d)), tok],
            axis=1)                                       # (B, 1+hw, D)
        pos = self.param("position_embedding",
                         nn.initializers.normal(stddev=0.02),
                         (1 + h * w, d))
        tok = tok + pos.astype(self.dtype)[None]
        on_tpu = jax.default_backend() == "tpu"
        import os as _os
        fused = (self.use_pallas
                 and (on_tpu or bool(_os.environ.get("EMVM_PALLAS_INTERPRET"))))
        tok = layer_norm(self.eps, self.dtype, "pre_ln", fused or None)(tok)
        for i in range(self.num_layers):
            tok = CLIPLayer(dim=d, num_heads=self.num_heads,
                            mlp_dim=self.mlp_dim, eps=self.eps,
                            use_pallas=self.use_pallas, dtype=self.dtype,
                            name=f"layers_{i}")(tok)
        pooled = layer_norm(self.eps, self.dtype, "post_ln",
                            fused or None)(tok[:, 0])
        return tok, pooled

    def features(self, x):
        """Patch-token feature grid (B, h, w, D) — the 2d_clip MVM target
        (the per-frame analogue of the 2D-Swin hidden_states[-1] target,
        ref: main_pretrain.py:527-545)."""
        tok, _ = self(x)
        b = x.shape[0]
        h = x.shape[1] // self.patch_size
        w = x.shape[2] // self.patch_size
        return tok[:, 1:].reshape(b, h, w, self.hidden_size)


def clip_params_from_torch(sd: Mapping[str, np.ndarray],
                           num_layers: int = 12) -> dict:
    """HF ``CLIPVisionModel`` (or full ``CLIPModel``) state_dict -> flax
    params for :class:`CLIPVisual`.

    Accepts keys with or without the ``vision_model.`` prefix; text-tower
    keys are ignored. Note HF's attribute is spelled ``pre_layrnorm``.
    """
    t = {k.split("vision_model.", 1)[-1]: np.asarray(v)
         for k, v in sd.items() if "text_model" not in k
         and "visual_projection" not in k and "text_projection" not in k
         and k != "logit_scale"}

    def ln(prefix):
        return {"scale": t[f"{prefix}.weight"], "bias": t[f"{prefix}.bias"]}

    pk = t["embeddings.patch_embedding.weight"]          # (D, 3, ps, ps)
    d = pk.shape[0]
    params = {
        "patch_kernel": pk.transpose(2, 3, 1, 0).reshape(-1, d),
        "class_embedding": t["embeddings.class_embedding"].reshape(d),
        "position_embedding": t["embeddings.position_embedding.weight"],
        "pre_ln": ln("pre_layrnorm"),
        "post_ln": ln("post_layernorm"),
    }
    for i in range(num_layers):
        p = f"encoder.layers.{i}"
        qw = t[f"{p}.self_attn.q_proj.weight"]
        kw = t[f"{p}.self_attn.k_proj.weight"]
        vw = t[f"{p}.self_attn.v_proj.weight"]
        qb = t[f"{p}.self_attn.q_proj.bias"]
        kb = t[f"{p}.self_attn.k_proj.bias"]
        vb = t[f"{p}.self_attn.v_proj.bias"]
        params[f"layers_{i}"] = {
            "ln1": ln(f"{p}.layer_norm1"),
            "ln2": ln(f"{p}.layer_norm2"),
            "qkv": {"kernel": np.concatenate([qw.T, kw.T, vw.T], axis=1),
                    "bias": np.concatenate([qb, kb, vb])},
            "proj": {"kernel": t[f"{p}.self_attn.out_proj.weight"].T,
                     "bias": t[f"{p}.self_attn.out_proj.bias"]},
            "fc1": {"kernel": t[f"{p}.mlp.fc1.weight"].T,
                    "bias": t[f"{p}.mlp.fc1.bias"]},
            "fc2": {"kernel": t[f"{p}.mlp.fc2.weight"].T,
                    "bias": t[f"{p}.mlp.fc2.bias"]},
        }
    return params
