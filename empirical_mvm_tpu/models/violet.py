"""VIOLET base model: video encoder + text encoder + cross-modal fusion.

Parity target: ``VIOLET_Base`` (ref: model.py:117-214) with its ``go_feat`` /
``go_cross`` decomposition, the per-frame-CLS video token layout of
``EncVideo`` (ref: model.py:8-78), and the embeddings-only text encoder
default (ref: model.py:80-115, _args/args_pretrain.json txt_backbone_embed_only).

TPU-first notes:
* one flax module tree == one XLA program; no ``.cuda()`` transfer points —
  the train step owns device placement via shardings.
* token count is static per config: ``Lv = T * (1 + (size_img/32)^2)``,
  ``Lt = size_txt`` — so the fusion encoder compiles once per task config.
* attention masks are built as additive fp32 biases (ops fused by XLA), not
  materialized 0/1 tensors passed through HF's mask extender.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from empirical_mvm_tpu.ops.layernorm import layer_norm
from empirical_mvm_tpu.core.config import ModelConfig
from empirical_mvm_tpu.models.bert import (
    BertEmbeddings, BertEncoder, BertMLMHead, extended_attention_mask)
from empirical_mvm_tpu.models.video_swin import SwinTransformer3D


class EncVideo(nn.Module):
    """Video Swin + projection + per-frame CLS + positional embeddings
    (ref: model.py:8-78).

    Input  ``img (B, T, H, W, 3)`` normalized, channel-last.
    Output ``feat (B, T*(1+h*w), D)``, ``mask (B, T*(1+h*w))`` with
    ``h = H/32, w = W/32``.
    """

    config: ModelConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        swin_cfg = cfg.swin
        self.swin = SwinTransformer3D(config=swin_cfg, dtype=self.dtype,
                                      name="swin")
        self.latent_feat_size = swin_cfg.num_features
        d = cfg.hidden_size
        if cfg.swinbert:
            # SwinBERT checkpoint layout (ref: model.py:27-29):
            # latent -> 512 -> hidden, fake CLS with mask 0
            self.fc = nn.Dense(512, dtype=self.dtype, name="fc")
            self.img_embedding = nn.Dense(d, dtype=self.dtype,
                                          name="img_embedding")
            return
        if self.latent_feat_size != d:
            self.fc = nn.Dense(d, dtype=self.dtype, name="fc")
        else:
            self.fc = None
        init = nn.initializers.normal(stddev=0.02)
        # same shapes as ref model.py:22-26 so checkpoints map 1:1
        self.emb_cls = self.param("emb_cls", init, (1, 1, 1, d))
        self.emb_pos = self.param("emb_pos", init,
                                  (1, 1, 1 + cfg.max_size_patch ** 2, d))
        self.emb_len = self.param("emb_len", init, (1, cfg.max_size_frame, 1, d))
        self.emb_odr = self.param("emb_odr", init, (1, 1, 1, d))
        self.norm = layer_norm(1e-5, self.dtype, "norm")

    def __call__(self, img, odr: Optional[jax.Array] = None,
                 vt_mask: Optional[jax.Array] = None,
                 deterministic: bool = True):
        from empirical_mvm_tpu.ops.preprocess import maybe_normalize
        img = maybe_normalize(img)      # accept raw uint8 clips (on-device norm)
        b, t, hh, ww, _ = img.shape
        h, w = hh // 32, ww // 32
        f = self.swin(img, deterministic=deterministic)        # (B,T,h,w,latent)
        f = f.reshape(b, t, h * w, self.latent_feat_size)
        if self.config.swinbert:
            # (ref: model.py:44-56) fake CLS token with mask 0
            f = self.img_embedding(self.fc(f))
            d = f.shape[-1]
            fake_cls = jnp.zeros((b, t, 1, d), f.dtype)
            f = jnp.concatenate([fake_cls, f], axis=2)
            m = jnp.ones((b, t, 1 + h * w), jnp.int32)
            m = m.at[:, :, 0].set(0)
            if vt_mask is not None:
                m = m * vt_mask
            return (f.reshape(b, t * (1 + h * w), d),
                    m.reshape(b, t * (1 + h * w)))
        if self.fc is not None:
            f = self.fc(f)
        d = f.shape[-1]
        cls = jnp.broadcast_to(self.emb_cls.astype(f.dtype), (b, t, 1, d))
        f = jnp.concatenate([cls, f], axis=2)                   # (B,T,1+hw,D)
        f = f + self.emb_pos[:, :, :1 + h * w, :].astype(f.dtype)
        if odr is not None:
            # frame-order pretext (ref: model.py:61-68): a frame at its true
            # temporal slot gets its temporal embedding, a shuffled frame
            # gets the generic order embedding
            in_place = (odr == jnp.arange(t)[None, :])          # (B, T)
            emb = jnp.where(in_place[:, :, None, None],
                            self.emb_len[:, :t, :, :],
                            self.emb_odr)
            f = f + emb.astype(f.dtype)
        else:
            f = f + self.emb_len[:, :t, :, :].astype(f.dtype)
        f = self.norm(f).reshape(b, t * (1 + h * w), d)

        m = jnp.ones((b, t, 1 + h * w), dtype=jnp.int32)
        if vt_mask is not None:
            m = m * vt_mask
        return f, m.reshape(b, t * (1 + h * w))


class EncTxt(nn.Module):
    """Text encoder: BERT embeddings (+ optional encoder stack)
    (ref: model.py:80-115). The default pretrain config uses embeddings only
    (txt_backbone_embed_only=True)."""

    config: ModelConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.emb_txt = BertEmbeddings(self.config.text, dtype=self.dtype,
                                      name="emb_txt")
        if not self.config.txt_backbone_embed_only:
            self.txt_trsfr = BertEncoder(self.config.text, dtype=self.dtype,
                                         name="txt_trsfr")
        else:
            self.txt_trsfr = None

    def __call__(self, txt, mask_txt=None, attn_mask_type: str = "full",
                 deterministic: bool = True):
        f = self.emb_txt(txt, deterministic=deterministic)
        if self.txt_trsfr is None:
            return f
        if mask_txt is None:
            mask_txt = jnp.ones_like(txt)
        if attn_mask_type == "seq2seq":
            lt = txt.shape[1]
            m = jnp.broadcast_to(jnp.tril(jnp.ones((lt, lt), jnp.int32)),
                                 (txt.shape[0], lt, lt))
        else:
            m = mask_txt
        out, _ = self.txt_trsfr(f, extended_attention_mask(m),
                                deterministic=deterministic)
        return out


def joint_attn_bias(mask_img: jax.Array, mask_txt: jax.Array,
                    attn_mask_type: str = "full",
                    dtype=jnp.float32) -> jax.Array:
    """Build the fusion-transformer attention bias over [video ; text]
    (ref: model.py:180-202 get_attn_mask + HF mask extension at :211).

    full:    every token attends all valid tokens (1D mask).
    seq2seq: all rows see valid video tokens; text attends causally to text;
             video rows do NOT see text (ref: model.py:192-198).
    """
    b, lv = mask_img.shape
    _, lt = mask_txt.shape
    if attn_mask_type == "full":
        return extended_attention_mask(
            jnp.concatenate([mask_img, mask_txt], axis=1), dtype)
    if attn_mask_type != "seq2seq":
        raise ValueError(attn_mask_type)
    l = lv + lt
    mask = jnp.zeros((b, l, l), dtype=jnp.int32)
    mask = mask.at[:, :, :lv].set(
        jnp.broadcast_to(mask_img[:, None, :], (b, l, lv)))
    tri = jnp.tril(jnp.ones((lt, lt), jnp.int32))
    mask = mask.at[:, lv:, lv:].set(jnp.broadcast_to(tri, (b, lt, lt)))
    return extended_attention_mask(mask, dtype)


class VioletBase(nn.Module):
    """Shared VIOLET trunk (ref: model.py:117-214). Task models subclass and
    add heads; every task is (Dataset, Model, Agent) like the reference."""

    config: ModelConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        # visual backbone selection (ref: model.py:135-148)
        vb = self.config.vis_backbone
        tf = self.config.temporal_fusion
        if vb == "vidswin":
            assert tf == "vidswin"
            self.enc_img = EncVideo(self.config, dtype=self.dtype,
                                    name="enc_img")
        elif vb in ("swin", "swin2d"):
            from empirical_mvm_tpu.models.encoders2d import EncImgSwin
            self.enc_img = EncImgSwin(self.config, fusion=tf,
                                      dtype=self.dtype, name="enc_img")
        elif vb == "r50":
            from empirical_mvm_tpu.models.encoders2d import EncImgR50
            self.enc_img = EncImgR50(self.config, fusion=tf,
                                     train_bn=self.config.r50_train_bn,
                                     dtype=self.dtype, name="enc_img")
        elif vb == "merlot":
            from empirical_mvm_tpu.models.encoders2d import EncImgMerlot
            assert tf == "concat"
            self.enc_img = EncImgMerlot(self.config,
                                        train_bn=self.config.r50_train_bn,
                                        dtype=self.dtype, name="enc_img")
        else:
            raise ValueError(f"unknown vis_backbone {vb}")
        self.enc_txt = EncTxt(self.config, dtype=self.dtype, name="enc_txt")
        if self.config.fusion.scan:
            # layers folded into one nn.scan step: ~12x smaller trace/HLO,
            # the compile-time lever for the slow remote-compile path.
            # Params are stacked (trsfr.layer.<p> with leading (L, ...));
            # use bert.stack_encoder_params to convert per-layer trees.
            from empirical_mvm_tpu.models.bert import BertEncoderScanned
            self.trsfr = BertEncoderScanned(self.config.fusion,
                                            dtype=self.dtype, name="trsfr")
        else:
            self.trsfr = BertEncoder(self.config.fusion, dtype=self.dtype,
                                     name="trsfr")
        if self.config.enable_task_token:
            # learned per-task prefix rows (ref: main_qaoe_lsmdc_fib.py:66-67
            # emb_task = 0.02 * randn(10, hidden))
            self.emb_task = self.param(
                "emb_task", nn.initializers.normal(0.02),
                (self.config.num_task_tokens, self.config.hidden_size))
        self.setup_heads()

    def setup_heads(self):
        """Overridden by task models."""

    def go_feat(self, img, txt, mask, odr=None, vt_mask=None,
                attn_mask_type="full", deterministic: bool = True):
        """(ref: model.py:174-178)"""
        feat_img, mask_img = self.enc_img(img, odr=odr, vt_mask=vt_mask,
                                          deterministic=deterministic)
        feat_txt = self.enc_txt(txt, mask_txt=mask,
                                attn_mask_type=attn_mask_type,
                                deterministic=deterministic)
        return feat_img, mask_img, feat_txt, mask

    # (ref: main_qaoe_lsmdc_fib.py:65 task_tok2id)
    TASK_TOK2ID = {"vtm": 0, "mc": 1, "oe": 2, "cap": 3}

    def prepend_pretxt(self, ans, mask_txt, feat_txt, prompt=None,
                       deterministic: bool = True):
        """Prepend a learned task embedding or an encoded text prompt to the
        text features (ref: model.py:219-258 get_pretxt/prepro_txt_inputs).

        ``ans`` is the label row aligned with ``feat_txt`` (the reference
        threads ans through the same concat so prefix positions become -1 and
        are CE-ignored, ref: main_qaoe_lsmdc_fib.py:69-80). Returns
        (ans, mask_txt, feat_txt) with the prefix prepended, plus the prefix
        length so callers can slice logits back to original text positions.
        """
        cfg = self.config
        b = mask_txt.shape[0]
        if cfg.enable_task_token:
            tid = self.TASK_TOK2ID[cfg.task_token]
            pre_feat = jnp.broadcast_to(
                self.emb_task[tid][None, None, :].astype(feat_txt.dtype),
                (b, 1, feat_txt.shape[-1]))
            pre_mask = jnp.ones((b, 1), mask_txt.dtype)
        elif cfg.enable_prompt and prompt is not None:
            p_txt, p_mask = prompt                       # (P,) or (B, P)
            if p_txt.ndim == 1:
                p_txt = jnp.broadcast_to(p_txt[None], (b, p_txt.shape[0]))
                p_mask = jnp.broadcast_to(p_mask[None], (b, p_mask.shape[0]))
            pre_feat = self.enc_txt(p_txt, mask_txt=p_mask,
                                    deterministic=deterministic)
            pre_mask = p_mask.astype(mask_txt.dtype)
        else:
            return ans, mask_txt, feat_txt, 0
        pre = pre_mask.shape[1]
        pre_ans = jnp.full((b, pre), -1, ans.dtype)
        return (jnp.concatenate([pre_ans, ans], axis=1),
                jnp.concatenate([pre_mask, mask_txt], axis=1),
                jnp.concatenate([pre_feat.astype(feat_txt.dtype), feat_txt],
                                axis=1),
                pre)

    def go_cross(self, feat_img, mask_img, feat_txt, mask_txt,
                 attn_mask_type="full", output_attentions: bool = False,
                 deterministic: bool = True):
        """(ref: model.py:204-214)"""
        feat = jnp.concatenate([feat_img.astype(self.dtype),
                                feat_txt.astype(self.dtype)], axis=1)
        bias = joint_attn_bias(mask_img, mask_txt, attn_mask_type)
        if self.config.fusion.scan:
            assert not output_attentions, \
                "fusion.scan=True cannot return per-layer attentions"
            out, attns = self.trsfr(feat, bias, deterministic=deterministic)
        else:
            out, attns = self.trsfr(feat, bias, deterministic=deterministic,
                                    output_attentions=output_attentions)
        return out, attns

    def __call__(self, img, txt, mask, deterministic: bool = True):
        """Default forward = trunk only; useful for feature extraction and
        compile checks."""
        fi, mi, ft, mt = self.go_feat(img, txt, mask,
                                      deterministic=deterministic)
        out, _ = self.go_cross(fi, mi, ft, mt, deterministic=deterministic)
        return out


class ScoreHead(nn.Module):
    """Dropout -> Dense(2D) -> ReLU -> Dense(out) MLP used for VTM, retrieval
    and QA-MC scoring (ref: main_pretrain.py:146, main_retrieval.py:61,
    main_qamc.py:53)."""

    hidden_size: int
    out_size: int = 1
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.hidden_size * 2, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.out_size, dtype=self.dtype, name="fc2")(x)
        return x
