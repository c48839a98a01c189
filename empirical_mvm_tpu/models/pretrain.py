"""VIOLET pretraining model: MTM + VTM + MVM heads and decoders.

Parity target: ``VIOLET_Pretrain`` (ref: main_pretrain.py:140-267) — VTM
score head, BERT MLM head, and the per-target MVM decoders (1x1 conv +
PixelShuffle in the reference, lowered here to Dense + reshape which is the
same linear map and free on TPU).

TPU-first deviations:
* the in-batch VTM negative construction (a Python loop over B at ref
  main_pretrain.py:243-258) is vectorized: per-row random permutations pick
  O-1 negative captions, and the B*O pair batch runs as one fused go_cross;
* MVM decoding happens on the (B, T, h, w, D) token grid with reshapes in
  place of PixelShuffle (ref: main_pretrain.py:178-209).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from empirical_mvm_tpu.models.bert import BertMLMHead
from empirical_mvm_tpu.models.violet import ScoreHead, VioletBase


def pixel_shuffle_tokens(x: jax.Array, r: int, out_ch: int) -> jax.Array:
    """(B, T, h, w, out_ch*r*r) -> (B, T, h*r, w*r, out_ch), replicating the
    channel-major layout of torch PixelShuffle (ref: main_pretrain.py:178)."""
    b, t, h, w, _ = x.shape
    x = x.reshape(b, t, h, w, out_ch, r, r)        # (c, i, j) channel-major
    x = x.transpose(0, 1, 2, 5, 3, 6, 4)           # b t h i w j c
    return x.reshape(b, t, h * r, w * r, out_ch)


class VioletPretrain(VioletBase):
    """(ref: main_pretrain.py:140-267)"""

    mvm_target: tuple[str, ...] = ("pixel",)
    pretrain_tasks: tuple[str, ...] = ("mtm", "vtm", "mvm")
    pretrain_masks: tuple[str, ...] = ("bm", "rm")
    p_mask: float = 0.15
    temp: float = 0.05            # vtm temperature (ref: main_pretrain.py:260)
    num_options: int = 4          # 1 positive + 3 in-batch negatives (_O)
    size_vq: int = 8192
    vq_patch: int = 8             # dVAE patch size (ref: dalle/__init__.py:56-58)
    vq_on_the_fly: bool = False   # True: dVAE teacher extracts tokens on device
    feat_target_size: int = 1024  # regression width for 2d/3d_feature targets
    clip_arch: tuple[int, int, int, int] = (768, 12, 12, 3072)
                                  # CLIP visual tower (hidden, layers, heads,
                                  # mlp) for the 2d_clip target; hidden is
                                  # also the regressor width. Default ViT-B/32
    special_token_ids: tuple[int, ...] = (101, 102, 0)  # cls/sep/pad (bert-base)
    mask_token_id: int = 103

    def setup_heads(self):
        d = self.config.hidden_size
        ps = self.config.size_patch
        self.fc = ScoreHead(hidden_size=d, dtype=self.dtype, name="fc")
        self.fc_mtm = BertMLMHead(self.config.fusion, dtype=self.dtype,
                                  name="fc_mtm")
        if "pixel" in self.mvm_target:
            self.decoder_pixel = nn.Dense(ps * ps * 3, dtype=self.dtype,
                                          name="decoder_pixel")
        if "hog" in self.mvm_target:
            self.decoder_hog = nn.Dense(ps * ps, dtype=self.dtype,
                                        name="decoder_hog")
        if "optical_flow" in self.mvm_target:
            self.decoder_flow = nn.Dense(ps * ps * 2, dtype=self.dtype,
                                         name="decoder_flow")
        if "depth" in self.mvm_target:
            self.decoder_depth = nn.Dense(ps * ps, dtype=self.dtype,
                                          name="decoder_depth")
        if "vq" in self.mvm_target:
            if self.vq_on_the_fly:
                up = ps // self.vq_patch
                # conv1x1 D->2D + PixelShuffle(up) => per-cell channels 2D/up^2
                self.decoder_vq = nn.Dense(2 * d, dtype=self.dtype,
                                           name="decoder_vq")
                self.vq_pred_channels = 2 * d // (up * up)
            else:
                # pre-extracted tokens: classify fused tokens directly
                # (ref: main_pretrain.py:203-209 dalle=None branch)
                self.decoder_vq = None
                self.vq_pred_channels = d
            self.fc_mvm = ScoreHead(hidden_size=self.vq_pred_channels,
                                    out_size=self.size_vq, dtype=self.dtype,
                                    name="fc_mvm")
        if "3d_feature" in self.mvm_target or "2d_feature" in self.mvm_target:
            self.fc_mvm = ScoreHead(hidden_size=d,
                                    out_size=self.feat_target_size,
                                    dtype=self.dtype, name="fc_mvm")
        if "2d_clip" in self.mvm_target:
            # the paper's 8th target family — ADVERTISED in the reference
            # README but never implemented there (no clip import exists in
            # the reference tree; SURVEY.md §"What the reference is").
            # Regressor to the CLIP width, wired like the 2d_feature head.
            self.fc_mvm_clip = ScoreHead(hidden_size=d,
                                         out_size=self.clip_arch[0],
                                         dtype=self.dtype,
                                         name="fc_mvm_clip")
        if self.vq_on_the_fly:
            # frozen dVAE encoder teacher lives inside the model so token
            # extraction fuses into the train step (ref: main_pretrain.py:197)
            from empirical_mvm_tpu.teachers.dvae import DvaeEncoder
            self.dvae = DvaeEncoder(dtype=self.dtype, name="dvae")
        if "optical_flow" in self.mvm_target:
            # frozen RAFT teacher (ref: main_pretrain.py:184-188)
            from empirical_mvm_tpu.teachers.raft import RAFT
            self.raft = RAFT(dtype=self.dtype, name="raft")
        if "depth" in self.mvm_target:
            # frozen DPT-Large depth teacher (ref: main_pretrain.py:189-193)
            from empirical_mvm_tpu.teachers.dpt import DPTDepth
            self.dpt = DPTDepth(dtype=self.dtype, name="dpt")
        if "3d_feature" in self.mvm_target:
            # frozen Video-Swin-base feature teacher (ref: main_pretrain.py:153-163).
            # Teacher swins take the Pallas LN path: fwd-only, so the
            # custom-VJP fusion penalty that rules it out for TRAINED swins
            # doesn't apply, and the teacher's LN stats otherwise cost
            # ~20ms/step in XLA reduce fusions (round-3 profile)
            import dataclasses as _dc

            from empirical_mvm_tpu.core.config import SwinConfig
            from empirical_mvm_tpu.models.video_swin import SwinTransformer3D
            self.feature_model = SwinTransformer3D(
                config=_dc.replace(SwinConfig.base(),
                                   use_pallas_layernorm=True),
                dtype=self.dtype, name="feature_model")
        elif "2d_feature" in self.mvm_target:
            # frozen 2D Swin-base feature teacher (ref: main_pretrain.py:164-174)
            import dataclasses as _dc

            from empirical_mvm_tpu.models.encoders2d import swin2d_config
            from empirical_mvm_tpu.models.video_swin import SwinTransformer3D
            self.feature_model = SwinTransformer3D(
                config=_dc.replace(swin2d_config("base"),
                                   use_pallas_layernorm=True),
                dtype=self.dtype, name="feature_model")
        if "2d_clip" in self.mvm_target:
            # frozen CLIP ViT-B/32 visual tower (the missing 8th target;
            # fused attention + Pallas LN — same frozen-teacher policy as
            # DPT/the feature swins)
            from empirical_mvm_tpu.teachers.clip import CLIPVisual
            cd, cl, ch, cm = self.clip_arch
            self.clip_model = CLIPVisual(hidden_size=cd, num_layers=cl,
                                         num_heads=ch, mlp_dim=cm,
                                         use_pallas=True, dtype=self.dtype,
                                         name="clip_model")

    # ---- helpers over the fused sequence ----

    def _split_tokens(self, out, t, h, w):
        lv = t * (1 + h * w)
        return out[:, :lv], out[:, lv:]

    def patch_tokens(self, out_mvm, t, h, w):
        """Drop the per-frame CLS, return the (B, T, h, w, D) grid
        (ref: main_pretrain.py:391,425 non_cls_out_mvm)."""
        b, lv, d = out_mvm.shape
        l = lv // t
        x = out_mvm.reshape(b, t, l, d)[:, :, 1:, :]
        return x.reshape(b, t, h, w, d)

    def decode_pixel(self, grid):
        ps = self.config.size_patch
        return pixel_shuffle_tokens(self.decoder_pixel(grid), ps, 3)

    def decode_hog(self, grid):
        ps = self.config.size_patch
        return pixel_shuffle_tokens(self.decoder_hog(grid), ps, 1)[..., 0]

    def decode_depth(self, grid):
        ps = self.config.size_patch
        return pixel_shuffle_tokens(self.decoder_depth(grid), ps, 1)[..., 0]

    def decode_flow(self, grid):
        """Adjacent-frame token concat then decode to 2-channel flow
        (ref: main_pretrain.py:391-399)."""
        ps = self.config.size_patch
        pair = jnp.concatenate([grid[:, :-1], grid[:, 1:]], axis=-1)
        return pixel_shuffle_tokens(self.decoder_flow(pair), ps, 2)

    def decode_vq_logits(self, grid):
        """(ref: main_pretrain.py:492-500): 1x1 conv to 2D channels, shuffle
        to the dVAE cell grid, classify 8192 ways."""
        ps = self.config.size_patch
        up = ps // self.vq_patch
        x = self.decoder_vq(grid)                                  # (B,T,h,w,2D)
        x = pixel_shuffle_tokens(x, up, self.vq_pred_channels)     # (B,T,hv,wv,C)
        return self.fc_mvm(x)                                      # (...,8192)

    def decode_feature(self, out_mvm, t, h, w):
        """(ref: main_pretrain.py:513-514)"""
        grid = self.patch_tokens(out_mvm, t, h, w)
        return self.fc_mvm(grid)

    def get_att(self, img, txt, mask, deterministic: bool = True):
        """Attention rollout for 'am' masking (ref: main_pretrain.py:211-215):
        mean over heads per layer, summed over layers and query positions."""
        fi, mi, ft, mt = self.go_feat(img, txt, mask,
                                      deterministic=deterministic)
        _, attns = self.go_cross(fi, mi, ft, mt, output_attentions=True,
                                 deterministic=deterministic)
        att = jnp.stack([a.mean(axis=1) for a in attns])  # (L, B, Q, K)
        return att.sum(axis=(0, 2))                       # (B, K)

    def __call__(self, img, txt, mask, rng: Optional[jax.Array] = None,
                 deterministic: bool = True):
        """Forward for one pretrain step (ref: main_pretrain.py:226-267).
        Returns out_mtm logits, raw out_mvm tokens, vtm logits, and smtm
        logits if enabled. ``rng`` drives the in-batch negative sampling."""
        b, t = img.shape[:2]
        h = w = img.shape[2] // self.config.size_patch
        o = min(b, self.num_options)

        fi, mi, ft, mt = self.go_feat(img, txt, mask,
                                      deterministic=deterministic)

        # ---- VTM with in-batch negatives, vectorized ----
        # (ref: main_pretrain.py:243-260). Row i pairs video i with caption i
        # (positive) and O-1 random other captions. The reference pushes all
        # B*O pairs through go_cross, but its (i, i) positive pair is the
        # exact computation of the MTM pass — we score the positive from
        # that pass's CLS and run fusion only on the B*(O-1) negatives,
        # cutting the VTM fusion cost 25% with identical objective
        # semantics. The MTM pass and the negatives RIDE ONE go_cross call
        # (rows are independent under the full attention mask): one stack of
        # 12-layer GEMMs at 4x the rows instead of two sequential passes —
        # fewer, fatter MXU ops.
        if rng is None:
            rng = jax.random.PRNGKey(0)
        if o > 1:
            scores = jax.random.uniform(rng, (b, b))
            scores = scores - jnp.eye(b) * 2.0                # never self
            _, neg_idx = jax.lax.top_k(scores, o - 1)         # (B, O-1)
            rep = lambda x: jnp.repeat(x, o - 1, axis=0)      # video side
            gather = lambda x: x[neg_idx.reshape(-1)]         # caption side
            all_out, _ = self.go_cross(
                jnp.concatenate([fi, rep(fi)], axis=0),
                jnp.concatenate([mi, rep(mi)], axis=0),
                jnp.concatenate([ft, gather(ft)], axis=0),
                jnp.concatenate([mt, gather(mt)], axis=0),
                deterministic=deterministic)
            out, p_out = all_out[:b], all_out[b:]
        else:
            out, _ = self.go_cross(fi, mi, ft, mt,
                                   deterministic=deterministic)
            p_out = None
        out_mvm, out_txt = self._split_tokens(out, t, h, w)
        out_mtm = self.fc_mtm(out_txt)

        out_smtm = None
        if "smtm" in self.pretrain_tasks:
            s_out, _ = self.go_cross(fi, mi, ft, mt, attn_mask_type="seq2seq",
                                     deterministic=deterministic)
            _, s_txt = self._split_tokens(s_out, t, h, w)
            out_smtm = self.fc_mtm(s_txt)

        cls_pos = t * (1 + h * w)                              # first text token
        pos_logit = self.fc(out[:, cls_pos, :],
                            deterministic=deterministic)       # (B, 1)
        if p_out is not None:
            neg_logit = self.fc(p_out[:, cls_pos, :],
                                deterministic=deterministic)
            out_vtm = jnp.concatenate(
                [pos_logit, neg_logit.reshape(b, o - 1)], axis=1)
        else:
            out_vtm = pos_logit

        return {"out_mtm": out_mtm, "out_mvm": out_mvm, "out_vtm": out_vtm,
                "out_smtm": out_smtm,
                "ans_vtm": jnp.zeros((b,), jnp.int32)}

    def losses(self, img, txt, mask, vq=None, hog=None, corrupt=None,
               deterministic: bool = False):
        """One full pretrain step: on-device masking + forward + all losses
        (ref: Agent_Pretrain.masking at main_pretrain.py:276-372,
        step at :555-569, calc_mvm_loss at :374-553).

        ``img`` is the UNMASKED clip — fp32 ImageNet-normalized or raw
        uint8 (normalized here on device, quartering host->device bytes);
        masking happens here, inside the jitted program. ``corrupt`` (B,)
        bool zeroes clips post-normalization, reproducing the reference's
        corrupt-row zero fallback (ref: main_pretrain.py:94-117) for the
        uint8 pipeline.
        """
        from empirical_mvm_tpu.data.masking import apply_masking
        from empirical_mvm_tpu.ops.preprocess import maybe_normalize
        from empirical_mvm_tpu.train.losses import (
            cross_entropy_ignore, masked_l1)

        img = maybe_normalize(img)
        if corrupt is not None:
            img = jnp.where(corrupt[:, None, None, None, None],
                            jnp.zeros((), img.dtype), img)

        k_mask = self.make_rng("mask")
        k_neg = self.make_rng("mask")

        att_scores = None
        if "am" in self.pretrain_masks:
            # extra no-grad forward on the unmasked batch (ref: :321-323)
            att_scores = jax.lax.stop_gradient(
                self.get_att(img, txt, mask, deterministic=True))

        mb = apply_masking(
            k_mask, img, txt, vq,
            special_token_ids=self.special_token_ids,
            mask_token_id=self.mask_token_id,
            patch_size=self.config.size_patch,
            p_mask=self.p_mask, mask_types=self.pretrain_masks,
            att_scores=att_scores)

        out = self(mb.img, mb.txt, mask, rng=k_neg,
                   deterministic=deterministic)
        t = img.shape[1]
        h = w = img.shape[2] // self.config.size_patch

        ls = {}
        ls["mtm"] = cross_entropy_ignore(out["out_mtm"], mb.ans_mtm)
        ls["vtm"] = cross_entropy_ignore(
            out["out_vtm"] / self.temp, out["ans_vtm"])
        if out["out_smtm"] is not None:
            ls["smtm"] = cross_entropy_ignore(out["out_smtm"], mb.ans_mtm)

        if "mvm" in self.pretrain_tasks:
            grid = self.patch_tokens(out["out_mvm"], t, h, w)
            if "pixel" in self.mvm_target:
                pred = self.decode_pixel(grid)
                ls["mvm_pixel"] = masked_l1(pred, img, mb.mvm_mask,
                                            channel_div=3.0)
            if "hog" in self.mvm_target:
                hog_mask = mb.mvm_mask[..., 0]
                if hog is None:
                    # on-device HOG teacher over the UNMASKED normalized clip
                    # (ref computes it in loader workers, dataset.py:197-206).
                    # The reference computes HOG BEFORE its corrupt zeroing,
                    # so corrupt rows there train against real-frame HOG from
                    # a zeroed clip — a mismatch either way. We exclude
                    # corrupt rows from the HOG loss instead (documented
                    # deviation; round-2 advisor finding).
                    from empirical_mvm_tpu.ops.hog import hog_image
                    hog = jax.lax.stop_gradient(hog_image(img))
                    if corrupt is not None:
                        hog_mask = jnp.where(
                            corrupt[:, None, None, None],
                            jnp.zeros((), hog_mask.dtype), hog_mask)
                pred = self.decode_hog(grid)
                ls["mvm_hog"] = masked_l1(pred, hog, hog_mask)
            if "vq" in self.mvm_target and self.vq_on_the_fly:
                # dVAE teacher forward in no-grad (ref: main_pretrain.py:480-496)
                from empirical_mvm_tpu.teachers.dvae import (map_pixels,
                                                             unnormalize_imagenet)
                b = img.shape[0]
                flat = img.reshape((-1,) + img.shape[2:])
                pix = map_pixels(jnp.clip(
                    unnormalize_imagenet(flat.astype(jnp.float32)), 0, 1))
                z = jax.lax.stop_gradient(self.dvae(pix))
                vq_tokens = jnp.argmax(z, axis=-1)           # (B*T, hv, wv)
                hv = vq_tokens.shape[1]
                # masked-cell answers via maxpool of the pixel cover
                # (ref: main_pretrain.py:487-490)
                cov_cells = jnp.max(
                    mb.mvm_mask[..., 0].reshape(b * t, hv, self.vq_patch,
                                                hv, self.vq_patch),
                    axis=(2, 4))
                ans = jnp.where(cov_cells > 0, vq_tokens, -1)
                ans = ans.reshape(b, t, hv, hv)
                logits = self.decode_vq_logits(grid)          # (B,T,hv,wv,V)
                ls["mvm_vq"] = cross_entropy_ignore(logits, ans)
            elif "vq" in self.mvm_target:
                logits = self.fc_mvm(out["out_mvm"],
                                     deterministic=deterministic)
                ls["mvm_vq"] = cross_entropy_ignore(logits, mb.ans_mvm)
            if "depth" in self.mvm_target:
                # DPT teacher forward in no-grad, masked L1 with the
                # reference's /3 channel quirk (ref: main_pretrain.py:433-452
                # divides by _in_C even though depth has one channel)
                hh, ww = img.shape[2], img.shape[3]
                flat = img.reshape(-1, hh, ww, 3)
                target = jax.lax.stop_gradient(self.dpt(flat))
                target = target.reshape(img.shape[0], t, hh, ww)
                pred = self.decode_depth(grid)
                ls["mvm_depth"] = masked_l1(pred, target,
                                            mb.mvm_mask[..., 0],
                                            channel_div=3.0)
            if "optical_flow" in self.mvm_target and t > 1:
                # RAFT teacher on adjacent frame pairs, magnitude-filtered
                # masked L1 (ref: main_pretrain.py:386-419)
                hh, ww = img.shape[2], img.shape[3]
                i1 = img[:, :-1].reshape(-1, hh, ww, 3)
                i2 = img[:, 1:].reshape(-1, hh, ww, 3)
                target = jax.lax.stop_gradient(self.raft(i1, i2))
                target = target.reshape(img.shape[0], t - 1, hh, ww, 2)
                pred = self.decode_flow(grid)                 # (B,T-1,H,W,2)
                cover = mb.mvm_mask[:, :-1] + mb.mvm_mask[:, 1:]
                mag_ok = (jnp.max(jnp.abs(target), axis=(2, 3, 4))
                          < 50.0)                             # (B, T-1)
                flow_mask = ((cover > 0)
                             & mag_ok[:, :, None, None, None])
                ls["mvm_flow"] = masked_l1(pred, target, flow_mask,
                                           channel_div=2.0)
            if "3d_feature" in self.mvm_target:
                # frozen Video-Swin features as regression target
                # (ref: main_pretrain.py:508-526)
                target = jax.lax.stop_gradient(
                    self.feature_model(img, deterministic=True))
                pred = self.fc_mvm(self.patch_tokens(out["out_mvm"], t, h, w),
                                   deterministic=deterministic)
                ls["mvm_3d_feature"] = masked_l1(pred, target,
                                                 mb.cov[..., None],
                                                 channel_div=3.0)
            if "2d_feature" in self.mvm_target:
                # frozen 2D Swin features per frame (ref: main_pretrain.py:527-545)
                target = jax.lax.stop_gradient(
                    self.feature_model(img, deterministic=True))
                pred = self.fc_mvm(self.patch_tokens(out["out_mvm"], t, h, w),
                                   deterministic=deterministic)
                ls["mvm_2d_feature"] = masked_l1(pred, target,
                                                 mb.cov[..., None],
                                                 channel_div=3.0)
            if "2d_clip" in self.mvm_target:
                # frozen CLIP patch features per frame — the paper's 8th
                # target, absent from the reference code (README-only);
                # wired like the 2d_feature branch. The pipeline ships
                # ImageNet-normalized clips; CLIP gets its own
                # normalization via an elementwise renorm.
                from empirical_mvm_tpu.teachers.clip import (
                    renormalize_imagenet_to_clip)
                bsz, tt = img.shape[0], img.shape[1]
                frames = renormalize_imagenet_to_clip(
                    img.reshape((bsz * tt,) + img.shape[2:]))
                feats = self.clip_model.features(frames)   # (B*T, h, w, D)
                target = jax.lax.stop_gradient(
                    feats.reshape((bsz, tt) + feats.shape[1:]))
                pred = self.fc_mvm_clip(
                    self.patch_tokens(out["out_mvm"], t, h, w),
                    deterministic=deterministic)
                ls["mvm_2d_clip"] = masked_l1(pred, target,
                                              mb.cov[..., None],
                                              channel_div=3.0)

        total = jnp.asarray(0.0, jnp.float32)
        for v in ls.values():
            total = total + v
        ls["total"] = total
        return ls
