"""Masking engine for pretraining: rm / bm / am, fully vectorized.

Parity target: ``Agent_Pretrain.masking`` (ref: main_pretrain.py:276-372),
whose per-sample Python loops (the hot spot flagged in SURVEY.md §3.1) become
batched JAX ops under a single PRNG key — so masking runs *inside* the jitted
train step on device, not in the input pipeline.

Semantics preserved:
* text masking: Bernoulli(p) over non-special tokens, answers -1 elsewhere
  (ref: main_pretrain.py:305,345,354);
* ``bm``: union of T random 3D tubes with sizes t~U[1,T), h~U[1,2h/3),
  w~U[1,2w/3) (ref: main_pretrain.py:308-318);
* ``rm``: Bernoulli(p) over the (T, h*w) patch grid, CLS excluded
  (ref: main_pretrain.py:347-352);
* ``am``: sample k positions without replacement proportional to fused
  attention-rollout scores (ref: main_pretrain.py:320-343) — implemented as
  Gumbel top-k, the exact JAX-native equivalent of ``T.multinomial``;
* per-sample mask-type choice from the configured pool
  (ref: main_pretrain.py:303);
* masked patches are zeroed in pixel space via a 32x-upsampled cover
  (ref: main_pretrain.py:356-364).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp


class MaskedBatch(NamedTuple):
    img: jax.Array        # (B, T, H, W, 3) masked pixels
    txt: jax.Array        # (B, X) with [MASK] substitutions
    ans_mtm: jax.Array    # (B, X) original token at masked pos, else -1
    ans_mvm: jax.Array    # (B, T*(1+h*w)) vq target at masked patch, else -1
    mvm_mask: jax.Array   # (B, T, H, W, 1) pixel-space cover in {0,1}
    cov: jax.Array        # (B, T, h, w) patch-space cover in {0,1}


def _text_mask(key, txt, special_mask, p):
    """(ref: main_pretrain.py:305) Bernoulli over non-special tokens."""
    pick = jax.random.uniform(key, txt.shape) < p
    return jnp.logical_and(pick, jnp.logical_not(special_mask))


def _rm_video_cov(key, b, t, h, w, p):
    """(ref: main_pretrain.py:347-352) random patch mask."""
    return (jax.random.uniform(key, (b, t, h, w)) < p).astype(jnp.float32)


def _bm_video_cov(key, b, t, h, w):
    """(ref: main_pretrain.py:308-318) union of T random 3D tubes per sample."""
    max_t = max(t, 2)          # np.random.randint(1, _T) needs _T >= 2
    max_h = max(h * 2 // 3, 2)
    max_w = max(w * 2 // 3, 2)

    def one_block(key):
        k = jax.random.split(key, 6)
        if t > 1:
            bt = jax.random.randint(k[0], (), 1, max_t)
        else:
            bt = jnp.int32(1)
        bh = jax.random.randint(k[1], (), 1, max_h)
        bw = jax.random.randint(k[2], (), 1, max_w)
        t1 = jax.random.randint(k[3], (), 0, t - bt + 1)
        h1 = jax.random.randint(k[4], (), 0, h - bh + 1)
        w1 = jax.random.randint(k[5], (), 0, w - bw + 1)
        it = jnp.arange(t)[:, None, None]
        ih = jnp.arange(h)[None, :, None]
        iw = jnp.arange(w)[None, None, :]
        return ((it >= t1) & (it < t1 + bt)
                & (ih >= h1) & (ih < h1 + bh)
                & (iw >= w1) & (iw < w1 + bw))

    def one_sample(key):
        blocks = jax.vmap(one_block)(jax.random.split(key, t))  # T blocks
        return jnp.any(blocks, axis=0).astype(jnp.float32)

    return jax.vmap(one_sample)(jax.random.split(key, b))


def _am_cov_and_text(key, att_scores, special_all, t, h, w, x_len, p):
    """(ref: main_pretrain.py:320-343) attention-guided masking.

    ``att_scores``: (B, Lv + X) fused attention rollout (sum over layers and
    query positions). Samples k = floor((Lv+X)*p) positions without
    replacement via Gumbel top-k, splits them into video-patch and text masks.
    """
    b, l = att_scores.shape
    lv = t * (1 + h * w)
    k = max(int(l * p), 1)
    scores = jnp.where(special_all, 0.0, att_scores.astype(jnp.float32))
    logp = jnp.log(jnp.clip(scores, 1e-20))
    g = jax.random.gumbel(key, scores.shape)
    _, idx = jax.lax.top_k(logp + g, k)                     # (B, k)
    sel = jnp.zeros((b, l), bool)
    sel = jax.vmap(lambda s, i: s.at[i].set(True))(sel, idx)
    sel = jnp.where(special_all, False, sel)

    sel_v = sel[:, :lv].reshape(b, t, 1 + h * w)[:, :, 1:]  # drop per-frame CLS
    cov = sel_v.reshape(b, t, h, w).astype(jnp.float32)
    sel_txt = sel[:, lv:lv + x_len]
    return cov, sel_txt


def apply_masking(
    key: jax.Array,
    img: jax.Array,
    txt: jax.Array,
    vq: jax.Array | None,
    *,
    special_token_ids: Sequence[int],
    mask_token_id: int,
    patch_size: int = 32,
    p_mask: float = 0.15,
    mask_types: Sequence[str] = ("bm", "rm"),
    att_scores: jax.Array | None = None,
) -> MaskedBatch:
    """Vectorized equivalent of Agent_Pretrain.masking
    (ref: main_pretrain.py:276-372).

    Args:
      img: (B, T, H, W, 3); txt: (B, X) int32; vq: optional (B, T*(1+h*w))
        pre-extracted dVAE tokens with -1 at per-frame CLS slots
        (ref: main_pretrain.py:87).
      att_scores: required iff "am" in mask_types — (B, Lv+X) rollout from a
        preliminary forward (the reference runs this extra forward in the
        agent at main_pretrain.py:321-323; here it lives in the train step).
    """
    b, t, hh, ww, _ = img.shape
    h, w = hh // patch_size, ww // patch_size
    x_len = txt.shape[1]

    spc_txt = jnp.zeros(txt.shape, bool)
    for tok in special_token_ids:
        spc_txt = jnp.logical_or(spc_txt, txt == tok)
    spc_txt = jnp.logical_or(spc_txt, txt == mask_token_id)

    if p_mask <= 0:
        lv = t * (1 + h * w)
        return MaskedBatch(
            img=img, txt=txt,
            ans_mtm=jnp.full(txt.shape, -1, jnp.int32),
            ans_mvm=jnp.full((b, lv), -1, jnp.int32),
            mvm_mask=jnp.zeros((b, t, hh, ww, 1), img.dtype),
            cov=jnp.zeros((b, t, h, w), jnp.float32))

    k_choice, k_txt, k_rm, k_bm, k_am = jax.random.split(key, 5)

    # per-sample mask-type choice (ref: main_pretrain.py:303)
    choice = jax.random.randint(k_choice, (b,), 0, len(mask_types))

    covs, txt_sels = [], []
    for mt in mask_types:
        if mt == "rm":
            covs.append(_rm_video_cov(k_rm, b, t, h, w, p_mask))
            txt_sels.append(_text_mask(k_txt, txt, spc_txt, p_mask))
        elif mt == "bm":
            covs.append(_bm_video_cov(k_bm, b, t, h, w))
            txt_sels.append(_text_mask(k_txt, txt, spc_txt, p_mask))
        elif mt == "am":
            if att_scores is None:
                raise ValueError("'am' masking requires att_scores")
            spc_v = jnp.zeros((b, t * (1 + h * w)), bool)
            if vq is not None:
                spc_v = vq == -1
            else:
                cls_slots = (jnp.arange(t * (1 + h * w)) % (1 + h * w)) == 0
                spc_v = jnp.broadcast_to(cls_slots, (b, t * (1 + h * w)))
            spc_all = jnp.concatenate([spc_v, spc_txt], axis=1)
            cov_am, sel_am = _am_cov_and_text(
                k_am, att_scores, spc_all, t, h, w, x_len, p_mask)
            covs.append(cov_am)
            txt_sels.append(sel_am)
        else:
            raise ValueError(f"unknown mask type {mt}")

    cov = jnp.stack(covs)[choice, jnp.arange(b)]           # (B, T, h, w)
    txt_sel = jnp.stack(txt_sels)[choice, jnp.arange(b)]   # (B, X)

    ans_mtm = jnp.where(txt_sel, txt, -1).astype(jnp.int32)
    new_txt = jnp.where(txt_sel, mask_token_id, txt)

    # patch grid -> per-token answers (ref: main_pretrain.py:357-361)
    cov_tok = cov.reshape(b, t, h * w)
    cov_full = jnp.concatenate(
        [jnp.zeros((b, t, 1), cov.dtype), cov_tok], axis=2).reshape(b, -1)
    if vq is not None:
        ans_mvm = jnp.where(cov_full > 0, vq, -1).astype(jnp.int32)
    else:
        ans_mvm = jnp.full(cov_full.shape, -1, jnp.int32)

    # pixel-space cover, 32x upsample (ref: main_pretrain.py:362-364)
    pix = jnp.repeat(jnp.repeat(cov, patch_size, axis=2), patch_size, axis=3)
    pix = pix[..., None].astype(img.dtype)                 # (B, T, H, W, 1)
    masked_img = img * (1.0 - pix)

    return MaskedBatch(img=masked_img, txt=new_txt, ans_mtm=ans_mtm,
                       ans_mvm=ans_mvm, mvm_mask=pix, cov=cov)
