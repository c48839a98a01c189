"""Downstream task models: retrieval, QA-MC, QA-OE, each a thin head over
the VIOLET trunk — preserving the reference's (Dataset, Model, Agent) triple
pattern (SURVEY.md §1).

Parity targets:
* VIOLET_Retrieval (ref: main_retrieval.py:57-85): B x B pairwise
  cross-encoding with a VTM-style score head. The reference's Python loop
  building B^2 pairs is vectorized into repeat/tile + one fused go_cross.
* VIOLET_RetrievalEval (ref: eval_retrieval.py:96-115): two-stage eval —
  'feat' (multi-clip mean-pooled video feats) and 'cross' scoring.
* VIOLET_QAMC (ref: main_qamc.py:50-98): per-option cross-encode + score.
* VIOLET_QAMC_MLM_Head_GEN (ref: main_qamc_tsv_mlm_gen_ans_idx.py:83-100):
  options in the prompt, predict the answer digit token at [MASK].
* VIOLET_QAOE (ref: main_qaoe.py:41-57): answer-vocab classifier at the text
  CLS position.
* VIOLET_QAOE_LSMDC / MLM head (ref: main_qaoe_lsmdc_fib.py:55-84): MLM
  logits at every text position; answer read at the [MASK] slot.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from empirical_mvm_tpu.models.bert import BertMLMHead
from empirical_mvm_tpu.models.violet import ScoreHead, VioletBase


def _cls_pos(img_shape, size_patch: int) -> int:
    """Index of the first text token in the fused sequence — the reference
    scores at out[:, (1+h*w)*T] (ref: main_retrieval.py:81)."""
    t, hh = img_shape[1], img_shape[2]
    h = w = hh // size_patch
    return t * (1 + h * w)


class VioletRetrieval(VioletBase):
    """(ref: main_retrieval.py:57-85)"""

    def setup_heads(self):
        self.fc = ScoreHead(hidden_size=self.config.hidden_size,
                            dtype=self.dtype, name="fc")

    def __call__(self, img, txt, mask, deterministic: bool = True):
        b = img.shape[0]
        cls_pos = _cls_pos(img.shape, self.config.size_patch)
        fi, mi, ft, mt = self.go_feat(img, txt, mask,
                                      deterministic=deterministic)
        # all-pairs: row-major (video i, caption j) like the ref loop at
        # main_retrieval.py:71-76
        rep = lambda x: jnp.repeat(x, b, axis=0)
        tile = lambda x: jnp.concatenate([x] * b, axis=0)
        out, _ = self.go_cross(rep(fi), rep(mi), tile(ft), tile(mt),
                               deterministic=deterministic)
        scores = self.fc(out[:, cls_pos, :], deterministic=deterministic)
        return scores.reshape(b, b)

    def encode(self, img, txt, mask, deterministic: bool = True):
        """Stage-1 features for two-stage eval, with optional multi-clip
        mean pooling (ref: eval_retrieval.py:100-110). ``img`` may be
        (B, Clips, T, H, W, 3) or (B, T, H, W, 3)."""
        if img.ndim == 6:
            b, clips = img.shape[:2]
            flat = img.reshape((-1,) + img.shape[2:])
            fi, mi = self.enc_img(flat, deterministic=deterministic)
            d = fi.shape[-1]
            fi = fi.reshape(b, clips, -1, d).mean(axis=1)
            mi = mi.reshape(b, clips, -1)[:, 0, :]
        else:
            fi, mi = self.enc_img(img, deterministic=deterministic)
        ft = self.enc_txt(txt, mask_txt=mask, deterministic=deterministic)
        return fi, mi, ft, mask

    def score_pairs(self, feat_img, mask_img, feat_txt, mask_txt,
                    deterministic: bool = True):
        """Stage-2 cross scoring of prepared (text, video) rows
        (ref: eval_retrieval.py:112-115)."""
        out, _ = self.go_cross(feat_img, mask_img, feat_txt, mask_txt,
                               deterministic=deterministic)
        return self.fc(out[:, feat_img.shape[1], :],
                       deterministic=deterministic)[..., 0]


class VioletQAMC(VioletBase):
    """Score-head multiple choice (ref: main_qamc.py:50-98).
    ``txt``/``mask``: (B, O, X) — question ⊕ option per row.

    ``num_video_tokens > 0`` enables the gumbel video-token selection
    variant (ref: main_qamc.py:55-83): multi-head key/query scoring followed
    by hard gumbel-softmax picks a sparse subset of video tokens whose
    attention mask gates the fusion pass."""

    num_video_tokens: int = -1
    gumbel_tau: float = 1.0

    def setup_heads(self):
        d = self.config.hidden_size
        self.fc = ScoreHead(hidden_size=d, dtype=self.dtype, name="fc")
        if self.num_video_tokens > 0:
            from flax import linen as nn
            self.vid_key = nn.Dense(d, use_bias=False, dtype=self.dtype,
                                    name="vid_key")
            self.vid_query = nn.Dense(d, use_bias=False, dtype=self.dtype,
                                      name="vid_query")

    def select_vid_token(self, feat_img, mask_img, deterministic=True):
        """(ref: main_qamc.py:68-83)"""
        from empirical_mvm_tpu.models.bert import extended_attention_mask
        b, l, d = feat_img.shape
        nh = self.num_video_tokens
        hd = d // nh
        k = self.vid_key(feat_img).reshape(b, l, nh, hd).transpose(0, 2, 1, 3)
        q = self.vid_query(feat_img).reshape(b, l, nh, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.float32(d))
        scores = scores + extended_attention_mask(mask_img)
        probs = jax.nn.softmax(scores, axis=-1).sum(axis=-2)   # (B, nh, L)
        # hard gumbel-softmax with straight-through (torch
        # F.gumbel_softmax(hard=True) equivalent)
        g = jax.random.gumbel(self.make_rng("gumbel"), probs.shape) \
            if not deterministic else 0.0
        y = jax.nn.softmax((jnp.log(jnp.clip(probs, 1e-20)) + g)
                           / self.gumbel_tau, axis=-1)
        hard = jax.nn.one_hot(jnp.argmax(y, axis=-1), l, dtype=y.dtype)
        y = hard + y - jax.lax.stop_gradient(y)
        picked = y.sum(axis=1)                                 # (B, L)
        return (mask_img * (picked > 0)).astype(mask_img.dtype)

    def __call__(self, img, txt, mask, deterministic: bool = True):
        b, o, x = txt.shape
        cls_pos = _cls_pos(img.shape, self.config.size_patch)
        fi, mi, ft, mt = self.go_feat(img, txt.reshape(b * o, x),
                                      mask.reshape(b * o, x),
                                      deterministic=deterministic)
        if self.num_video_tokens > 0:
            mi = self.select_vid_token(fi, mi, deterministic=deterministic)
        # video feats come out (B, Lv, D) since img wasn't expanded
        fi = jnp.repeat(fi, o, axis=0)
        mi = jnp.repeat(mi, o, axis=0)
        out, _ = self.go_cross(fi, mi, ft, mt, deterministic=deterministic)
        logits = self.fc(out[:, cls_pos, :], deterministic=deterministic)
        return logits.reshape(b, o)


class VioletQAMCGen(VioletBase):
    """Generative MLM-head multiple choice — the README-recommended TGIF path
    (ref: main_qamc_tsv_mlm_gen_ans_idx.py:83-100). Returns MLM logits over
    the text positions; the agent renormalizes over the digit tokens."""

    def setup_heads(self):
        self.fc_mtm = BertMLMHead(self.config.fusion, dtype=self.dtype,
                                  name="fc_mtm")

    def __call__(self, img, txt, mask, deterministic: bool = True):
        cls_pos = _cls_pos(img.shape, self.config.size_patch)
        fi, mi, ft, mt = self.go_feat(img, txt, mask,
                                      deterministic=deterministic)
        out, _ = self.go_cross(fi, mi, ft, mt, deterministic=deterministic)
        return self.fc_mtm(out[:, cls_pos:])


class VioletQAMCMLMHead(VioletBase):
    """MLM-head multiple choice: each (question, option) row appends [MASK]
    and the model predicts the true/false token there
    (ref: main_qamc_tsv_mlm_head.py:61-95). ``txt``/``mask``: (B, O, X);
    returns per-option MLM logits (B, O, X, V)."""

    def setup_heads(self):
        self.fc_mtm = BertMLMHead(self.config.fusion, dtype=self.dtype,
                                  name="fc_mtm")

    def __call__(self, img, txt, mask, deterministic: bool = True):
        b, o, x = txt.shape
        cls_pos = _cls_pos(img.shape, self.config.size_patch)
        fi, mi, ft, mt = self.go_feat(img, txt.reshape(b * o, x),
                                      mask.reshape(b * o, x),
                                      deterministic=deterministic)
        fi = jnp.repeat(fi, o, axis=0)
        mi = jnp.repeat(mi, o, axis=0)
        out, _ = self.go_cross(fi, mi, ft, mt, deterministic=deterministic)
        logits = self.fc_mtm(out[:, cls_pos:])
        return logits.reshape(b, o, x, -1)


def qamc_mlm_head_accuracy(logits, mask_ans, true_token_id: int,
                           false_token_id: int):
    """Per-option true/false renormalization then argmax over options
    (ref: main_qamc_tsv_mlm_head.py:112-122). logits (B, O, X, V),
    mask_ans (B, O, X) with the true/false token id at the [MASK] slot."""
    import numpy as np
    logits = np.asarray(logits)
    mask_ans = np.asarray(mask_ans)
    b, o, x, _ = logits.shape
    accs = []
    for i in range(b):
        scores, truth = [], []
        for j in range(o):
            pos = np.where(mask_ans[i, j] != -1)[0]
            if len(pos) == 0:
                scores.append(-np.inf)
                truth.append(False)
                continue
            p_true = logits[i, j, pos[0], true_token_id]
            p_false = logits[i, j, pos[0], false_token_id]
            scores.append(p_true / (p_true + p_false + 1e-9))
            truth.append(int(mask_ans[i, j, pos[0]]) == true_token_id)
        pred = int(np.argmax(scores))
        ans = int(np.argmax(truth)) if any(truth) else -1
        accs.append(float(pred == ans))
    return accs


class VioletQAOE(VioletBase):
    """Open-ended QA with an answer-vocab classifier
    (ref: main_qaoe.py:41-57)."""

    size_vocab: int = 1500

    def setup_heads(self):
        self.fc = ScoreHead(hidden_size=self.config.hidden_size,
                            out_size=self.size_vocab, dtype=self.dtype,
                            name="fc")

    def __call__(self, img, txt, mask, deterministic: bool = True):
        cls_pos = _cls_pos(img.shape, self.config.size_patch)
        fi, mi, ft, mt = self.go_feat(img, txt, mask,
                                      deterministic=deterministic)
        out, _ = self.go_cross(fi, mi, ft, mt, deterministic=deterministic)
        return self.fc(out[:, cls_pos, :], deterministic=deterministic)


class VioletQAOEMLMHead(VioletBase):
    """Open-ended QA / fill-in-blank through the MLM head
    (ref: main_qaoe_lsmdc_fib.py:55-84, main_qaoe_tsv_mlm_head.py). The
    answer token is read at the [MASK] position.

    ``prompt_tokens``/``prompt_mask_static``: a fixed-per-run prompt prefix
    (ref: main_qaoe_lsmdc_fib.py:135 reads it from the dataset each step; a
    constant is the jit-friendly equivalent) used when
    ``config.enable_prompt`` and no per-call ``prompt`` is given."""

    prompt_tokens: tuple = ()
    prompt_mask_static: tuple = ()

    def setup_heads(self):
        self.fc_mtm = BertMLMHead(self.config.fusion, dtype=self.dtype,
                                  name="fc_mtm")

    def __call__(self, img, txt, mask, prompt=None,
                 deterministic: bool = True):
        if (prompt is None and self.config.enable_prompt
                and self.prompt_tokens):
            prompt = (jnp.asarray(self.prompt_tokens, jnp.int32),
                      jnp.asarray(self.prompt_mask_static, jnp.int32))
        cls_pos = _cls_pos(img.shape, self.config.size_patch)
        fi, mi, ft, mt = self.go_feat(img, txt, mask,
                                      deterministic=deterministic)
        # optional task-token / prompt prefix (ref: main_qaoe_lsmdc_fib.py:79).
        # Logits are sliced back to the original text positions so callers'
        # mask_ans alignment is unchanged (the reference instead prepends -1
        # to ans — same CE, shifted indexing).
        _, mt, ft, pre = self.prepend_pretxt(
            jnp.zeros_like(txt), mt, ft, prompt=prompt,
            deterministic=deterministic)
        out, _ = self.go_cross(fi, mi, ft, mt, deterministic=deterministic)
        return self.fc_mtm(out[:, cls_pos + pre:])
