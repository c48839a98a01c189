"""Video captioning: seq2seq-masked MLM training + autoregressive generation.

Parity target: ``VIOLET_Captioning`` (ref: model_for_captioning.py:35-310)
and ``Agent_Captioning`` (ref: main_caption.py:44-163):
* training: corrupt caption tokens, seq2seq (causal-text) attention over
  [video ; text], label-smoothed CE on masked positions
  (ref: main_caption.py:56-68, model_for_captioning.py:8-33);
* inference: greedy / top-k / top-p generation with the [MASK]-append trick —
  each step appends [MASK], re-encodes, reads logits at the mask
  (ref: model_for_captioning.py:239-310).

TPU-native: generation is a ``lax.scan`` over a static max length — the
reference's Python while-loop with growing shapes (hostile to jit) becomes a
fixed-shape program; one compile, then every clip decodes on device. (The
reference's KV-cache path was never finished — model_for_captioning.py:102,
215 raise NotImplementedError; a cache is a follow-up optimization here, not
a parity requirement.)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from empirical_mvm_tpu.models.bert import BertMLMHead
from empirical_mvm_tpu.models.violet import VioletBase


class VioletCaptioning(VioletBase):
    """(ref: model_for_captioning.py:35-237)"""

    cls_token_id: int = 101
    sep_token_id: int = 102
    pad_token_id: int = 0
    mask_token_id: int = 103

    def setup_heads(self):
        self.fc_mtm = BertMLMHead(self.config.fusion, dtype=self.dtype,
                                  name="fc_mtm")

    def __call__(self, img, txt, mask, deterministic: bool = True):
        """Training forward: seq2seq attention, MLM logits over text
        positions (ref: main_caption.py:56-68)."""
        fi, mi, ft, mt = self.go_feat(img, txt, mask,
                                      deterministic=deterministic)
        out, _ = self.go_cross(fi, mi, ft, mt, attn_mask_type="seq2seq",
                               deterministic=deterministic)
        return self.fc_mtm(out[:, fi.shape[1]:])

    def generate(self, img, max_len: int = 20, *, decode: str = "greedy",
                 top_k: int = 0, top_p: float = 0.0, temperature: float = 1.0,
                 rng: Optional[jax.Array] = None):
        """Autoregressive caption generation
        (ref: model_for_captioning.py:114-165,239-310).

        Returns (B, max_len) token ids starting with [CLS].
        """
        b = img.shape[0]
        fi, mi = self.enc_img(img, deterministic=True)
        if rng is None:
            rng = jax.random.PRNGKey(0)

        tokens0 = jnp.full((b, max_len), self.pad_token_id, jnp.int32)
        tokens0 = tokens0.at[:, 0].set(self.cls_token_id)
        done0 = jnp.zeros((b,), bool)

        def step(carry, i):
            tokens, done, rng = carry
            rng, sub = jax.random.split(rng)
            # place [MASK] at position i (the append trick, ref :251-258)
            cur = tokens.at[:, i].set(
                jnp.where(done, self.pad_token_id, self.mask_token_id))
            mask_txt = (jnp.arange(max_len)[None, :] <= i).astype(jnp.int32)
            mask_txt = jnp.broadcast_to(mask_txt, (b, max_len))
            ft = self.enc_txt(cur, mask_txt=mask_txt, deterministic=True)
            out, _ = self.go_cross(fi, mi, ft, mask_txt,
                                   attn_mask_type="seq2seq",
                                   deterministic=True)
            logits = self.fc_mtm(out[:, fi.shape[1] + i])      # (B, V)
            logits = logits.astype(jnp.float32) / temperature
            if decode == "greedy":
                nxt = jnp.argmax(logits, axis=-1)
            else:
                if top_k > 0:      # (ref: top_k_top_p_filtering :169-198)
                    kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
                    logits = jnp.where(logits < kth, -jnp.inf, logits)
                if top_p > 0.0:
                    sorted_l = jnp.sort(logits, axis=-1)[:, ::-1]
                    probs = jax.nn.softmax(sorted_l, axis=-1)
                    cum = jnp.cumsum(probs, axis=-1)
                    cutoff_idx = jnp.sum(cum < top_p, axis=-1)
                    cutoff = jnp.take_along_axis(sorted_l, cutoff_idx[:, None],
                                                 axis=-1)
                    logits = jnp.where(logits < cutoff, -jnp.inf, logits)
                nxt = jax.random.categorical(sub, logits, axis=-1)
            nxt = jnp.where(done, self.pad_token_id, nxt.astype(jnp.int32))
            tokens = tokens.at[:, i].set(nxt)
            done = jnp.logical_or(done, nxt == self.sep_token_id)
            return (tokens, done, rng), None

        (tokens, done, _), _ = jax.lax.scan(
            step, (tokens0, done0, rng), jnp.arange(1, max_len))
        return tokens

    def generate_beam(self, img, max_len: int = 20, *, beam_size: int = 4,
                      length_penalty: float = 0.6):
        """Beam-search caption generation (BEYOND parity: the reference's
        beam/KV-cache paths raise NotImplementedError,
        model_for_captioning.py:102,215).

        Standard length-normalized beam search over the [MASK]-append
        decoder: all ``B*beam_size`` hypotheses batch through one fusion
        forward per position inside a ``lax.scan`` — static shapes, one
        compile. Finished beams emit [PAD] at log-prob 0 so their scores
        freeze but still compete in top-k. Returns (B, max_len) ids of the
        best beam under score / length**length_penalty.
        """
        b = img.shape[0]
        k = beam_size
        fi, mi = self.enc_img(img, deterministic=True)
        n_vid = fi.shape[1]
        fi_k = jnp.repeat(fi, k, axis=0)
        mi_k = jnp.repeat(mi, k, axis=0)

        tokens0 = jnp.full((b, k, max_len), self.pad_token_id, jnp.int32)
        tokens0 = tokens0.at[:, :, 0].set(self.cls_token_id)
        # only beam 0 is live at step 1 (identical prefixes otherwise)
        scores0 = jnp.where(jnp.arange(k) == 0, 0.0, -1e9)[None, :]
        scores0 = jnp.broadcast_to(scores0, (b, k))
        done0 = jnp.zeros((b, k), bool)

        def step(carry, i):
            tokens, scores, done = carry
            flat = tokens.reshape(b * k, max_len)
            cur = flat.at[:, i].set(
                jnp.where(done.reshape(-1), self.pad_token_id,
                          self.mask_token_id))
            mask_txt = (jnp.arange(max_len)[None, :] <= i).astype(jnp.int32)
            mask_txt = jnp.broadcast_to(mask_txt, (b * k, max_len))
            ft = self.enc_txt(cur, mask_txt=mask_txt, deterministic=True)
            out, _ = self.go_cross(fi_k, mi_k, ft, mask_txt,
                                   attn_mask_type="seq2seq",
                                   deterministic=True)
            logits = self.fc_mtm(out[:, n_vid + i]).astype(jnp.float32)
            v = logits.shape[-1]
            logp = jax.nn.log_softmax(logits, axis=-1).reshape(b, k, v)
            pad_only = jnp.full((v,), -jnp.inf).at[self.pad_token_id].set(0.0)
            logp = jnp.where(done[:, :, None], pad_only[None, None, :], logp)
            cand = (scores[:, :, None] + logp).reshape(b, k * v)
            top_scores, top_idx = jax.lax.top_k(cand, k)       # (B, K)
            beam_idx = top_idx // v
            tok_idx = (top_idx % v).astype(jnp.int32)
            tokens = jnp.take_along_axis(tokens, beam_idx[:, :, None], axis=1)
            done = jnp.take_along_axis(done, beam_idx, axis=1)
            new_tok = jnp.where(done, self.pad_token_id, tok_idx)
            tokens = tokens.at[:, :, i].set(new_tok)
            done = jnp.logical_or(done, new_tok == self.sep_token_id)
            return (tokens, top_scores, done), None

        (tokens, scores, done), _ = jax.lax.scan(
            step, (tokens0, scores0, done0), jnp.arange(1, max_len))
        lengths = jnp.sum(tokens != self.pad_token_id, axis=-1)  # (B, K)
        norm = scores / jnp.maximum(lengths, 1).astype(jnp.float32) \
            ** length_penalty
        best = jnp.argmax(norm, axis=-1)                         # (B,)
        return jnp.take_along_axis(
            tokens, best[:, None, None], axis=1)[:, 0]
