"""BERT blocks for the text encoder, cross-modal fusion encoder, and MLM head.

The reference delegates these to HuggingFace ``transformers``
(ref: model.py:85 ``AutoModel.from_pretrained`` for EncTxt,
model.py:124-131 ``AutoModelForMaskedLM`` whose ``.bert.encoder`` becomes the
fusion transformer, main_pretrain.py:148-150 whose ``.cls`` becomes fc_mtm).
Here they are hand-rolled flax modules so the whole model is one XLA program:
bf16 GEMMs on the MXU, fp32 softmax/LayerNorm, no HF runtime dependency.

Parameter layout mirrors HF naming closely enough that
``models/torch_import.py`` maps released checkpoints mechanically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from empirical_mvm_tpu.core.config import BertConfig
from empirical_mvm_tpu.ops.layernorm import layer_norm

# HF BERT LayerNorm epsilon (bert-base-uncased config)
_EPS = 1e-12


def extended_attention_mask(mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """(B, L) or (B, Lq, Lk) 0/1 mask -> additive (B, 1, Lq, Lk) bias.

    Mirrors HF ``get_extended_attention_mask`` used at ref model.py:211:
    allowed positions 0, masked positions a large negative value.
    """
    if mask.ndim == 2:
        m = mask[:, None, None, :]
    elif mask.ndim == 3:
        m = mask[:, None, :, :]
    else:
        raise ValueError(f"mask ndim {mask.ndim}")
    return ((1.0 - m.astype(jnp.float32)) * jnp.finfo(jnp.float32).min
            ).astype(dtype)


class BertEmbeddings(nn.Module):
    """Word + position + token-type embeddings (HF BertEmbeddings)."""

    config: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, position_ids=None,
                 deterministic: bool = True):
        cfg = self.config
        b, l = input_ids.shape
        if position_ids is None:
            position_ids = jnp.arange(l, dtype=jnp.int32)[None, :]
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        we = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                      name="word_embeddings")(input_ids)
        pe = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                      name="position_embeddings")(position_ids)
        te = nn.Embed(cfg.type_vocab_size, cfg.hidden_size,
                      name="token_type_embeddings")(token_type_ids)
        x = we + pe + te
        x = layer_norm(cfg.layer_norm_eps, self.dtype, "LayerNorm")(x)
        x = nn.Dropout(cfg.hidden_dropout_prob)(x, deterministic=deterministic)
        return x.astype(self.dtype)


class _LinearParams(nn.Module):
    """Kernel+bias params with nn.Dense's exact tree layout and inits, but
    no compute — lets the caller fuse q/k/v into ONE GEMM while the HF
    checkpoint mapping (attention/{query,key,value}/{kernel,bias}) stays
    byte-identical."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class BertSelfAttention(nn.Module):
    """Multi-head self-attention + output projection + residual LayerNorm
    (HF BertAttention). Softmax in fp32; GEMMs in module dtype."""

    config: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias, deterministic: bool = True,
                 output_attentions: bool = False):
        cfg = self.config
        b, l, d = x.shape
        nh = cfg.num_attention_heads
        hd = d // nh

        wq, bq = _LinearParams(d, name="query")(d)
        wk, bk = _LinearParams(d, name="key")(d)
        wv, bv = _LinearParams(d, name="value")(d)

        p_drop = (0.0 if deterministic
                  else float(cfg.attention_probs_dropout_prob))
        import os as _os
        on_tpu = jax.default_backend() == "tpu"
        pallas_ok = on_tpu or bool(_os.environ.get("EMVM_PALLAS_INTERPRET"))
        if cfg.use_pallas_attention and not output_attentions and pallas_ok:
            # single qkv GEMM (concatenated weights) + one transpose into the
            # packed kernel; probs (62MB/layer/pass at pretrain VTM shapes)
            # never leave VMEM and dropout rides the on-core PRNG
            from empirical_mvm_tpu.ops.window_attention import (
                lane_sa_attention_fits, lane_self_attention,
                packed_self_attention)
            w3 = jnp.concatenate([wq, wk, wv], axis=1).astype(self.dtype)
            b3 = jnp.concatenate([bq, bk, bv]).astype(self.dtype)
            qkv = x @ w3 + b3                          # (B, L, 3D)
            use_lane = (lane_sa_attention_fits(b, l, d, nh)
                        and not _os.environ.get("EMVM_PACKED_ATTN"))
            if not use_lane:
                qkv = qkv.reshape(b, l, 3 * nh, hd).transpose(0, 2, 1, 3)
            if attn_bias is None:
                mask = jnp.zeros((b, l, l), jnp.float32)
            else:
                mask = jnp.broadcast_to(
                    attn_bias.astype(jnp.float32).reshape(
                        attn_bias.shape[0], *attn_bias.shape[2:])
                    if attn_bias.ndim == 4 else attn_bias,
                    (b, l, l))
            if p_drop > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (1,), 0, np.iinfo(np.int32).max,
                    dtype=jnp.int32)
            else:
                seed = jnp.zeros((1,), jnp.int32)
            if use_lane:
                # lane-sliced kernel: consumes (B, L, 3D) directly, returns
                # (B, L, D) — no packing transposes (round 3)
                ctx = lane_self_attention(
                    qkv, mask, seed, nh, float(1.0 / np.sqrt(hd)), p_drop,
                    not on_tpu)
            else:
                ctx = packed_self_attention(
                    qkv, mask, seed, nh, float(1.0 / np.sqrt(hd)), p_drop,
                    not on_tpu)
            probs = None
        else:
            def lin(w, bb):
                y = x @ w.astype(self.dtype) + bb.astype(self.dtype)
                return y.reshape(b, l, nh, hd).transpose(0, 2, 1, 3)

            q, k, v = lin(wq, bq), lin(wk, bk), lin(wv, bv)
            attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                              preferred_element_type=jnp.float32) / np.sqrt(hd)
            if attn_bias is not None:
                attn = attn + attn_bias.astype(jnp.float32)
            probs = jax.nn.softmax(attn, axis=-1)
            probs_c = nn.Dropout(cfg.attention_probs_dropout_prob)(
                probs.astype(self.dtype), deterministic=deterministic)

            ctx = jnp.einsum("bhqk,bhkd->bhqd", probs_c, v,
                             preferred_element_type=jnp.float32)
        if ctx.ndim == 4:                     # (B, nH, L, hd) packed/XLA path
            ctx = ctx.astype(self.dtype).transpose(0, 2, 1, 3).reshape(b, l, d)
        else:                                 # (B, L, D) lane-kernel path
            ctx = ctx.astype(self.dtype)
        out = nn.Dense(d, dtype=self.dtype, name="out")(ctx)
        out = nn.Dropout(cfg.hidden_dropout_prob)(out, deterministic=deterministic)
        out = layer_norm(cfg.layer_norm_eps, self.dtype, "LayerNorm")(out + x)
        if output_attentions:
            return out, probs
        return out, None


class BertLayer(nn.Module):
    """One transformer layer (HF BertLayer)."""

    config: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias, deterministic: bool = True,
                 output_attentions: bool = False):
        cfg = self.config
        x, probs = BertSelfAttention(cfg, dtype=self.dtype, name="attention")(
            x, attn_bias, deterministic, output_attentions)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                     name="intermediate")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="output")(h)
        h = nn.Dropout(cfg.hidden_dropout_prob)(h, deterministic=deterministic)
        x = layer_norm(cfg.layer_norm_eps, self.dtype, "LayerNorm")(h + x)
        return x, probs


class BertEncoder(nn.Module):
    """Stack of BertLayers (HF BertEncoder) — the reference's text encoder
    stack (model.py:91) and the cross-modal fusion ``trsfr`` (model.py:130)."""

    config: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias=None, deterministic: bool = True,
                 output_attentions: bool = False):
        all_probs = []
        import os as _os
        rp = _os.environ.get("EMVM_BERT_REMAT", "")
        if rp == "dots":
            # A/B probe for the (64, 232, 3072) MLP-intermediate copies the
            # XLA scheduler inserts on the flagship fusion stack
            # (BENCH_LOCAL_r3 profile: ~9 ms/step): explicit per-layer remat
            # that SAVES GEMM outputs (dots policy) replaces the scheduler's
            # own save/copy choices with recompute-free boundaries.
            layer_cls = nn.remat(
                BertLayer, static_argnums=(3, 4),
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
        elif rp == "full":
            layer_cls = nn.remat(BertLayer, static_argnums=(3, 4))
        else:
            layer_cls = (nn.remat(BertLayer, static_argnums=(3, 4))
                         if self.config.remat else BertLayer)
        for i in range(self.config.num_hidden_layers):
            x, probs = layer_cls(self.config, dtype=self.dtype,
                                 name=f"layer_{i}")(
                x, attn_bias, deterministic, output_attentions)
            if output_attentions:
                all_probs.append(probs)
        if output_attentions:
            return x, all_probs
        return x, None


class BertEncoderScanned(nn.Module):
    """BertEncoder with layers folded into one ``nn.scan`` step.

    Numerically identical to :class:`BertEncoder`; params are STACKED along
    a leading layer axis (``layer.<param>`` with shape (L, ...)) instead of
    ``layer_{i}.<param>``. Shrinks the traced program ~L-fold — the
    compile-time lever for deep stacks on the slow remote-compile path.
    Use :func:`stack_encoder_params` to convert a per-layer tree.

    Limitation: no ``output_attentions`` (the fused-attention rollout for
    'am' masking needs the per-layer module).
    """

    config: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias=None, deterministic: bool = True):
        def body(layer, carry, _):
            y, _ = layer(carry, attn_bias, deterministic, False)
            return y, None

        scan = nn.scan(body,
                       variable_axes={"params": 0},
                       split_rngs={"params": True, "dropout": True},
                       length=self.config.num_hidden_layers)
        x, _ = scan(BertLayer(self.config, dtype=self.dtype, name="layer"),
                    x, None)
        return x, None


def stack_encoder_params(per_layer: dict, num_layers: int) -> dict:
    """{'layer_0': tree, ...} -> {'layer': stacked tree} for
    BertEncoderScanned."""
    import jax

    trees = [per_layer[f"layer_{i}"] for i in range(num_layers)]
    return {"layer": jax.tree.map(lambda *xs: np.stack(xs), *trees)}


def unstack_encoder_params(stacked: dict) -> dict:
    """Inverse of :func:`stack_encoder_params`: {'layer': (L, ...) tree} ->
    {'layer_i': tree}. For exporting scanned checkpoints to the per-layer
    layout (torch interop, non-scan models)."""
    import jax

    leaves = jax.tree.leaves(stacked["layer"])
    num_layers = int(np.shape(leaves[0])[0])
    return {f"layer_{i}": jax.tree.map(lambda x, i=i: np.asarray(x)[i],
                                       stacked["layer"])
            for i in range(num_layers)}


class BertMLMHead(nn.Module):
    """HF BertOnlyMLMHead: transform dense + GELU + LayerNorm + vocab decoder.

    Used for MTM / SMTM / generative-MC / fill-in-blank heads
    (ref: main_pretrain.py:148-150, main_qamc_tsv_mlm_gen_ans_idx.py:99)."""

    config: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        x = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="transform")(x)
        x = nn.gelu(x, approximate=False)
        x = layer_norm(cfg.layer_norm_eps, self.dtype, "LayerNorm")(x)
        x = nn.Dense(cfg.vocab_size, dtype=self.dtype, name="decoder")(x)
        return x
