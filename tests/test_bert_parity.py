"""Numerical parity of our flax BERT blocks against HF transformers.

The reference uses HF BERT for the text encoder and fusion transformer
(ref: model.py:85,124); these tests random-init an HF BertForMaskedLM from
config (no network) and require our import + forward to match in fp32.
"""

import numpy as np
import pytest

import tests.conftest  # noqa: F401  (forces CPU backend)

from empirical_mvm_tpu.core.config import BertConfig
from empirical_mvm_tpu.models import bert as jbert
from empirical_mvm_tpu.models.torch_import import (
    bert_embeddings_params_from_torch,
    bert_encoder_params_from_torch,
    bert_mlm_head_params_from_torch,
)


@pytest.fixture(scope="module")
def hf_model_and_cfg():
    import torch
    import transformers

    cfg = BertConfig(vocab_size=128, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=64, type_vocab_size=2)
    hf_cfg = transformers.BertConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    hf = transformers.BertForMaskedLM(hf_cfg)
    hf.eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    return hf, sd, cfg


def test_embeddings_parity(hf_model_and_cfg):
    import torch
    hf, sd, cfg = hf_model_and_cfg
    ids = np.random.RandomState(0).randint(0, cfg.vocab_size, (3, 16))
    with torch.no_grad():
        y_ref = hf.bert.embeddings(torch.from_numpy(ids)).numpy()
    params = bert_embeddings_params_from_torch(sd, "bert.embeddings.")
    y = jbert.BertEmbeddings(cfg).apply({"params": params}, ids)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-5)


def test_encoder_parity(hf_model_and_cfg):
    import torch
    hf, sd, cfg = hf_model_and_cfg
    rs = np.random.RandomState(1)
    x = rs.randn(3, 16, cfg.hidden_size).astype(np.float32)
    mask = (rs.rand(3, 16) > 0.2).astype(np.int64)
    mask[:, 0] = 1
    with torch.no_grad():
        ext = hf.get_extended_attention_mask(torch.from_numpy(mask), (3, 16))
        y_ref = hf.bert.encoder(torch.from_numpy(x), ext).last_hidden_state.numpy()
    params = bert_encoder_params_from_torch(sd, "bert.encoder.",
                                            cfg.num_hidden_layers)
    bias = jbert.extended_attention_mask(mask)
    y, _ = jbert.BertEncoder(cfg).apply({"params": params}, x, bias)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=2e-5)


def test_seq2seq_mask_parity(hf_model_and_cfg):
    """3D (B, Lq, Lk) masks route through the same extended-mask math the
    reference uses for seq2seq attention (ref: model.py:192-200)."""
    import torch
    hf, sd, cfg = hf_model_and_cfg
    rs = np.random.RandomState(2)
    x = rs.randn(2, 8, cfg.hidden_size).astype(np.float32)
    tri = np.tril(np.ones((2, 8, 8), dtype=np.int64))
    with torch.no_grad():
        ext = hf.get_extended_attention_mask(torch.from_numpy(tri), (2, 8))
        y_ref = hf.bert.encoder(torch.from_numpy(x), ext).last_hidden_state.numpy()
    params = bert_encoder_params_from_torch(sd, "bert.encoder.",
                                            cfg.num_hidden_layers)
    y, _ = jbert.BertEncoder(cfg).apply(
        {"params": params}, x, jbert.extended_attention_mask(tri))
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=2e-5)


def test_mlm_head_parity(hf_model_and_cfg):
    import torch
    hf, sd, cfg = hf_model_and_cfg
    x = np.random.RandomState(3).randn(2, 8, cfg.hidden_size).astype(np.float32)
    with torch.no_grad():
        y_ref = hf.cls(torch.from_numpy(x)).numpy()
    params = bert_mlm_head_params_from_torch(sd, "cls.")
    y = jbert.BertMLMHead(cfg).apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=2e-5)


def test_scanned_encoder_matches_unrolled(hf_model_and_cfg):
    """BertEncoderScanned == BertEncoder with stacked params."""
    import jax
    import jax.numpy as jnp
    from empirical_mvm_tpu.models.bert import (BertEncoderScanned,
                                               stack_encoder_params)
    hf, sd, cfg = hf_model_and_cfg
    params = bert_encoder_params_from_torch(sd, "bert.encoder.",
                                            cfg.num_hidden_layers)
    rs = np.random.RandomState(4)
    x = rs.randn(2, 10, cfg.hidden_size).astype(np.float32)
    mask = np.ones((2, 10), np.int64)
    bias = jbert.extended_attention_mask(mask)
    ref, _ = jbert.BertEncoder(cfg).apply({"params": params}, x, bias)
    stacked = stack_encoder_params(params, cfg.num_hidden_layers)
    out, _ = BertEncoderScanned(cfg).apply({"params": stacked}, x, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_scanned_encoder_fused_kernel_matches_unrolled(hf_model_and_cfg,
                                                       monkeypatch):
    """BertEncoderScanned with the fused self-attention kernel (interpret
    mode) == the unrolled XLA path — covers the nn.scan + pallas_call +
    single-GEMM-qkv combination the TPU pretrain CLI runs."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    from empirical_mvm_tpu.models.bert import (BertEncoderScanned,
                                               stack_encoder_params)
    monkeypatch.setenv("EMVM_PALLAS_INTERPRET", "1")
    hf, sd, cfg = hf_model_and_cfg
    params = bert_encoder_params_from_torch(sd, "bert.encoder.",
                                            cfg.num_hidden_layers)
    rs = np.random.RandomState(5)
    x = rs.randn(2, 10, cfg.hidden_size).astype(np.float32)
    mask = np.ones((2, 10), np.int64)
    mask[1, 7:] = 0
    bias = jbert.extended_attention_mask(mask)
    ref, _ = jbert.BertEncoder(cfg).apply({"params": params}, x, bias)
    stacked = stack_encoder_params(params, cfg.num_hidden_layers)
    fused_cfg = dataclasses.replace(cfg, use_pallas_attention=True,
                                    scan=True)
    out, _ = BertEncoderScanned(fused_cfg).apply({"params": stacked}, x,
                                                 bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5,
                               rtol=1e-4)
