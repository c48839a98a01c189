"""Flagship-geometry numerical parity (slow, opt-in).

Round-1 parity tests all ran reduced configs; these run the REAL shapes:

* the full violet VideoSwin — embed 96, depths (2,2,18,2), heads
  (3,6,12,24), window (8,7,7) (ref: visbackbone/swin_violet.py:4-11) at
  224^2 input. The 18-block stage is where scan/remat/drop-path indexing
  bugs would hide.
* the full VIOLETv2 trunk — hidden 768, 12-layer fusion, T=4, 224^2
  (ref: model.py:32-78,174-214) through EncVideo + EncTxt + go_cross against
  a torch-composed oracle, with the scanned variants run through the SAME
  (converted) params.

Run with: python -m pytest tests/ -m slow -k flagship
"""

import dataclasses

import numpy as np
import pytest

import tests.conftest  # noqa: F401
from tests.conftest import requires_reference
from tests.ref_loader import load_ref_video_swin, torch_state_dict_to_numpy

from empirical_mvm_tpu.core.config import BertConfig, ModelConfig, SwinConfig
from empirical_mvm_tpu.models.torch_import import (swin3d_params_from_torch,
                                                   violet_params_from_torch)
from empirical_mvm_tpu.models.video_swin import (SwinTransformer3D,
                                                 swin_stack_stage_blocks)
from empirical_mvm_tpu.models.violet import VioletBase

pytestmark = pytest.mark.slow


VIOLET_SWIN = dataclasses.replace(SwinConfig.violet(), drop_path_rate=0.0)

# bert-base geometry, dropout off for determinism
BASE_BERT = BertConfig(hidden_dropout_prob=0.0,
                       attention_probs_dropout_prob=0.0)


@requires_reference
def test_flagship_swin_full_depth_parity():
    """Full (2,2,18,2) violet VideoSwin vs torch at fp32, 224^2 — and the
    scanned (block-pair nn.scan) variant through the same params."""
    import jax
    import torch

    ref_mod = load_ref_video_swin()
    torch.manual_seed(0)
    ref = ref_mod.SwinTransformer3D(
        pretrained=None, patch_size=VIOLET_SWIN.patch_size,
        embed_dim=VIOLET_SWIN.embed_dim, depths=list(VIOLET_SWIN.depths),
        num_heads=list(VIOLET_SWIN.num_heads),
        window_size=VIOLET_SWIN.window_size, drop_path_rate=0.0)
    ref.eval()

    x = np.random.RandomState(1).randn(1, 4, 224, 224, 3).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))
    y_ref = y_ref.numpy().transpose(0, 2, 3, 4, 1)

    params = swin3d_params_from_torch(torch_state_dict_to_numpy(ref),
                                      VIOLET_SWIN.depths)
    model = SwinTransformer3D(config=VIOLET_SWIN)
    y = np.asarray(jax.jit(
        lambda p: model.apply({"params": p}, x, deterministic=True))(params))
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, atol=5e-4, rtol=1e-3)

    # scanned stage-2 through the SAME params
    cfg_s = dataclasses.replace(VIOLET_SWIN, scan=True)
    params_s = dict(params)
    params_s["layers_2"] = swin_stack_stage_blocks(params["layers_2"], 18)
    model_s = SwinTransformer3D(config=cfg_s)
    y_s = np.asarray(jax.jit(
        lambda p: model_s.apply({"params": p}, x, deterministic=True))(
            params_s))
    np.testing.assert_allclose(y_s, y, atol=2e-5)


@requires_reference
def test_flagship_trunk_parity():
    """Full-size VIOLETv2 trunk (hidden 768, 12-layer fusion, T=4, 224^2)
    through EncVideo + EncTxt(embeddings) + go_cross vs the torch-composed
    oracle (ref model.py:32-78,106-115,204-214); then the fusion.scan
    variant through stacked params."""
    import jax
    import torch
    import transformers
    from empirical_mvm_tpu.models.bert import stack_encoder_params

    cfg = ModelConfig(size_img=224, size_frame=4, size_txt=32,
                      fusion=BASE_BERT, text=BASE_BERT,
                      swin_custom=VIOLET_SWIN)
    d = cfg.hidden_size
    assert d == 768

    ref_mod = load_ref_video_swin()
    torch.manual_seed(0)
    swin_t = ref_mod.SwinTransformer3D(
        pretrained=None, patch_size=VIOLET_SWIN.patch_size,
        embed_dim=VIOLET_SWIN.embed_dim, depths=list(VIOLET_SWIN.depths),
        num_heads=list(VIOLET_SWIN.num_heads),
        window_size=VIOLET_SWIN.window_size, drop_path_rate=0.0)
    swin_t.eval()
    latent = VIOLET_SWIN.num_features
    # violet swin: latent == hidden (768) -> NO enc_img.fc projection, the
    # reference skips the Linear entirely (ref model.py:20-21)
    assert latent == d

    hf_cfg = transformers.BertConfig(
        vocab_size=BASE_BERT.vocab_size, hidden_size=d,
        num_hidden_layers=BASE_BERT.num_hidden_layers,
        num_attention_heads=BASE_BERT.num_attention_heads,
        intermediate_size=BASE_BERT.intermediate_size,
        max_position_embeddings=BASE_BERT.max_position_embeddings,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    bert = transformers.BertForMaskedLM(hf_cfg)
    bert.eval()

    rs = np.random.RandomState(0)
    emb_cls = rs.randn(1, 1, 1, d).astype(np.float32) * 0.02
    emb_pos = rs.randn(1, 1, 1 + cfg.max_size_patch ** 2, d).astype(
        np.float32) * 0.02
    emb_len = rs.randn(1, cfg.max_size_frame, 1, d).astype(np.float32) * 0.02
    enc_norm = torch.nn.LayerNorm(d)
    with torch.no_grad():
        enc_norm.weight.copy_(torch.rand(d) + 0.5)
        enc_norm.bias.copy_(torch.randn(d) * 0.1)

    b, t = 1, cfg.size_frame
    img = rs.randn(b, t, 224, 224, 3).astype(np.float32)
    txt = rs.randint(0, BASE_BERT.vocab_size, (b, cfg.size_txt))
    mask = np.ones((b, cfg.size_txt), dtype=np.int64)
    mask[:, -5:] = 0
    h = w = 224 // 32

    # ---- torch oracle (ref model.py:32-78 EncVideo; 204-214 go_cross) ----
    with torch.no_grad():
        xt = torch.from_numpy(img.transpose(0, 1, 4, 2, 3))
        f = swin_t(xt.transpose(1, 2)).transpose(1, 2)
        f = f.permute(0, 1, 3, 4, 2).reshape(b, t, h * w, latent)
        f = torch.cat([torch.from_numpy(emb_cls).expand(b, t, -1, -1), f],
                      dim=2)
        f = f + torch.from_numpy(emb_pos)[:, :, :1 + h * w, :]
        f = f + torch.from_numpy(emb_len)[:, :t, :, :]
        f = enc_norm(f).reshape(b, t * (1 + h * w), d)
        m_img = torch.ones(b, t * (1 + h * w), dtype=torch.long)
        f_txt = bert.bert.embeddings(torch.from_numpy(txt))
        feat = torch.cat([f, f_txt], dim=1)
        jm = torch.cat([m_img, torch.from_numpy(mask)], dim=1)
        ext = bert.get_extended_attention_mask(jm, jm.shape)
        out_t = bert.bert.encoder(feat, ext).last_hidden_state.numpy()

    # ---- reference-format checkpoint -> our params ----
    sd = {}
    for k, v in swin_t.state_dict().items():
        sd[f"enc_img.swin.{k}"] = v.numpy()
    sd["enc_img.emb_cls"] = emb_cls
    sd["enc_img.emb_pos"] = emb_pos
    sd["enc_img.emb_len"] = emb_len
    sd["enc_img.emb_odr"] = rs.randn(1, 1, 1, d).astype(np.float32) * 0.02
    sd["enc_img.norm.weight"] = enc_norm.weight.detach().numpy()
    sd["enc_img.norm.bias"] = enc_norm.bias.detach().numpy()
    for k, v in bert.bert.embeddings.state_dict().items():
        sd[f"enc_txt.emb_txt.{k}"] = v.numpy()
    for k, v in bert.bert.encoder.state_dict().items():
        sd[f"trsfr.{k}"] = v.numpy()
    params = violet_params_from_torch(sd, cfg)

    model = VioletBase(config=cfg)
    out_j = np.asarray(jax.jit(
        lambda p: model.apply({"params": p}, img, txt, mask))(params))
    assert out_j.shape == out_t.shape
    np.testing.assert_allclose(out_j, out_t, atol=5e-4, rtol=1e-3)

    # ---- fusion.scan variant through stacked params ----
    cfg_s = dataclasses.replace(
        cfg, fusion=dataclasses.replace(BASE_BERT, scan=True))
    params_s = dict(params)
    params_s["trsfr"] = stack_encoder_params(
        params["trsfr"], BASE_BERT.num_hidden_layers)
    model_s = VioletBase(config=cfg_s)
    out_s = np.asarray(jax.jit(
        lambda p: model_s.apply({"params": p}, img, txt, mask))(params_s))
    np.testing.assert_allclose(out_s, out_j, atol=2e-5)
