"""End-to-end parity of the VIOLET trunk (EncVideo + EncTxt + fusion).

Torch oracle: reference VideoSwin module (loaded read-only) + HF BERT +
explicit EncVideo/go_cross math transcribed from ref model.py:32-78,174-214.
Verifies the glue our piece-level tests can't: video token layout, positional
embeddings, mask construction, and the joint attention bias.
"""

import numpy as np
import pytest

import tests.conftest  # noqa: F401
from tests.conftest import requires_reference
from tests.ref_loader import load_ref_video_swin

from empirical_mvm_tpu.core.config import BertConfig, ModelConfig, SwinConfig
from empirical_mvm_tpu.models.torch_import import violet_params_from_torch
from empirical_mvm_tpu.models.violet import VioletBase, ScoreHead


TINY_BERT = BertConfig(vocab_size=128, hidden_size=32, num_hidden_layers=2,
                       num_attention_heads=4, intermediate_size=64,
                       max_position_embeddings=64,
                       hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)


_TINY_SWIN = SwinConfig(embed_dim=8, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8),
                        drop_path_rate=0.0)


def _tiny_model_cfg():
    return ModelConfig(size_img=64, size_frame=2, size_txt=8,
                       fusion=TINY_BERT, text=TINY_BERT,
                       swin_custom=_TINY_SWIN)


@requires_reference
def test_violet_trunk_parity():
    import torch
    import transformers

    cfg = _tiny_model_cfg()

    ref_mod = load_ref_video_swin()
    torch.manual_seed(0)
    swin_t = ref_mod.SwinTransformer3D(
        pretrained=None, patch_size=_TINY_SWIN.patch_size,
        embed_dim=_TINY_SWIN.embed_dim, depths=list(_TINY_SWIN.depths),
        num_heads=list(_TINY_SWIN.num_heads), window_size=_TINY_SWIN.window_size,
        drop_path_rate=0.0)
    swin_t.eval()
    latent = _TINY_SWIN.num_features
    d = cfg.hidden_size

    hf_cfg = transformers.BertConfig(
        vocab_size=TINY_BERT.vocab_size, hidden_size=d,
        num_hidden_layers=TINY_BERT.num_hidden_layers,
        num_attention_heads=TINY_BERT.num_attention_heads,
        intermediate_size=TINY_BERT.intermediate_size,
        max_position_embeddings=TINY_BERT.max_position_embeddings,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    bert = transformers.BertForMaskedLM(hf_cfg)
    bert.eval()

    fc = torch.nn.Linear(latent, d)
    head = torch.nn.Sequential(torch.nn.Dropout(0.1), torch.nn.Linear(d, d * 2),
                               torch.nn.ReLU(), torch.nn.Linear(d * 2, 1))
    head.eval()
    rs = np.random.RandomState(0)
    emb_cls = rs.randn(1, 1, 1, d).astype(np.float32) * 0.02
    emb_pos = rs.randn(1, 1, 1 + cfg.max_size_patch ** 2, d).astype(np.float32) * 0.02
    emb_len = rs.randn(1, cfg.max_size_frame, 1, d).astype(np.float32) * 0.02
    enc_norm = torch.nn.LayerNorm(d)
    with torch.no_grad():
        enc_norm.weight.copy_(torch.rand(d) + 0.5)
        enc_norm.bias.copy_(torch.randn(d) * 0.1)

    b, t = 2, cfg.size_frame
    img = rs.randn(b, t, cfg.size_img, cfg.size_img, 3).astype(np.float32)
    txt = rs.randint(0, TINY_BERT.vocab_size, (b, cfg.size_txt))
    mask = np.ones((b, cfg.size_txt), dtype=np.int64)
    mask[:, -2:] = 0
    h = w = cfg.size_img // 32

    # ---- torch oracle: EncVideo forward (ref model.py:32-78) ----
    with torch.no_grad():
        xt = torch.from_numpy(img.transpose(0, 1, 4, 2, 3))     # (B,T,C,H,W)
        f = swin_t(xt.transpose(1, 2)).transpose(1, 2)          # (B,T,C',h,w)
        f = f.permute(0, 1, 3, 4, 2).reshape(b, t, h * w, latent)
        f = fc(f)
        f = torch.cat([torch.from_numpy(emb_cls).expand(b, t, -1, -1), f], dim=2)
        f = f + torch.from_numpy(emb_pos)[:, :, :1 + h * w, :]
        f = f + torch.from_numpy(emb_len)[:, :t, :, :]
        f = enc_norm(f).reshape(b, t * (1 + h * w), d)
        m_img = torch.ones(b, t * (1 + h * w), dtype=torch.long)

        # EncTxt embeddings-only (ref model.py:106-115)
        f_txt = bert.bert.embeddings(torch.from_numpy(txt))

        # go_cross full mask (ref model.py:204-214)
        feat = torch.cat([f, f_txt], dim=1)
        jm = torch.cat([m_img, torch.from_numpy(mask)], dim=1)
        ext = bert.get_extended_attention_mask(jm, jm.shape)
        out_t = bert.bert.encoder(feat, ext).last_hidden_state
        vtm_t = head(out_t[:, (1 + h * w) * t, :]).numpy()
        out_t = out_t.numpy()

    # ---- assemble a reference-style checkpoint ----
    sd = {}
    for k, v in swin_t.state_dict().items():
        sd[f"enc_img.swin.{k}"] = v.numpy()
    sd["enc_img.fc.weight"] = fc.weight.detach().numpy()
    sd["enc_img.fc.bias"] = fc.bias.detach().numpy()
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
    for k, v in head.state_dict().items():
        sd[f"fc.{k}"] = v.numpy()

    params = violet_params_from_torch(sd, cfg, heads={"fc": "score_head"})

    # ---- JAX side ----
    model = VioletBase(config=cfg)
    out_j = model.apply({"params": {k: v for k, v in params.items()
                                    if k != "fc"}}, img, txt, mask)
    out_j = np.asarray(out_j)
    np.testing.assert_allclose(out_j, out_t, atol=3e-4, rtol=1e-3)

    vtm_j = ScoreHead(hidden_size=d).apply(
        {"params": params["fc"]}, out_j[:, (1 + h * w) * t, :])
    np.testing.assert_allclose(np.asarray(vtm_j), vtm_t, atol=3e-4, rtol=1e-3)


def _reference_format_sd(cfg, seed: int = 3):
    """Build a state_dict with the reference's EXACT key strings: the real
    reference VideoSwin module's own state_dict under ``enc_img.swin.``, HF
    BERT keys under ``enc_txt.emb_txt.``/``trsfr.``, and an OVERSIZED
    emb_pos/emb_len to trigger the slice-on-load path (ref model.py:342-353).
    """
    import torch
    from tests.ref_loader import load_ref_video_swin

    ref_mod = load_ref_video_swin()
    torch.manual_seed(seed)
    swin_t = ref_mod.SwinTransformer3D(
        pretrained=None, patch_size=_TINY_SWIN.patch_size,
        embed_dim=_TINY_SWIN.embed_dim, depths=list(_TINY_SWIN.depths),
        num_heads=list(_TINY_SWIN.num_heads),
        window_size=_TINY_SWIN.window_size, drop_path_rate=0.0)
    import transformers
    hf_cfg = transformers.BertConfig(
        vocab_size=TINY_BERT.vocab_size, hidden_size=TINY_BERT.hidden_size,
        num_hidden_layers=TINY_BERT.num_hidden_layers,
        num_attention_heads=TINY_BERT.num_attention_heads,
        intermediate_size=TINY_BERT.intermediate_size,
        max_position_embeddings=TINY_BERT.max_position_embeddings)
    bert = transformers.BertForMaskedLM(hf_cfg)

    sd = {}
    for k, v in swin_t.state_dict().items():
        sd[f"enc_img.swin.{k}"] = v
    d = cfg.hidden_size
    fc = torch.nn.Linear(_TINY_SWIN.num_features, d)
    sd["enc_img.fc.weight"] = fc.weight.data
    sd["enc_img.fc.bias"] = fc.bias.data
    for k in ("emb_cls", "emb_odr"):
        sd[f"enc_img.{k}"] = torch.randn(1, 1, 1, d) * 0.02
    # oversized pos embeddings exercise the slice-on-load path
    # (ref model.py:342-353)
    sd["enc_img.emb_pos"] = torch.randn(1, 1, 1 + 16 ** 2, d) * 0.02
    sd["enc_img.emb_len"] = torch.randn(1, 8, 1, d) * 0.02
    sd["enc_img.norm.weight"] = torch.ones(d)
    sd["enc_img.norm.bias"] = torch.zeros(d)
    for k, v in bert.bert.embeddings.state_dict().items():
        sd[f"enc_txt.emb_txt.{k}"] = v
    for k, v in bert.bert.encoder.state_dict().items():
        sd[f"trsfr.{k}"] = v
    for k, v in bert.cls.state_dict().items():
        sd[f"fc_mtm.{k}"] = v
    return sd


@requires_reference
def test_torch_pt_checkpoint_ingestion(tmp_path):
    """A reference-style .pt state dict round-trips through
    load_torch_violet_ckpt into a usable param tree (the release-checkpoint
    path, ref model.py:295-353)."""
    import torch
    from empirical_mvm_tpu.train.checkpoint import load_torch_violet_ckpt

    cfg = _tiny_model_cfg()
    sd = _reference_format_sd(cfg)
    d = cfg.hidden_size

    path = str(tmp_path / "ckpt_violet_pretrain.pt")
    torch.save(sd, path)

    params = load_torch_violet_ckpt(path, cfg, heads={"fc_mtm": "mlm_head"})
    assert params["enc_img"]["emb_pos"].shape == (1, 1, 1 + 14 ** 2, d)
    assert params["enc_img"]["emb_len"].shape == (1, 6, 1, d)

    # loaded params drive a real forward
    model = VioletBase(config=cfg)
    rs = np.random.RandomState(0)
    img = rs.rand(1, 2, 64, 64, 3).astype(np.float32)
    txt = rs.randint(0, TINY_BERT.vocab_size, (1, 8))
    out = model.apply({"params": {k: v for k, v in params.items()
                                  if k in ("enc_img", "enc_txt", "trsfr")}},
                      img, txt, np.ones((1, 8), np.int64))
    assert np.isfinite(np.asarray(out)).all()


@requires_reference
def test_encvideo_odr_embedding_parity():
    """Frame-order embedding (ref model.py:61-68): in-place frames get their
    temporal embedding, shuffled frames get emb_odr."""
    import torch
    from empirical_mvm_tpu.models.violet import EncVideo
    cfg = _tiny_model_cfg()
    model = EncVideo(config=cfg)
    rs = np.random.RandomState(0)
    img = rs.rand(2, 2, 64, 64, 3).astype(np.float32)
    import jax
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0),
                                        img)["params"])()
    odr = np.array([[0, 1], [1, 0]])  # sample 0 in order, sample 1 shuffled
    f_odr, _ = model.apply({"params": params}, img, odr=odr)
    f_plain, _ = model.apply({"params": params}, img)
    f_odr, f_plain = np.asarray(f_odr), np.asarray(f_plain)
    # sample 0: all frames in place -> identical to the no-odr path
    np.testing.assert_allclose(f_odr[0], f_plain[0], atol=1e-6)
    # sample 1: shuffled -> differs
    assert np.abs(f_odr[1] - f_plain[1]).max() > 1e-4


def test_encvideo_swinbert_layout():
    """SwinBERT-compat branch (ref model.py:27-56): latent->512->hidden with
    a zero fake-CLS whose mask is 0."""
    import dataclasses
    import jax
    from empirical_mvm_tpu.models.violet import EncVideo
    cfg = dataclasses.replace(_tiny_model_cfg(), swinbert=True)
    model = EncVideo(config=cfg)
    img = np.random.RandomState(0).rand(2, 2, 64, 64, 3).astype(np.float32)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0),
                                        img)["params"])()
    f, m = model.apply({"params": params}, img)
    f, m = np.asarray(f), np.asarray(m)
    lv_stride = 1 + 4
    assert f.shape == (2, 2 * lv_stride, 32)
    # fake CLS rows are exactly zero with mask 0
    assert np.all(f[:, ::lv_stride] == 0)
    assert np.all(m[:, ::lv_stride] == 0) and np.all(
        m.reshape(2, 2, lv_stride)[:, :, 1:] == 1)


@requires_reference
def test_convert_ckpt_cli_wrapped_reference_format(tmp_path, monkeypatch):
    """The de-facto reference integration path: a trainer-wrapped .pt
    ({'state_dict': {'module.<ref keys>': tensor}}) goes through the
    cli/convert_ckpt.py CLI into a flax msgpack that matches the direct
    in-memory import and drives a real forward (ref model.py:295-353)."""
    import torch
    import jax
    from empirical_mvm_tpu.cli import convert_ckpt
    from empirical_mvm_tpu.train.checkpoint import (load_params,
                                                    load_torch_violet_ckpt)

    cfg = _tiny_model_cfg()
    sd = _reference_format_sd(cfg)
    wrapped = {"state_dict": {f"module.{k}": v for k, v in sd.items()}}
    src = str(tmp_path / "ckpt_violet_pretrain.pt")
    torch.save(wrapped, src)

    # write a reference-style FLAT task json so the CLI slices pos-embs to
    # THIS tiny geometry (load_run_config parses flat keys, ref args.py:14-22)
    import dataclasses, json
    cfg_json = str(tmp_path / "cfg.json")
    with open(cfg_json, "w") as f:
        json.dump({"task": "pretrain", "path_output": str(tmp_path),
                   "size_img": cfg.size_img, "size_frame": cfg.size_frame,
                   "size_txt": cfg.size_txt,
                   "swin_custom": dataclasses.asdict(_TINY_SWIN),
                   "fusion": dataclasses.asdict(TINY_BERT),
                   "text": dataclasses.asdict(TINY_BERT)},
                  f, default=list)

    dst = str(tmp_path / "violet.msgpack")
    monkeypatch.setattr("sys.argv", [
        "convert_ckpt", "--src", src, "--dst", dst, "--config", cfg_json,
        "--heads", "fc_mtm=mlm_head"])
    convert_ckpt.main()

    got = load_params(dst)
    want = load_torch_violet_ckpt(src, cfg, heads={"fc_mtm": "mlm_head"})
    flat_g = jax.tree_util.tree_leaves_with_path(got)
    flat_w = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(want)}
    assert len(flat_g) == len(flat_w) and flat_g
    for p, v in flat_g:
        np.testing.assert_array_equal(v, flat_w[jax.tree_util.keystr(p)],
                                      err_msg=jax.tree_util.keystr(p))
    # pos embs sliced to the configured geometry
    d = cfg.hidden_size
    assert got["enc_img"]["emb_pos"].shape == (1, 1, 1 + 14 ** 2, d)
    assert got["enc_img"]["emb_len"].shape == (1, 6, 1, d)

    # converted params drive a real forward
    model = VioletBase(config=cfg)
    rs = np.random.RandomState(0)
    out = model.apply(
        {"params": {k: v for k, v in got.items()
                    if k in ("enc_img", "enc_txt", "trsfr")}},
        rs.rand(1, 2, 64, 64, 3).astype(np.float32),
        rs.randint(0, TINY_BERT.vocab_size, (1, 8)),
        np.ones((1, 8), np.int64))
    assert np.isfinite(np.asarray(out)).all()


@requires_reference
def test_swinbert_named_ckpt_remaps_on_load(tmp_path):
    """A '...SwinBERT...' filename triggers the key remap of ref
    model.py:355-386: swin.backbone->enc_img.swin,
    trans_encoder.bert.encoder->trsfr, trans_encoder.cls.->fc_mtm, and the
    duplicated decoder bias."""
    import torch
    from empirical_mvm_tpu.train.checkpoint import load_torch_violet_ckpt

    cfg = _tiny_model_cfg()
    sd = _reference_format_sd(cfg)
    swinbert_sd = {}
    for k, v in sd.items():
        if k.startswith("enc_img.swin."):
            swinbert_sd[k.replace("enc_img.swin.", "swin.backbone.")] = v
        elif k.startswith("trsfr."):
            swinbert_sd[k.replace("trsfr.", "trans_encoder.bert.encoder.")] = v
        elif k.startswith("enc_txt.emb_txt."):
            swinbert_sd[k.replace("enc_txt.emb_txt.",
                                  "trans_encoder.bert.embeddings.")] = v
        elif k.startswith("fc_mtm."):
            swinbert_sd[k.replace("fc_mtm.", "trans_encoder.cls.")] = v
        elif k.startswith("enc_img.fc."):
            swinbert_sd[k.replace("enc_img.fc.", "fc.")] = v
        # emb_cls/emb_pos/... have no SwinBERT source -> stay at init
    path = str(tmp_path / "ckpt_base_SwinBERT.pt")
    torch.save(swinbert_sd, path)

    params = load_torch_violet_ckpt(path, cfg, heads={"fc_mtm": "mlm_head"})
    assert "swin" in params["enc_img"] and "trsfr" in params
    assert "emb_txt" in params["enc_txt"] and "fc_mtm" in params
    # remapped swin numerics intact (flax key: patch_embed_proj_kernel,
    # conv OIDHW -> DHWIO transposed on import)
    ref_first = sd["enc_img.swin.patch_embed.proj.weight"].numpy()
    got_first = params["enc_img"]["swin"]["patch_embed_proj_kernel"]
    assert np.allclose(np.sort(ref_first.ravel()),
                       np.sort(np.asarray(got_first).ravel()))
