"""PyTorch-checkpoint -> flax-params importers.

Replicates the reference's lenient checkpoint-loading semantics
(ref: model.py:295-386): key intersection with missing/unexpected/mismatch
reporting, temporal/spatial position-embedding slicing on size mismatch, and
SwinBERT key remapping — but producing JAX pytrees instead of torch modules.

All functions take a flat ``{torch_key: numpy array}`` dict (the caller is
responsible for ``torch.load`` + ``.numpy()`` conversion, so this module has
no torch dependency and works from saved ``.npz`` conversions too).
"""

from __future__ import annotations

import logging
from typing import Any, Mapping

import numpy as np

logger = logging.getLogger(__name__)

Params = dict[str, Any]


def _set(tree: Params, path: str, value: np.ndarray) -> None:
    parts = path.split(".")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _linear(tree: Params, flax_path: str, sd: Mapping[str, np.ndarray],
            torch_prefix: str, bias: bool = True) -> None:
    """torch nn.Linear (out,in) -> flax Dense kernel (in,out)."""
    _set(tree, f"{flax_path}.kernel", np.ascontiguousarray(sd[f"{torch_prefix}.weight"].T))
    if bias and f"{torch_prefix}.bias" in sd:
        _set(tree, f"{flax_path}.bias", sd[f"{torch_prefix}.bias"])


def _layernorm(tree: Params, flax_path: str, sd: Mapping[str, np.ndarray],
               torch_prefix: str) -> None:
    _set(tree, f"{flax_path}.scale", sd[f"{torch_prefix}.weight"])
    _set(tree, f"{flax_path}.bias", sd[f"{torch_prefix}.bias"])


def swin3d_params_from_torch(
    sd: Mapping[str, np.ndarray],
    depths: tuple[int, ...],
    prefix: str = "",
) -> Params:
    """Convert a reference ``SwinTransformer3D`` state_dict into the param
    tree of :class:`empirical_mvm_tpu.models.video_swin.SwinTransformer3D`.

    Key map (torch -> flax), ref: visbackbone/video_swin.py module tree:
      patch_embed.proj.{weight,bias}    -> patch_embed_proj_{kernel,bias}
      patch_embed.norm                  -> patch_embed_norm
      layers.{i}.blocks.{j}.*           -> layers_{i}.blocks_{j}.*
      layers.{i}.downsample.*           -> layers_{i}.downsample.*
      norm                              -> norm
    ``relative_position_index`` buffers are regenerated, not loaded
    (ref: visbackbone/video_swin.py:499-502 deletes them on load too).
    """
    p = prefix
    tree: Params = {}
    # conv3d OIDHW (E, C, kd, kh, kw) -> (kd, kh, kw, C, E)
    _set(tree, "patch_embed_proj_kernel",
         np.ascontiguousarray(sd[f"{p}patch_embed.proj.weight"].transpose(2, 3, 4, 1, 0)))
    _set(tree, "patch_embed_proj_bias", sd[f"{p}patch_embed.proj.bias"])
    if f"{p}patch_embed.norm.weight" in sd:
        _layernorm(tree, "patch_embed_norm", sd, f"{p}patch_embed.norm")

    for i, depth in enumerate(depths):
        for j in range(depth):
            tb = f"{p}layers.{i}.blocks.{j}"
            fb = f"layers_{i}.blocks_{j}"
            _layernorm(tree, f"{fb}.norm1", sd, f"{tb}.norm1")
            _layernorm(tree, f"{fb}.norm2", sd, f"{tb}.norm2")
            _set(tree, f"{fb}.attn.relative_position_bias_table",
                 sd[f"{tb}.attn.relative_position_bias_table"])
            _linear(tree, f"{fb}.attn.qkv", sd, f"{tb}.attn.qkv")
            _linear(tree, f"{fb}.attn.proj", sd, f"{tb}.attn.proj")
            _linear(tree, f"{fb}.mlp.fc1", sd, f"{tb}.mlp.fc1")
            _linear(tree, f"{fb}.mlp.fc2", sd, f"{tb}.mlp.fc2")
        if f"{p}layers.{i}.downsample.norm.weight" in sd:
            _layernorm(tree, f"layers_{i}.downsample.norm", sd,
                       f"{p}layers.{i}.downsample.norm")
            _linear(tree, f"layers_{i}.downsample.reduction", sd,
                    f"{p}layers.{i}.downsample.reduction", bias=False)
    _layernorm(tree, "norm", sd, f"{p}norm")
    return tree


def swin2d_params_from_hf(sd: Mapping[str, np.ndarray],
                          depths: tuple[int, ...],
                          prefix: str = "") -> Params:
    """HF ``transformers.SwinModel`` state_dict -> the param tree of our
    SwinTransformer3D with ``swin2d_config`` (patch (1,4,4), window (1,7,7)).

    A 2D Swin is exactly the 3D module with temporal extent 1: the (169, nH)
    relative-position table and the (dh+6)*13+(dw+6) index layout coincide
    with the 3D formula at wd=1 (see video_swin._relative_position_index).
    HF keeps separate q/k/v projections; they concatenate into our fused qkv.
    The final ``layernorm`` is intentionally NOT mapped — the reference
    consumes ``hidden_states[-1]`` which is pre-norm (visbackbone/swin.py:75).
    """
    p = prefix
    tree: Params = {}
    w = sd[f"{p}embeddings.patch_embeddings.projection.weight"]  # (E,3,4,4)
    _set(tree, "patch_embed_proj_kernel",
         np.ascontiguousarray(w.transpose(2, 3, 1, 0))[None])    # (1,4,4,3,E)
    _set(tree, "patch_embed_proj_bias",
         sd[f"{p}embeddings.patch_embeddings.projection.bias"])
    _layernorm(tree, "patch_embed_norm", sd, f"{p}embeddings.norm")

    for i, depth in enumerate(depths):
        for j in range(depth):
            tb = f"{p}encoder.layers.{i}.blocks.{j}"
            fb = f"layers_{i}.blocks_{j}"
            _layernorm(tree, f"{fb}.norm1", sd, f"{tb}.layernorm_before")
            _layernorm(tree, f"{fb}.norm2", sd, f"{tb}.layernorm_after")
            _set(tree, f"{fb}.attn.relative_position_bias_table",
                 sd[f"{tb}.attention.self.relative_position_bias_table"])
            qw = sd[f"{tb}.attention.self.query.weight"]
            kw = sd[f"{tb}.attention.self.key.weight"]
            vw = sd[f"{tb}.attention.self.value.weight"]
            _set(tree, f"{fb}.attn.qkv.kernel",
                 np.ascontiguousarray(np.concatenate([qw, kw, vw], 0).T))
            _set(tree, f"{fb}.attn.qkv.bias",
                 np.concatenate([sd[f"{tb}.attention.self.query.bias"],
                                 sd[f"{tb}.attention.self.key.bias"],
                                 sd[f"{tb}.attention.self.value.bias"]], 0))
            _linear(tree, f"{fb}.attn.proj", sd,
                    f"{tb}.attention.output.dense")
            _linear(tree, f"{fb}.mlp.fc1", sd, f"{tb}.intermediate.dense")
            _linear(tree, f"{fb}.mlp.fc2", sd, f"{tb}.output.dense")
        if f"{p}encoder.layers.{i}.downsample.norm.weight" in sd:
            _layernorm(tree, f"layers_{i}.downsample.norm", sd,
                       f"{p}encoder.layers.{i}.downsample.norm")
            _linear(tree, f"layers_{i}.downsample.reduction", sd,
                    f"{p}encoder.layers.{i}.downsample.reduction", bias=False)
    return tree


def resnet50_params_from_torch(sd: Mapping[str, np.ndarray],
                               prefix: str = "") -> Params:
    """torchvision resnet50 state_dict -> our ResNet50 trunk param tree
    (ref: visbackbone/resnet50.py:17-24 keeps children()[:-2]). BatchNorm
    running stats land in FrozenBatchNorm params (eval-mode teacher)."""
    p = prefix

    def conv(tp):
        return {"kernel": np.ascontiguousarray(
            sd[f"{tp}.weight"].transpose(2, 3, 1, 0))}

    def bn(tp):
        return {"scale": sd[f"{tp}.weight"], "bias": sd[f"{tp}.bias"],
                "mean": sd[f"{tp}.running_mean"],
                "var": sd[f"{tp}.running_var"]}

    tree: Params = {"conv1": conv(f"{p}conv1"), "bn1": bn(f"{p}bn1")}
    for li, n_blocks in ((1, 3), (2, 4), (3, 6), (4, 3)):
        for bi in range(n_blocks):
            tb = f"{p}layer{li}.{bi}"
            blk: Params = {}
            for ci in (1, 2, 3):
                blk[f"conv{ci}"] = conv(f"{tb}.conv{ci}")
                blk[f"bn{ci}"] = bn(f"{tb}.bn{ci}")
            if f"{tb}.downsample.0.weight" in sd:
                blk["down_conv"] = conv(f"{tb}.downsample.0")
                blk["down_bn"] = bn(f"{tb}.downsample.1")
            tree[f"layer{li}_{bi}"] = blk
    return tree


def vit_encoder_params_from_hf(sd: Mapping[str, np.ndarray], prefix: str,
                               num_layers: int) -> Params:
    """HF ``ViTModel.encoder`` state_dict -> a tree of ViTBlock params
    (teachers/dpt.py:ViTBlock — timm layout with fused qkv). Used by the
    MERLOT encoder (ref: visbackbone/merlot.py:41-49 takes ``vit.encoder``).
    """
    tree: Params = {}
    for i in range(num_layers):
        tl = f"{prefix}layer.{i}"
        blk: Params = {}
        _layernorm(blk, "norm1", sd, f"{tl}.layernorm_before")
        _layernorm(blk, "norm2", sd, f"{tl}.layernorm_after")
        qw = sd[f"{tl}.attention.attention.query.weight"]
        kw = sd[f"{tl}.attention.attention.key.weight"]
        vw = sd[f"{tl}.attention.attention.value.weight"]
        _set(blk, "qkv.kernel",
             np.ascontiguousarray(np.concatenate([qw, kw, vw], 0).T))
        _set(blk, "qkv.bias",
             np.concatenate([sd[f"{tl}.attention.attention.query.bias"],
                             sd[f"{tl}.attention.attention.key.bias"],
                             sd[f"{tl}.attention.attention.value.bias"]], 0))
        _linear(blk, "proj", sd, f"{tl}.attention.output.dense")
        _linear(blk, "fc1", sd, f"{tl}.intermediate.dense")
        _linear(blk, "fc2", sd, f"{tl}.output.dense")
        tree[f"vit_{i}"] = blk
    return tree


def bert_embeddings_params_from_torch(sd: Mapping[str, np.ndarray],
                                      prefix: str) -> Params:
    """HF BertEmbeddings state_dict -> our BertEmbeddings param tree."""
    tree: Params = {}
    _set(tree, "word_embeddings.embedding", sd[f"{prefix}word_embeddings.weight"])
    _set(tree, "position_embeddings.embedding", sd[f"{prefix}position_embeddings.weight"])
    _set(tree, "token_type_embeddings.embedding", sd[f"{prefix}token_type_embeddings.weight"])
    _layernorm(tree, "LayerNorm", sd, f"{prefix}LayerNorm")
    return tree


def bert_encoder_params_from_torch(sd: Mapping[str, np.ndarray], prefix: str,
                                   num_layers: int) -> Params:
    """HF BertEncoder state_dict -> our BertEncoder param tree."""
    tree: Params = {}
    for i in range(num_layers):
        tl = f"{prefix}layer.{i}"
        fl = f"layer_{i}"
        _linear(tree, f"{fl}.attention.query", sd, f"{tl}.attention.self.query")
        _linear(tree, f"{fl}.attention.key", sd, f"{tl}.attention.self.key")
        _linear(tree, f"{fl}.attention.value", sd, f"{tl}.attention.self.value")
        _linear(tree, f"{fl}.attention.out", sd, f"{tl}.attention.output.dense")
        _layernorm(tree, f"{fl}.attention.LayerNorm", sd,
                   f"{tl}.attention.output.LayerNorm")
        _linear(tree, f"{fl}.intermediate", sd, f"{tl}.intermediate.dense")
        _linear(tree, f"{fl}.output", sd, f"{tl}.output.dense")
        _layernorm(tree, f"{fl}.LayerNorm", sd, f"{tl}.output.LayerNorm")
    return tree


def bert_mlm_head_params_from_torch(sd: Mapping[str, np.ndarray],
                                    prefix: str) -> Params:
    """HF BertOnlyMLMHead (``cls.``) state_dict -> our BertMLMHead tree
    (ref: main_pretrain.py:148-150 picks ``bert.cls`` as fc_mtm)."""
    tree: Params = {}
    _linear(tree, "transform", sd, f"{prefix}predictions.transform.dense")
    _layernorm(tree, "LayerNorm", sd, f"{prefix}predictions.transform.LayerNorm")
    _linear(tree, "decoder", sd, f"{prefix}predictions.decoder", bias=False)
    # HF stores the tied decoder bias at cls.predictions.bias
    bias_key = (f"{prefix}predictions.decoder.bias"
                if f"{prefix}predictions.decoder.bias" in sd
                else f"{prefix}predictions.bias")
    _set(tree, "decoder.bias", sd[bias_key])
    return tree


def score_head_params_from_torch(sd: Mapping[str, np.ndarray],
                                 prefix: str) -> Params:
    """torch ``nn.Sequential(Dropout, Linear, ReLU, Linear)`` score head
    (ref: main_pretrain.py:146) -> our ScoreHead {fc1, fc2}."""
    tree: Params = {}
    _linear(tree, "fc1", sd, f"{prefix}1")
    _linear(tree, "fc2", sd, f"{prefix}3")
    return tree


def violet_params_from_torch(
    sd: Mapping[str, np.ndarray],
    model_cfg,
    heads: Mapping[str, str] | None = None,
) -> Params:
    """Convert a full reference VIOLET checkpoint into the param tree of
    :class:`empirical_mvm_tpu.models.violet.VioletBase` (or a task subclass).

    ``heads`` maps extra flax head names to their torch key prefix kind:
      {"fc": "score_head", "fc_mtm": "mlm_head", "fc_qaoe": "score_head", ...}

    Implements the lenient-load semantics of ref model.py:295-353: keys are
    intersected, pos-embs sliced to the configured sizes, and the rest
    reported via :func:`report_key_diff`.
    """
    sd = _slice_pos_embs(dict(sd), model_cfg)
    tree: Params = {}

    # enc_img (optional: text-only / fusion-only checkpoints skip it —
    # lenient intersection semantics, ref model.py:309-341)
    if any(k.startswith("enc_img.swin.") for k in sd):
        swin = swin3d_params_from_torch(sd, model_cfg.swin.depths,
                                        prefix="enc_img.swin.")
        tree["enc_img"] = {"swin": swin}
        if "enc_img.fc.weight" in sd:
            _linear(tree, "enc_img.fc", sd, "enc_img.fc")
        for k in ("emb_cls", "emb_pos", "emb_len", "emb_odr"):
            if f"enc_img.{k}" in sd:
                tree["enc_img"][k] = sd[f"enc_img.{k}"]
        if "enc_img.norm.weight" in sd:
            _layernorm(tree, "enc_img.norm", sd, "enc_img.norm")
    else:
        logger.warning("no enc_img.swin.* keys in checkpoint; visual "
                       "encoder left at init")

    # enc_txt
    if any(k.startswith("enc_txt.emb_txt.") for k in sd):
        tree["enc_txt"] = {"emb_txt":
                           bert_embeddings_params_from_torch(
                               sd, "enc_txt.emb_txt.")}
    else:
        tree["enc_txt"] = {}
    if any(k.startswith("enc_txt.txt_trsfr.") for k in sd):
        tree["enc_txt"]["txt_trsfr"] = bert_encoder_params_from_torch(
            sd, "enc_txt.txt_trsfr.", model_cfg.text.num_hidden_layers)

    # fusion transformer
    if any(k.startswith("trsfr.") for k in sd):
        tree["trsfr"] = bert_encoder_params_from_torch(
            sd, "trsfr.", model_cfg.fusion.num_hidden_layers)

    # task heads
    for name, kind in (heads or {}).items():
        torch_prefix = f"{name}."
        if not any(k.startswith(torch_prefix) for k in sd):
            logger.warning("head %s not found in checkpoint; left at init", name)
            continue
        if kind == "score_head":
            tree[name] = score_head_params_from_torch(sd, torch_prefix)
        elif kind == "mlm_head":
            tree[name] = bert_mlm_head_params_from_torch(sd, torch_prefix)
        elif kind == "linear":
            _linear(tree, name, sd, f"{name}")
        else:
            raise ValueError(f"unknown head kind {kind}")
    return tree


def _slice_pos_embs(sd: dict[str, np.ndarray], model_cfg) -> dict[str, np.ndarray]:
    """Temporal/spatial pos-emb slicing on size mismatch
    (ref: model.py:342-353)."""
    out = dict(sd)
    key = "enc_img.emb_len"
    if key in out:
        want = model_cfg.max_size_frame
        have = out[key].shape[1]
        if have > want:
            out[key] = out[key][:, :want]
        elif have < want:
            pad = np.zeros((1, want - have, 1, out[key].shape[-1]), out[key].dtype)
            out[key] = np.concatenate([out[key], pad], axis=1)
            logger.warning("emb_len padded %d -> %d frames", have, want)
    key = "enc_img.emb_pos"
    if key in out:
        want = 1 + model_cfg.max_size_patch ** 2
        have = out[key].shape[2]
        if have > want:
            out[key] = out[key][:, :, :want]
        elif have < want:
            pad = np.zeros((1, 1, want - have, out[key].shape[-1]), out[key].dtype)
            out[key] = np.concatenate([out[key], pad], axis=2)
            logger.warning("emb_pos padded %d -> %d slots", have, want)
    return out


def remap_swinbert_keys(sd: Mapping[str, np.ndarray]) -> dict[str, np.ndarray]:
    """SwinBERT -> VIOLET key remap (ref: model.py:355-386)."""
    out: dict[str, np.ndarray] = {}
    dropped = []
    for key, val in sd.items():
        if "swin.backbone" in key:
            out[key.replace("swin.backbone", "enc_img.swin")] = val
        elif "trans_encoder.bert.encoder" in key:
            out[key.replace("trans_encoder.bert.encoder", "trsfr")] = val
        elif "trans_encoder.bert.embeddings" in key:
            out[key.replace("trans_encoder.bert.embeddings", "enc_txt.emb_txt")] = val
        elif key.startswith("fc."):
            out[key.replace("fc.", "enc_img.fc.")] = val
        elif "trans_encoder.bert.img_embedding" in key:
            out[key.replace("trans_encoder.bert.img_embedding",
                            "enc_img.img_embedding")] = val
        elif key.startswith("trans_encoder.cls."):
            out[key.replace("trans_encoder.cls.", "fc_mtm.")] = val
        else:
            dropped.append(key)
    if "fc_mtm.predictions.bias" in out:
        out["fc_mtm.predictions.decoder.bias"] = out["fc_mtm.predictions.bias"]
    if dropped:
        logger.info("SwinBERT remap dropped %d keys", len(dropped))
    return out


def report_key_diff(expected: set[str], loaded: set[str]) -> None:
    """Missing/unexpected reporting (ref: model.py:309-341)."""
    unexpected = loaded - expected
    missing = expected - loaded
    if unexpected:
        logger.warning("Unexpected checkpoint keys (%d): %s",
                       len(unexpected), sorted(unexpected)[:20])
    if missing:
        logger.warning("Missing checkpoint keys (%d): %s",
                       len(missing), sorted(missing)[:20])


def inflate_swin2d_to_3d(sd: Mapping[str, np.ndarray],
                         window_size: tuple[int, int, int] = (8, 7, 7),
                         patch_t: int = 2) -> dict[str, np.ndarray]:
    """Inflate an ImageNet 2D Swin state_dict to the 3D layout, mirroring
    the reference's ``SwinTransformer3D.inflate_weights``
    (ref: visbackbone/video_swin.py:484-536):

    * ``patch_embed.proj.weight`` (E, C, kh, kw) gains a temporal axis —
      repeated ``patch_t`` times and divided by ``patch_t`` so the initial
      response to a static clip matches the 2D model;
    * ``relative_position_bias_table`` (L1, nH) is bicubically resized to the
      3D spatial window if the 2D window differs, then tiled ``2*wd-1``
      times along the temporal-offset axis;
    * ``relative_position_index`` / ``attn_mask`` buffers are dropped
      (regenerated at trace time here).

    Returns a 3D-layout torch-style state_dict; feed it to
    :func:`swin3d_params_from_torch`.
    """
    wd, wh, ww = window_size
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if "relative_position_index" in k or "attn_mask" in k:
            continue
        if k.endswith("patch_embed.proj.weight"):
            v = np.repeat(v[:, :, None, :, :], patch_t, axis=2) / patch_t
        elif k.endswith("relative_position_bias_table"):
            l1, nh = v.shape
            l2 = (2 * wh - 1) * (2 * ww - 1)
            if l1 != l2:
                import torch
                s1 = int(round(l1 ** 0.5))
                t = torch.from_numpy(np.ascontiguousarray(v)).float()
                t = t.permute(1, 0).reshape(1, nh, s1, s1)
                t = torch.nn.functional.interpolate(
                    t, size=(2 * wh - 1, 2 * ww - 1), mode="bicubic")
                v = t.reshape(nh, l2).permute(1, 0).numpy()
            v = np.tile(v, (2 * wd - 1, 1))
        out[k] = np.asarray(v)
    return out
