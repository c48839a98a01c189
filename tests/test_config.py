"""Tests for the config system (core/config.py)."""

import json

import tests.conftest  # noqa: F401

from empirical_mvm_tpu.core.config import (BertConfig, ModelConfig, RunConfig,
                                           SwinConfig, load_run_config)


def test_reference_style_flat_json(tmp_path):
    raw = {
        "type": "retrieval", "task": "msrvtt-retrieval",
        "data_dir": "_downstream", "dataset": ["msrvtt"],
        "size_img": 224, "size_frame": 5, "size_txt": 25,
        "size_epoch": 20, "size_batch": 8, "lr": 2e-05, "decay": 0.001,
        "max_grad_norm": 1.0, "vis_backbone_size": "base",
        "multi_clip_testing": True, "path_ckpt": "x.pt",
    }
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(raw))
    cfg = load_run_config(str(p))
    assert cfg.type == "retrieval" and cfg.task == "msrvtt-retrieval"
    assert cfg.model.size_frame == 5 and cfg.model.size_txt == 25
    assert cfg.train.lr == 2e-05 and cfg.train.size_batch == 8
    assert cfg.data.multi_clip_testing is True
    assert cfg.model.swin.embed_dim == 128  # base


def test_swin_custom_and_bert_overrides():
    cfg = load_run_config({
        "swin_custom": {"embed_dim": 8, "depths": [1, 1],
                        "num_heads": [2, 4]},
        "fusion": {"hidden_size": 32, "num_hidden_layers": 2,
                   "num_attention_heads": 4},
    })
    assert cfg.model.swin.embed_dim == 8
    assert cfg.model.swin.depths == (1, 1)
    assert cfg.model.fusion.hidden_size == 32


def test_swin_named_configs_match_reference_values():
    # ref: visbackbone/swin_tiny.py, swin_base.py, swin_large.py, swin_violet.py
    t = SwinConfig.tiny()
    assert (t.embed_dim, t.depths, t.num_heads) == (96, (2, 2, 6, 2),
                                                    (3, 6, 12, 24))
    b = SwinConfig.base()
    assert (b.embed_dim, b.depths, b.num_heads) == (128, (2, 2, 18, 2),
                                                    (4, 8, 16, 32))
    l = SwinConfig.large()
    assert (l.embed_dim, l.num_heads[-1]) == (192, 48)
    v = SwinConfig.violet()
    assert (v.embed_dim, v.depths) == (96, (2, 2, 18, 2))
    assert all(c.patch_size == (2, 4, 4) and c.window_size == (8, 7, 7)
               for c in (t, b, l, v))
    assert b.num_features == 1024


def test_tokens_per_frame():
    m = ModelConfig(size_img=224)
    assert m.tokens_per_frame == 1 + 7 * 7


def test_validation_rejects_bad_combos():
    import pytest as _pytest
    with _pytest.raises(AssertionError):
        load_run_config({"vis_backbone": "merlot", "temporal_fusion": "mean"})
    with _pytest.raises(AssertionError):
        load_run_config({"vis_backbone": "vidswin", "temporal_fusion": "mean"})
    with _pytest.raises(AssertionError):
        load_run_config({"mvm_target": ["bogus"]})


def test_freeze_prefixes_zero_updates():
    """freeze_prefixes params get exactly zero updates
    (ref: model.py:163-172 freeze helpers)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from empirical_mvm_tpu.train.optimizer import build_optimizer

    params = {
        "enc_img": {"kernel": jnp.ones((3, 3)), "bias": jnp.ones((3,))},
        "fc": {"kernel": jnp.ones((3, 3))},
    }
    tx = build_optimizer(params, lr=1e-2, max_iter=10,
                         freeze_prefixes=("enc_img",))
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["enc_img"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(updates["enc_img"]["bias"]).max()) == 0.0
    assert float(jnp.abs(updates["fc"]["kernel"]).max()) > 0.0


def test_freeze_violet_json_flag():
    """reference-style freeze_violet bool maps to the three trunk prefixes."""
    from empirical_mvm_tpu.core.config import load_run_config
    cfg = load_run_config({"type": "qamc", "task": "t", "freeze_violet": True})
    assert set(cfg.train.freeze) == {"enc_img", "enc_txt", "trsfr"}


def test_task_token_and_prompt_keys():
    from empirical_mvm_tpu.core.config import load_run_config
    cfg = load_run_config({"type": "qaoe", "task": "t",
                           "enable_task_token": True, "task_token": "oe",
                           "prompt": "fill in the blank."})
    assert cfg.model.enable_task_token and cfg.model.task_token == "oe"
    assert cfg.data.prompt == "fill in the blank."

