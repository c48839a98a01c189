"""Tests for the alternate visual encoders (2D swin / r50 / merlot)."""

import numpy as np
import pytest

import tests.conftest  # noqa: F401

import jax
import jax.numpy as jnp

from empirical_mvm_tpu.core.config import BertConfig, ModelConfig, SwinConfig
from empirical_mvm_tpu.models.violet import VioletBase

TINY_BERT = BertConfig(vocab_size=100, hidden_size=32, num_hidden_layers=1,
                       num_attention_heads=4, intermediate_size=64)
TINY_SWIN = SwinConfig(embed_dim=8, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8),
                       patch_size=(1, 4, 4), window_size=(1, 7, 7),
                       drop_path_rate=0.0)


def _run(vb, tf, expect_t):
    cfg = ModelConfig(vis_backbone=vb, temporal_fusion=tf, size_img=64,
                      size_frame=2, size_txt=6, fusion=TINY_BERT,
                      text=TINY_BERT, swin_custom=TINY_SWIN)
    model = VioletBase(config=cfg)
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(2, 2, 64, 64, 3).astype(np.float32))
    txt = jnp.asarray(rs.randint(5, 100, (2, 6)).astype(np.int32))
    mask = jnp.ones((2, 6), jnp.int32)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), img, txt,
                                        mask)["params"])()
    out = jax.jit(lambda p: model.apply({"params": p}, img, txt, mask))(params)
    lv = expect_t * (1 + 2 * 2)
    assert out.shape == (2, lv + 6, 32), out.shape
    assert np.isfinite(np.asarray(out)).all()


def test_swin2d_concat():
    _run("swin", "concat", expect_t=2)


def test_swin2d_mean():
    _run("swin", "mean", expect_t=1)


def test_r50_concat():
    _run("r50", "concat", expect_t=2)


def test_r50_mean():
    _run("r50", "mean", expect_t=1)


def test_merlot():
    _run("merlot", "concat", expect_t=2)
