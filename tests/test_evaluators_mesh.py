"""Mesh-parallel two-stage retrieval eval (VERDICT r3 item 5).

The reference spreads the |T| x |V| cross-scoring over GPUs via
``T.nn.DataParallel`` (ref: eval_retrieval_tsv.py:45); our evaluator shards
both stages over the data mesh. These tests assert (i) the eval actually
runs sharded on the 8-device CPU mesh and (ii) the metrics are unchanged
vs a single-device run.
"""

import numpy as np
import pytest

import tests.conftest  # noqa: F401

import jax
import jax.numpy as jnp

from empirical_mvm_tpu.core.config import BertConfig, ModelConfig, SwinConfig
from empirical_mvm_tpu.models.tasks import VioletRetrieval
from empirical_mvm_tpu.parallel.mesh import make_mesh
from empirical_mvm_tpu.train.evaluators import retrieval_two_stage_eval

TINY_BERT = BertConfig(vocab_size=200, hidden_size=32, num_hidden_layers=2,
                       num_attention_heads=4, intermediate_size=64)
TINY_SWIN = SwinConfig(embed_dim=8, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8),
                       drop_path_rate=0.0)


class FakeRetrievalDataset:
    """Minimal two-stage-eval dataset: 6 texts over 3 videos, 2 clips each."""

    def __init__(self, n_txt=6, n_vid=3, clips=2, t=2, s=64, x=8, seed=0):
        rs = np.random.RandomState(seed)
        self.items = []
        self.gt_txt2vid = {}
        for i in range(n_txt):
            vid = f"v{i % n_vid}"
            tid = f"t{i}"
            self.items.append({
                "img": rs.rand(clips, t, s, s, 3).astype(np.float32),
                "txt": rs.randint(5, 200, (x,)).astype(np.int32),
                "mask": np.ones((x,), np.int32),
                "vid": vid, "tid": tid})
            self.gt_txt2vid[tid] = vid
        # same video content for the same vid so stage-1 feats are consistent
        by_vid = {}
        for it in self.items:
            by_vid.setdefault(it["vid"], it["img"])
            it["img"] = by_vid[it["vid"]]

    def __len__(self):
        return len(self.items)

    def multi_clip_item(self, i):
        return self.items[i]


def test_two_stage_eval_mesh_matches_single_device():
    cfg = ModelConfig(size_img=64, size_frame=2, size_txt=8,
                      fusion=TINY_BERT, text=TINY_BERT, swin_custom=TINY_SWIN)
    model = VioletRetrieval(config=cfg)
    ds = FakeRetrievalDataset()
    rng = jax.random.PRNGKey(0)
    params = jax.jit(lambda: model.init(
        rng, jnp.zeros((1, 2, 64, 64, 3)), jnp.zeros((1, 8), jnp.int32),
        jnp.ones((1, 8), jnp.int32))["params"])()

    m8 = retrieval_two_stage_eval(model, params, ds, chunk_size=8,
                                  encode_batch=8, mesh=make_mesh(8))
    m1 = retrieval_two_stage_eval(model, params, ds, chunk_size=8,
                                  encode_batch=8, mesh=make_mesh(1))
    assert m8.pop("_mesh_devices") == 8.0
    assert m1.pop("_mesh_devices") == 1.0
    for k in ("r1", "r5", "r10", "medr"):
        assert m8[k] == pytest.approx(m1[k], abs=1e-4), (k, m8, m1)
    # sanity: scores were actually computed (not all-zero ranks)
    assert 0.0 <= m8["r1"] <= 100.0 and m8["medr"] >= 1.0


def test_two_stage_eval_pads_indivisible_chunks():
    """chunk/encode sizes that don't divide the mesh are padded up, and odd
    pair counts (6 texts x 3 videos = 18 pairs vs chunk 16) still fill the
    full score matrix."""
    cfg = ModelConfig(size_img=64, size_frame=2, size_txt=8,
                      fusion=TINY_BERT, text=TINY_BERT, swin_custom=TINY_SWIN)
    model = VioletRetrieval(config=cfg)
    ds = FakeRetrievalDataset()
    rng = jax.random.PRNGKey(0)
    params = jax.jit(lambda: model.init(
        rng, jnp.zeros((1, 2, 64, 64, 3)), jnp.zeros((1, 8), jnp.int32),
        jnp.ones((1, 8), jnp.int32))["params"])()
    m = retrieval_two_stage_eval(model, params, ds, chunk_size=13,
                                 encode_batch=3, mesh=make_mesh(8))
    assert m["_mesh_devices"] == 8.0
    assert m["medr"] >= 1.0
