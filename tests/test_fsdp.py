"""FSDP (ZeRO-3-style) production-path test on the 8-device CPU mesh.

``TrainConfig.fsdp=True`` must actually shard param AND optimizer-moment
leaves over the data mesh through the real agent wiring (AgentBase ->
make_pretrain_train_step), and training must be numerically equivalent to
the replicated DDP path (the sharding only changes WHERE leaves live; XLA
all-gathers them just-in-time). Upgrade target: the reference's ZeRO-1
optimizer sharding (ref: agent.py:195-201, utils/deepspeed.py:42-44).
"""

import numpy as np
import pytest

import tests.conftest  # noqa: F401

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from empirical_mvm_tpu.core.config import (BertConfig, ModelConfig, RunConfig,
                                           SwinConfig, TrainConfig)
from empirical_mvm_tpu.models.pretrain import VioletPretrain
from empirical_mvm_tpu.parallel.mesh import shard_batch
from empirical_mvm_tpu.train.agent import PretrainAgent

TINY_BERT = BertConfig(vocab_size=200, hidden_size=32, num_hidden_layers=2,
                       num_attention_heads=4, intermediate_size=64)
TINY_SWIN = SwinConfig(embed_dim=8, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8),
                       drop_path_rate=0.0)


def _model():
    cfg = ModelConfig(size_img=64, size_frame=2, size_txt=8,
                      fusion=TINY_BERT, text=TINY_BERT, swin_custom=TINY_SWIN)
    return VioletPretrain(config=cfg, mvm_target=("pixel",),
                          pretrain_masks=("bm", "rm"))


def _batch(b=8):
    rs = np.random.RandomState(0)
    return {
        "img": rs.rand(b, 2, 64, 64, 3).astype(np.float32),
        "txt": rs.randint(5, 200, (b, 8)).astype(np.int32),
        "mask": np.ones((b, 8), np.int32),
    }


def _agent(tmp_path, model, params, fsdp: bool) -> PretrainAgent:
    run = RunConfig(
        path_output=str(tmp_path / ("fsdp" if fsdp else "ddp")),
        train=TrainConfig(size_batch=8, lr=1e-3, fsdp=fsdp,
                          fsdp_min_size=1024, logging_steps=100))
    return PretrainAgent(run, model, params, max_iter=10)


def _sharded_leaves(tree):
    return [x for x in jax.tree.leaves(tree)
            if hasattr(x, "sharding") and x.sharding.spec != P()]


def test_fsdp_agent_shards_state_and_matches_replicated(tmp_path):
    model = _model()
    batch = _batch()
    rng = jax.random.PRNGKey(0)
    params = jax.jit(lambda: model.init(
        {"params": rng, "dropout": rng, "mask": rng},
        jnp.asarray(batch["img"]), jnp.asarray(batch["txt"]),
        jnp.asarray(batch["mask"]), method=model.losses)["params"])()

    # independent param copies per agent: device_put ALIASES buffers when the
    # source already lives on a mesh device, and the train step donates its
    # state — two agents sharing buffers in one process would delete each
    # other's params (production runs one agent per process)
    fresh = lambda: jax.tree.map(lambda x: jnp.array(np.asarray(x)), params)  # noqa: E731
    ag_rep = _agent(tmp_path, model, fresh(), fsdp=False)
    ag_fsdp = _agent(tmp_path, model, fresh(), fsdp=True)

    # (i) param and optimizer-moment leaves are ACTUALLY sharded
    assert not _sharded_leaves(ag_rep.state.params)
    assert not _sharded_leaves(ag_rep.state.opt_state)
    sharded_params = _sharded_leaves(ag_fsdp.state.params)
    sharded_moments = _sharded_leaves(ag_fsdp.state.opt_state)
    assert sharded_params, "fsdp=True left every param replicated"
    assert sharded_moments, "fsdp=True left every optimizer moment replicated"
    # moments mirror params: AdamW keeps (mu, nu) per trained param
    assert len(sharded_moments) >= len(sharded_params)

    # (ii) losses identical to the replicated path for 3 steps
    losses = {}
    for name, ag in (("ddp", ag_rep), ("fsdp", ag_fsdp)):
        sb = shard_batch(ag.mesh, batch)
        ls_hist = []
        for _ in range(3):
            ag.state, ls = ag.train_step(ag.state, sb, ag.rng)
            ls_hist.append(float(ls["total"]))
        losses[name] = ls_hist
    assert np.all(np.isfinite(losses["fsdp"]))
    np.testing.assert_allclose(losses["fsdp"], losses["ddp"],
                               rtol=2e-5, atol=1e-6)


def test_fsdp_config_roundtrip():
    from empirical_mvm_tpu.core.config import load_run_config
    cfg = load_run_config({"type": "pretrain", "task": "pretrain",
                           "fsdp": True, "size_batch": 16})
    assert cfg.train.fsdp is True
    assert load_run_config({"type": "pretrain",
                            "task": "pretrain"}).train.fsdp is False
