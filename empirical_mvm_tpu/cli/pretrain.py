"""Pretraining CLI (ref: main_pretrain.py / main_pretrain_yaml.py).

Multi-dataset MVM pretraining over sharded TSVs with the MetaLoader schedule.

Usage:
  python -m empirical_mvm_tpu.cli.pretrain --config configs/pretrain.json
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from empirical_mvm_tpu.cli import common
from empirical_mvm_tpu.data.datasets import PretrainTsvDataset
from empirical_mvm_tpu.data.loader import MetaLoader, ShardedBatchLoader
from empirical_mvm_tpu.models.pretrain import VioletPretrain
from empirical_mvm_tpu.train.agent import PretrainAgent


def main():
    cfg = common.parse_cli(__doc__)
    cfg = common.setup_run(cfg)
    tokzr = common.get_tokenizer(cfg)
    tc = cfg.train

    loaders = {}
    for ds_name in cfg.data.dataset:
        # YAML-manifest composite dataset (ref: main_pretrain_yaml.py:10-105):
        # {name}.yaml in data_dir selects the composite path with
        # shard->host affinity sampling
        yaml_path = os.path.join(cfg.data.data_dir, f"{ds_name}.yaml")
        if ds_name.endswith(".yaml") or os.path.exists(yaml_path):
            from empirical_mvm_tpu.data.composite import CompositeYamlDataset
            ds = CompositeYamlDataset(
                cfg, ds_name if ds_name.endswith(".yaml") else yaml_path,
                split="train", tokzr=tokzr)
            dl = ShardedBatchLoader(
                ds, tc.size_batch, shuffle=True, seed=tc.seed,
                num_hosts=jax.process_count(),
                host_index=jax.process_index(),
                num_threads=cfg.data.n_workers,
                source_idx=ds.get_composite_source_idx())
            loaders[ds_name] = (dl, 1)
            continue
        txt_path = os.path.join(cfg.data.data_dir, f"txt_{ds_name}.json")
        with open(txt_path) as f:
            txt = json.load(f)
        # pre-extracted dVAE tokens (cli/extract_vq.py output;
        # ref main_pretrain.py:27-30 prefers on-the-fly when a dalle model
        # is configured, mirrored by VioletPretrain.vq_on_the_fly)
        vq = None
        if "vq" in tc.mvm_target and not cfg.model.vq_on_the_fly:
            vq_path = cfg.data.vq_path
            if vq_path == "auto":
                vq_path = os.path.join(cfg.data.data_dir,
                                       f"vq_{ds_name}.pkl")
                if not os.path.exists(vq_path):
                    vq_path = ""
            if vq_path:
                import pickle
                with open(vq_path, "rb") as f:
                    vq = pickle.load(f)
        # sharded train TSVs: {name}_train_{part}.tsv (ref main_pretrain.py:44-47)
        parts = []
        for part in range(cfg.data.size_part):
            p = os.path.join(cfg.data.data_dir,
                             f"{ds_name}_train_{part}.tsv")
            if os.path.exists(p):
                parts.append(p)
        if not parts:
            raise FileNotFoundError(
                f"no train shards for {ds_name} under {cfg.data.data_dir}")
        # one dataset per shard; weight = shard count
        for i, p in enumerate(parts):
            ds = PretrainTsvDataset(cfg, "train", tokzr, p,
                                    txt.get("train", txt),
                                    dataset_name=ds_name, vq=vq)
            dl = ShardedBatchLoader(
                ds, tc.size_batch, shuffle=True, seed=tc.seed,
                num_hosts=jax.process_count(),
                host_index=jax.process_index(),
                num_threads=cfg.data.n_workers)
            loaders[f"{ds_name}/{i}"] = (dl, 1)

    meta = MetaLoader(loaders, seed=tc.seed, accum_steps=tc.grad_accum)

    # validation loaders (ref: main_pretrain_yaml.py:168-176,286-293 —
    # zero-shot eval at startup + val losses every eval_step). Sources, per
    # dataset: a `{name}_val.yaml` composite manifest, or raw
    # `{name}_val_{part}.tsv` shards with txt["val"] captions. Missing val
    # data just drops that dataset from eval (the reference requires val
    # yamls; ours are optional so tiny runs still work).
    val_loaders = {}
    for ds_name in cfg.data.dataset:
        stem = ds_name[:-len(".yaml")] if ds_name.endswith(".yaml") else ds_name
        val_yaml = os.path.join(cfg.data.data_dir, f"{stem}_val.yaml")
        if os.path.exists(val_yaml):
            from empirical_mvm_tpu.data.composite import CompositeYamlDataset
            ds = CompositeYamlDataset(cfg, val_yaml, split="val", tokzr=tokzr)
            val_loaders[f"{stem}_val"] = ShardedBatchLoader(
                ds, tc.size_batch, shuffle=False, seed=tc.seed,
                num_hosts=jax.process_count(),
                host_index=jax.process_index(),
                num_threads=cfg.data.n_workers)
            continue
        txt_path = os.path.join(cfg.data.data_dir, f"txt_{stem}.json")
        if not os.path.exists(txt_path):
            continue
        with open(txt_path) as f:
            txt_all = json.load(f)
        for part in range(cfg.data.size_part):
            p = os.path.join(cfg.data.data_dir, f"{stem}_val_{part}.tsv")
            if not os.path.exists(p):
                continue
            ds = PretrainTsvDataset(cfg, "val", tokzr, p,
                                    txt_all.get("val", txt_all),
                                    dataset_name=stem)
            val_loaders[f"{stem}_val/{part}"] = ShardedBatchLoader(
                ds, tc.size_batch, shuffle=False, seed=tc.seed,
                num_hosts=jax.process_count(),
                host_index=jax.process_index(),
                num_threads=cfg.data.n_workers)

    model = VioletPretrain(
        config=cfg.model, dtype=jnp.bfloat16,
        vq_on_the_fly=cfg.model.vq_on_the_fly,
        mvm_target=tc.mvm_target, pretrain_tasks=tc.pretrain_tasks,
        pretrain_masks=tc.pretrain_masks, p_mask=tc.p_mask, temp=tc.temp,
        clip_arch=tuple(tc.clip_arch),
        special_token_ids=(tokzr.cls_token_id, tokzr.sep_token_id,
                           tokzr.pad_token_id),
        mask_token_id=tokzr.mask_token_id)

    b, t, s, x = tc.size_batch, cfg.model.size_frame, cfg.model.size_img, \
        cfg.model.size_txt

    def init_fn():
        rng = jax.random.PRNGKey(tc.seed)
        return jax.jit(lambda: model.init(
            {"params": rng, "dropout": rng, "mask": rng},
            jnp.zeros((b, t, s, s, 3)), jnp.zeros((b, x), jnp.int32),
            jnp.ones((b, x), jnp.int32), method=model.losses)["params"])()

    params = common.load_initial_params(
        cfg, model, init_fn,
        heads={"fc": "score_head", "fc_mtm": "mlm_head"})
    params = common.load_teacher_params(cfg, params)

    steps_per_ep = sum(len(l) for l, _ in loaders.values())
    num_steps = steps_per_ep * tc.size_epoch
    agent = PretrainAgent(cfg, model, params, max_iter=max(num_steps, 1))
    eval_fn = agent.make_val_fn(val_loaders) if val_loaders else None
    if agent.resume():
        num_steps = max(num_steps - agent.global_step, 0)
    agent.run_meta(meta, num_steps, eval_every=max(steps_per_ep // 2, 1),
                   eval_fn=eval_fn)
    agent.save(num_steps, tag="pretrain_final")


if __name__ == "__main__":
    main()
