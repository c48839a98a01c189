"""Shared CLI wiring: config loading, logging, tokenizer, data sources.

Mirrors the reference's per-task ``__main__`` blocks (ref:
main_retrieval_tsv.py:67-103 and siblings): parse config, build the
(Dataset, Model, Agent) triple, optional checkpoint load, zero-shot eval,
train, save.
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import os
from datetime import datetime

import jax
import jax.numpy as jnp

from empirical_mvm_tpu.core.config import RunConfig, load_run_config
from empirical_mvm_tpu.data.datasets import TsvImageSource, load_txt_json
from empirical_mvm_tpu.data.loader import ShardedBatchLoader
from empirical_mvm_tpu.data.tokenizer import load_tokenizer
from empirical_mvm_tpu.parallel.mesh import distributed_init, is_main_process

# hardware RNG for the training-time randomness (dropout / masking /
# drop-path / negative sampling): threefry key derivation costs ~3% of the
# flagship step on v5e (measured 53.9 -> 55.5 clips/s). Any stochastic
# stream is semantically equivalent; runs stay deterministic per seed.
# TPU-only: flipping the process-global impl under the CPU test suite
# changes random streams for unrelated tests.
if os.environ.get("JAX_DEFAULT_PRNG_IMPL") is None:
    try:
        if jax.default_backend() == "tpu":
            jax.config.update("jax_default_prng_impl", "rbg")
    except Exception:  # noqa: BLE001 - older/newer jax without the option
        pass

logger = logging.getLogger("empirical_mvm_tpu")


def parse_cli(description: str) -> RunConfig:
    """(ref: utils/args.py:235-246 get_args)"""
    ap = argparse.ArgumentParser(description=description)
    ap.add_argument("--config", required=True, help="task JSON config")
    ap.add_argument("--path_output", default=None)
    ap.add_argument("--path_ckpt", default=None)
    ap.add_argument("--size_epoch", type=int, default=None)
    args = ap.parse_args()
    cfg = load_run_config(args.config)
    if args.path_output:
        cfg = dataclasses.replace(cfg, path_output=args.path_output)
    if args.path_ckpt is not None:
        cfg = dataclasses.replace(cfg, path_ckpt=args.path_ckpt)
    if args.size_epoch is not None:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train,
                                           size_epoch=args.size_epoch))
    return adopt_ckpt_args(cfg)


# architecture keys re-adopted from the checkpoint's run dir so eval uses the
# training-time model shape (ref: utils/args.py:248-277 update_args)
_ADOPT_KEYS = ("vis_backbone", "vis_backbone_size", "temporal_fusion",
               "txt_backbone_embed_only", "max_size_frame", "max_size_patch")


def adopt_ckpt_args(cfg: RunConfig) -> RunConfig:
    if not cfg.path_ckpt:
        return cfg
    args_json = os.path.join(os.path.dirname(cfg.path_ckpt), "args.json")
    if not os.path.exists(args_json):
        return cfg
    import json
    with open(args_json) as f:
        trained = json.load(f)
    model_args = trained.get("model", trained)  # our nested or ref-flat form
    overrides = {k: model_args[k] for k in _ADOPT_KEYS if k in model_args}
    if overrides:
        logger.info("adopting model args from %s: %s", args_json, overrides)
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, **overrides))
    return cfg


def setup_run(cfg: RunConfig) -> RunConfig:
    """Distributed init + run dir + logging (ref: utils/dist.py:20,
    main_*.py path_output stamping)."""
    distributed_init()
    stamp = datetime.now().strftime("%Y%m%d%H%M%S")
    out = os.path.join(cfg.path_output, f"_{cfg.task}_{stamp}")
    cfg = dataclasses.replace(cfg, path_output=out)
    if is_main_process():
        os.makedirs(out, exist_ok=True)
        logging.basicConfig(
            level=logging.INFO,
            format="%(asctime)s %(name)s %(levelname)s %(message)s",
            handlers=[logging.StreamHandler(),
                      logging.FileHandler(os.path.join(out, "stdout.txt"))])
        import json
        with open(os.path.join(out, "args.json"), "w") as f:
            json.dump(dataclasses.asdict(cfg), f, indent=2, default=str)
    else:
        logging.basicConfig(level=logging.WARNING)  # NoOp-rank equivalent
    return cfg


def get_tokenizer(cfg: RunConfig):
    return load_tokenizer(cfg.data.tokenizer)


def tsv_sources(cfg: RunConfig):
    """img TSV + id2lineidx + txt json (ref: dataset.py:230-246)."""
    data_dir = cfg.data.data_dir
    ds = cfg.data.dataset[0] if cfg.data.dataset else cfg.task.split("-")[0]
    img = TsvImageSource(os.path.join(data_dir, f"img_{ds}.tsv"),
                         os.path.join(data_dir, f"img_{ds}.id2lineidx.pkl"))
    txt = load_txt_json(os.path.join(data_dir, f"txt_{cfg.task}.json"))
    return img, txt


def make_loaders(cfg: RunConfig, datasets: dict[str, object]):
    out = {}
    for split, ds in datasets.items():
        if ds is None:
            out[split] = None
            continue
        out[split] = ShardedBatchLoader(
            ds, cfg.train.size_batch, shuffle=(split == "train"),
            seed=cfg.train.seed, num_hosts=jax.process_count(),
            host_index=jax.process_index(),
            num_threads=cfg.data.n_workers)
    return out


def load_initial_params(cfg: RunConfig, model, example_init_fn,
                        heads: dict[str, str] | None = None):
    """Init + optional checkpoint overlay (ref: model.py:295-353 lenient
    load: intersect what the checkpoint provides, keep init for the rest)."""
    params = example_init_fn()
    if cfg.path_ckpt and os.path.exists(cfg.path_ckpt):
        from empirical_mvm_tpu.train.checkpoint import (load_params,
                                                        load_torch_violet_ckpt)
        if cfg.path_ckpt.endswith((".pt", ".pth", ".bin")):
            loaded = load_torch_violet_ckpt(cfg.path_ckpt, cfg.model,
                                            heads=heads)
        else:
            # template-free restore: layout adaptation (scan stacked vs
            # per-layer) must run before any structure check
            loaded = load_params(cfg.path_ckpt)
        loaded = _adapt_encoder_layout(params, loaded)
        params = _overlay(params, loaded)
        logger.info("loaded checkpoint %s", cfg.path_ckpt)
    elif cfg.path_ckpt:
        logger.warning("checkpoint %s not found, keeping random init "
                       "(ref model.py:299-301 behavior)", cfg.path_ckpt)
    return params


def _adapt_encoder_layout(base, loaded):
    """Convert a checkpoint's trsfr layer layout (per-layer 'layer_i' vs
    scan-stacked 'layer') to the model's, so scan and non-scan models load
    each other's checkpoints transparently."""
    if not (isinstance(base, dict) and isinstance(loaded, dict)):
        return loaded
    from empirical_mvm_tpu.models.bert import (stack_encoder_params,
                                               unstack_encoder_params)
    from empirical_mvm_tpu.models.video_swin import (
        swin_stack_stage_blocks, swin_unstack_stage_blocks)
    out = dict(loaded)
    for k, v in base.items():
        lv = loaded.get(k)
        if not (isinstance(v, dict) and isinstance(lv, dict)):
            continue
        if "layer" in v and "layer_0" in lv:
            n = sum(1 for key in lv if key.startswith("layer_"))
            out[k] = stack_encoder_params(lv, n)
        elif "layer_0" in v and "layer" in lv:
            out[k] = unstack_encoder_params(lv)
        elif "pairs" in v and "blocks_0" in lv:
            n = sum(1 for key in lv if key.startswith("blocks_"))
            out[k] = swin_stack_stage_blocks(lv, n)
        elif "blocks_0" in v and "pairs" in lv:
            out[k] = swin_unstack_stage_blocks(lv)
        else:
            out[k] = _adapt_encoder_layout(v, lv)
    return out


def _overlay(base, loaded):
    """Recursive key-intersect merge with shape check
    (ref: model.py:309-341)."""
    import numpy as np
    if not isinstance(base, dict):
        if loaded is None:
            return base
        if tuple(np.shape(base)) != tuple(np.shape(loaded)):
            logger.warning("shape mismatch %s vs %s; keeping init",
                           np.shape(base), np.shape(loaded))
            return base
        return jnp.asarray(loaded)
    out = {}
    for k, v in base.items():
        out[k] = _overlay(v, loaded.get(k) if isinstance(loaded, dict) else None)
    extra = set(loaded) - set(base) if isinstance(loaded, dict) else set()
    if extra:
        logger.info("unexpected checkpoint keys ignored: %s", sorted(extra)[:10])
    return out


def load_teacher_params(cfg: RunConfig, params):
    """Graft converted MVM-teacher weights into a freshly initialized
    pretrain param tree (ref: main_pretrain.py:184-199 — the reference
    builds torch teacher modules from checkpoints; here the frozen teachers
    are flax submodules inside the jitted step, so their weights overlay the
    init). Missing paths leave the random init in place (with a warning)."""
    import numpy as np

    def torch_sd(path):
        import torch
        sd = torch.load(path, map_location="cpu")
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
                for k, v in sd.items()}

    def graft(key, path, convert):
        if key not in params:
            return
        if not path:
            logger.warning("pretrain model has a %r teacher but no weight "
                           "path is configured — teacher stays at RANDOM "
                           "init (targets will be meaningless)", key)
            return
        if path.endswith((".pt", ".pth", ".bin")):
            params[key] = convert(torch_sd(path))
        else:
            from empirical_mvm_tpu.train.checkpoint import load_params
            params[key] = load_params(path)
        logger.info("loaded %s teacher from %s", key, path)

    m = cfg.model
    from empirical_mvm_tpu.teachers.dvae import dvae_params_from_torch
    from empirical_mvm_tpu.teachers.dpt import dpt_params_from_torch
    from empirical_mvm_tpu.teachers.raft import raft_params_from_torch
    from empirical_mvm_tpu.teachers.clip import clip_params_from_torch
    graft("dvae", m.dalle_model_path, dvae_params_from_torch)
    graft("dpt", m.midas_model_path, dpt_params_from_torch)
    graft("raft", m.raft_model_path, raft_params_from_torch)
    graft("clip_model", m.clip_model_path, clip_params_from_torch)
    return params
