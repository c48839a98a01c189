"""End-to-end pretrain throughput: the REAL loop, loader included.

bench.py steps a device-resident synthetic batch; this tool measures what a
user gets from ``cli/pretrain.py``: sharded-TSV reads, JPEG decode, host
transforms, host->device transfer, and the jitted train step, streaming
every iteration exactly like the reference's loop
(ref: main_pretrain_yaml.py:151-188, agent.py:156-179).

Generates flagship-scale synthetic shards on first run (224^2-class JPEG
frames so decode cost is realistic), then drives PretrainTsvDataset ->
ShardedBatchLoader -> MetaLoader -> the flagship train step for --steps
steps and reports steady-state clips/s next to the device-resident rate.

Run: python tools/e2ebench.py [--steps 100] [--batch 16] [--clips 512]
     [--data /tmp/emvm_e2e] [--mvm pixel]
"""
import argparse
import base64
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

try:
    os.makedirs("/root/.cache/jax_comp", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_default_prng_impl",
                      os.environ.get("JAX_DEFAULT_PRNG_IMPL", "rbg"))
except Exception:
    pass


def make_shards(data_dir: str, n_clips: int, n_frames: int = 4,
                h: int = 256, w: int = 340, n_parts: int = 4,
                ds_name: str = "webvid") -> None:
    """Flagship-scale synthetic shards: WebVid-class source frames (~256x340
    JPEG) so decode+resize cost matches real data."""
    import cv2
    os.makedirs(data_dir, exist_ok=True)
    marker = os.path.join(data_dir, f".made_{n_clips}x{n_frames}")
    if os.path.exists(marker):
        return
    rs = np.random.RandomState(0)
    # a bank of distinct frames, reused across clips (keeps generation fast
    # while every row still decodes a full-size JPEG)
    bank = []
    for _ in range(64):
        arr = (rs.rand(h, w, 3) * 255).astype(np.uint8)
        ok, buf = cv2.imencode(".jpg", arr)
        assert ok
        bank.append(base64.b64encode(buf.tobytes()).decode())
    txt = {}
    per_part = n_clips // n_parts
    words = ["cat", "dog", "car", "tree", "runs", "sits", "red", "blue"]
    for part in range(n_parts):
        path = os.path.join(data_dir, f"{ds_name}_train_{part}.tsv")
        with open(path, "w") as f:
            for i in range(per_part):
                vid = f"clip{part}_{i}"
                frames = [bank[rs.randint(len(bank))]
                          for _ in range(n_frames)]
                f.write("\t".join([vid] + frames) + "\n")
                txt[vid] = [f"a {words[i % 8]} {words[(i + 3) % 8]} video {i}"]
    with open(os.path.join(data_dir, f"txt_{ds_name}.json"), "w") as f:
        json.dump({"train": txt}, f)
    open(marker, "w").close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--clips", type=int, default=512)
    ap.add_argument("--data", default="/tmp/emvm_e2e")
    ap.add_argument("--mvm", default="pixel")
    ap.add_argument("--workers", type=int, default=8)
    args = ap.parse_args()

    make_shards(args.data, args.clips)

    import dataclasses

    from empirical_mvm_tpu.core.config import (BertConfig, DataConfig,
                                               ModelConfig, RunConfig,
                                               SwinConfig, TrainConfig)
    from empirical_mvm_tpu.data.datasets import PretrainTsvDataset
    from empirical_mvm_tpu.data.loader import MetaLoader, ShardedBatchLoader
    from empirical_mvm_tpu.data.tokenizer import load_tokenizer
    from empirical_mvm_tpu.models.pretrain import VioletPretrain
    from empirical_mvm_tpu.train.agent import PretrainAgent

    import jax.numpy as jnp

    model_cfg = ModelConfig(
        vis_backbone_size="base", size_img=224, size_frame=4, size_txt=32,
        swin_custom=dataclasses.replace(SwinConfig.base(),
                                        use_pallas_attention=True),
        fusion=dataclasses.replace(BertConfig.base_uncased(),
                                   use_pallas_attention=True))
    cfg = RunConfig(
        type="pretrain", task="e2ebench",
        model=model_cfg,
        data=DataConfig(data_dir=args.data, dataset=("webvid",),
                        n_workers=args.workers),
        train=TrainConfig(size_batch=args.batch, lr=5e-5,
                          mvm_target=(args.mvm,),
                          pretrain_masks=("bm", "rm"),
                          logging_steps=50),
        path_output="/tmp/emvm_e2e_out")

    tokzr = load_tokenizer(cfg.data.tokenizer)
    with open(os.path.join(args.data, "txt_webvid.json")) as f:
        txt = json.load(f)

    loaders = {}
    for part in range(4):
        p = os.path.join(args.data, f"webvid_train_{part}.tsv")
        ds = PretrainTsvDataset(cfg, "train", tokzr, p, txt["train"],
                                dataset_name="webvid")
        dl = ShardedBatchLoader(ds, args.batch, shuffle=True, seed=0,
                                num_threads=args.workers)
        loaders[f"webvid/{part}"] = (dl, 1)
    meta = MetaLoader(loaders, seed=0)

    model = VioletPretrain(
        config=model_cfg, dtype=jnp.bfloat16, mvm_target=(args.mvm,),
        pretrain_masks=("bm", "rm"),
        special_token_ids=(tokzr.cls_token_id, tokzr.sep_token_id,
                           tokzr.pad_token_id),
        mask_token_id=tokzr.mask_token_id)

    b, t, s, x = args.batch, 4, 224, 32
    rng = jax.random.PRNGKey(0)
    params = jax.jit(lambda: model.init(
        {"params": rng, "dropout": rng, "mask": rng},
        jnp.zeros((b, t, s, s, 3)), jnp.zeros((b, x), jnp.int32),
        jnp.ones((b, x), jnp.int32), method=model.losses)["params"])()

    agent = PretrainAgent(cfg, model, params, max_iter=args.steps)
    from empirical_mvm_tpu.data.loader import DevicePrefetcher
    from empirical_mvm_tpu.parallel.mesh import shard_batch

    stream = DevicePrefetcher(
        iter(meta),
        lambda b: shard_batch(agent.mesh, agent._device_batch(b)))
    warm = 3
    n = 0
    ls = None
    t0 = None
    for (task, sb), _ in zip(iter(stream), range(args.steps)):
        agent.state, ls = agent.train_step(agent.state, sb, agent.rng)
        n += 1
        if n == warm:
            jax.block_until_ready(ls)
            t0 = time.perf_counter()
            n_timed0 = n
    jax.block_until_ready(ls)
    dt = time.perf_counter() - t0
    n_timed = n - n_timed0
    cps = args.batch * n_timed / dt
    print(json.dumps({
        "metric": "e2e_pretrain_clips_per_sec_per_chip",
        "value": round(cps, 2), "unit": "clips/s/chip",
        "steps_timed": n_timed, "mvm": args.mvm, "batch": args.batch,
        "total_loss_last": float(jax.device_get(ls["total"])),
    }))


if __name__ == "__main__":
    main()
