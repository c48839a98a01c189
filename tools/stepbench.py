"""Step-decomposition benchmark: where does the pretrain step's time go?

Times the full flagship train step (as bench.py) plus ablated variants on
the real TPU chip, so component costs fall out by subtraction:

  full            MTM + VTM(4 opts) + MVM(pixel), bm/rm masking, AdamW
  no_vtm_negs     num_options=1 (drops the B*(O-1)-pair fusion pass)
  no_mvm          mvm_target=() (drops pixel decode + L1)
  no_mask         pretrain_masks=() (drops the on-device masking engine)
  fusion0         0 fusion layers (isolates the 12-layer cross encoder)
  swin_grad       isolated Video-Swin fwd+bwd (same batch)
  fusion_grad     isolated 12-layer fusion stack fwd+bwd (B*O pairs of
                  inputs at the pretrain seq length)

Run: python tools/stepbench.py [--batch 16] [--only NAME]
"""
import argparse
import dataclasses
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

try:
    os.makedirs("/root/.cache/jax_comp", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def make_batch(b, t, s, x):
    rs = np.random.RandomState(0)
    return {
        "img": jnp.asarray(rs.rand(b, t, s, s, 3).astype(np.float32)),
        "txt": jnp.asarray(rs.randint(999, 25000, (b, x)).astype(np.int32)),
        "mask": jnp.asarray(np.ones((b, x), np.int32)),
    }


def build_step(batch_size, num_options=4, mvm=("pixel",), masks=("bm", "rm"),
               fusion_layers=None):
    from empirical_mvm_tpu.core.config import (BertConfig, ModelConfig,
                                               SwinConfig)
    from empirical_mvm_tpu.models.pretrain import VioletPretrain
    from empirical_mvm_tpu.train.optimizer import build_optimizer
    from empirical_mvm_tpu.train.train_step import (create_train_state,
                                                    make_pretrain_train_step)

    kw = dict(vis_backbone_size="base", size_img=224, size_frame=4,
              size_txt=32,
              swin_custom=dataclasses.replace(SwinConfig.base(),
                                              use_pallas_attention=True),
              fusion=dataclasses.replace(BertConfig.base_uncased(),
                                         use_pallas_attention=True))
    if fusion_layers is not None:
        kw["fusion"] = dataclasses.replace(
            kw["fusion"], num_hidden_layers=fusion_layers)
    cfg = ModelConfig(**kw)
    model = VioletPretrain(config=cfg, dtype=jnp.bfloat16, mvm_target=mvm,
                           pretrain_masks=masks, num_options=num_options)
    batch = make_batch(batch_size, cfg.size_frame, cfg.size_img, cfg.size_txt)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(lambda: model.init(
        {"params": rng, "dropout": rng, "mask": rng},
        batch["img"], batch["txt"], batch["mask"],
        method=model.losses)["params"])()
    tx = build_optimizer(params, lr=5e-5, max_iter=1000)
    step = make_pretrain_train_step(model, tx, mesh=None, donate=True)
    state = create_train_state(params, tx)
    return step, state, batch


def time_step(step, state, batch, n_warm=2, n_meas=8):
    rng = jax.random.PRNGKey(2)
    state, ls = step(state, batch, rng)
    jax.block_until_ready(ls)
    for _ in range(n_warm):
        state, ls = step(state, batch, rng)
    jax.block_until_ready(ls)
    t0 = time.perf_counter()
    for _ in range(n_meas):
        state, ls = step(state, batch, rng)
    jax.block_until_ready(ls)
    return (time.perf_counter() - t0) / n_meas


def swin_grad_time(batch_size):
    from empirical_mvm_tpu.core.config import SwinConfig
    from empirical_mvm_tpu.models.video_swin import SwinTransformer3D
    import dataclasses
    cfg = dataclasses.replace(SwinConfig.base(), use_pallas_attention=True)
    model = SwinTransformer3D(config=cfg, dtype=jnp.bfloat16)
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(batch_size, 4, 224, 224, 3).astype(np.float32))
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), img)["params"])()

    def loss(p):
        return jnp.sum(model.apply({"params": p}, img).astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss))
    o = g(params)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(6):
        o = g(params)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / 6


def fusion_grad_time(batch_size, num_options=4):
    """12-layer fusion stack at the pretrain seq length, MTM pass (B rows)
    plus the VTM negatives pass (B*(O-1) rows), fwd+bwd."""
    from empirical_mvm_tpu.core.config import BertConfig
    from empirical_mvm_tpu.models.bert import BertEncoder
    cfg = BertConfig.base_uncased()
    model = BertEncoder(config=cfg, dtype=jnp.bfloat16)
    seq = 4 * (1 + 49) + 32
    rows = batch_size + batch_size * (num_options - 1)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(rows, seq, cfg.hidden_size), jnp.bfloat16)
    bias = jnp.zeros((rows, 1, seq, seq), jnp.float32)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x, bias)["params"])()

    def loss(p, x):
        out = model.apply({"params": p}, x, bias)
        if isinstance(out, tuple):
            out = out[0]
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss))
    o = g(params, x)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(6):
        o = g(params, x)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / 6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    b = args.batch

    variants = {
        "full": dict(),
        "no_vtm_negs": dict(num_options=1),
        "no_mvm": dict(mvm=()),
        "no_mask": dict(masks=()),
        "fusion0": dict(fusion_layers=0),
    }
    results = {}
    for name, kw in variants.items():
        if args.only and name != args.only:
            continue
        try:
            step, state, batch = build_step(b, **kw)
            dt = time_step(step, state, batch)
            results[name] = dt
            print(f"{name:14s} {dt*1e3:8.1f} ms/step  "
                  f"({b/dt:6.1f} clips/s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:14s} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
    if not args.only or args.only == "swin_grad":
        try:
            dt = swin_grad_time(b)
            print(f"{'swin_grad':14s} {dt*1e3:8.1f} ms/step", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"swin_grad FAILED: {str(e)[:200]}", flush=True)
    if not args.only or args.only == "fusion_grad":
        try:
            dt = fusion_grad_time(b)
            print(f"{'fusion_grad':14s} {dt*1e3:8.1f} ms/step", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"fusion_grad FAILED: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
