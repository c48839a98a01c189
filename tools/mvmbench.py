"""MVM-target sweep benchmark (BASELINE config 5): clips/s/chip for the
flagship pretrain step with each masked-visual-modeling teacher in the loop
(ref: main_pretrain.py:374-553 calc_mvm_loss; teachers at :153-199).

Teachers run frozen inside the jitted step (randomly initialized — weights
don't change the FLOPs). Batch size falls back when a teacher doesn't fit.

    python tools/mvmbench.py [--targets pixel,hog,...] [--batch 16]
"""
import argparse
import dataclasses
import json
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

ALL_TARGETS = ["pixel", "hog", "vq", "vq_pre", "depth", "optical_flow",
               "2d_feature", "3d_feature", "2d_clip"]


def build(batch_size: int, target: str):
    """``vq``: on-the-fly dVAE teacher in the step, with the fusion stack
    REMATERIALIZED — the merged MTM+VTM 64-row pass plus the dVAE
    activations exceed the chip's 15.75G HBM at batch 16 otherwise
    (diagnosed round 2, commit 70e0d82). ``vq_pre``: pre-extracted tokens
    via cli/extract_vq.py ride the batch — the reference's own cheap mode
    (ref: main_pretrain.py:27-30, dalle=None branch at :203-209)."""
    from empirical_mvm_tpu.core.config import (BertConfig, ModelConfig,
                                               SwinConfig)
    from empirical_mvm_tpu.models.pretrain import VioletPretrain
    from empirical_mvm_tpu.train.optimizer import build_optimizer
    from empirical_mvm_tpu.train.train_step import (create_train_state,
                                                    make_pretrain_train_step)
    on_the_fly = target == "vq"
    mvm = "vq" if target == "vq_pre" else target
    cfg = ModelConfig(
        vis_backbone_size="base", size_img=224, size_frame=4, size_txt=32,
        vq_on_the_fly=on_the_fly,
        swin_custom=dataclasses.replace(SwinConfig.base(),
                                        use_pallas_attention=True),
        fusion=dataclasses.replace(BertConfig.base_uncased(),
                                   use_pallas_attention=True,
                                   remat=on_the_fly))
    model = VioletPretrain(config=cfg, dtype=jnp.bfloat16,
                           mvm_target=(mvm,),
                           vq_on_the_fly=on_the_fly,
                           pretrain_masks=("bm", "rm"))
    b, t, s = batch_size, cfg.size_frame, cfg.size_img
    rs = np.random.RandomState(0)
    batch = {
        "img": jnp.asarray(rs.rand(b, t, s, s, 3).astype(np.float32)),
        "txt": jnp.asarray(rs.randint(999, 25000, (b, cfg.size_txt))
                           .astype(np.int32)),
        "mask": jnp.asarray(np.ones((b, cfg.size_txt), np.int32)),
    }
    if target == "vq_pre":
        h = s // cfg.size_patch
        lv = t * (1 + h * h)
        vq = rs.randint(0, 8192, (b, lv)).astype(np.int32)
        # CLS slots carry no token (ignore label), like the extractor output
        vq[:, :: 1 + h * h] = -1
        batch["vq"] = jnp.asarray(vq)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(lambda: model.init(
        {"params": rng, "dropout": rng, "mask": rng},
        batch["img"], batch["txt"], batch["mask"],
        method=model.losses)["params"])()
    tx = build_optimizer(params, lr=5e-5, max_iter=1000)
    step = make_pretrain_train_step(model, tx, mesh=None, donate=True)
    state = create_train_state(params, tx)
    return step, state, batch


def measure(target: str, batch_sizes=(16, 8, 4)) -> tuple[float, int] | None:
    for bs in batch_sizes:
        try:
            step, state, batch = build(bs, target)
            rng = jax.random.PRNGKey(1)
            state, ls = step(state, batch, rng)
            jax.block_until_ready(ls)
            for _ in range(2):
                state, ls = step(state, batch, rng)
            jax.block_until_ready(ls)
            n = 8
            t0 = time.perf_counter()
            for _ in range(n):
                state, ls = step(state, batch, rng)
            jax.block_until_ready(ls)
            dt = time.perf_counter() - t0
            return bs * n / dt, bs
        except Exception as e:  # noqa: BLE001
            print(f"[{target}] bs={bs} failed: "
                  f"{type(e).__name__}: {str(e)[:160]}", file=sys.stderr)
            continue
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--targets", default=",".join(ALL_TARGETS))
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--_single", action="store_true", help=argparse.SUPPRESS)
    args = ap.parse_args()
    sizes = tuple(b for b in (args.batch, 8, 4) if b <= args.batch)
    targets = args.targets.split(",")

    if args._single:
        r = measure(targets[0], sizes)
        print(json.dumps({targets[0]: None if r is None else
                          {"clips_per_sec": round(r[0], 2), "batch": r[1]}}))
        return

    # one SUBPROCESS per target: a second large train-step program in the
    # same process reads wildly wrong (e.g. 3d_feature at 778 clips/s after
    # a 2d_feature run — measured round 3; donated-buffer reuse across
    # program builds corrupts the timing), matching bench.py's isolation
    import subprocess
    out = {}
    for tgt in targets:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--targets", tgt,
             "--batch", str(args.batch), "--_single"],
            capture_output=True, text=True, timeout=3600)
        sys.stderr.write(p.stderr)
        try:
            out.update(json.loads(p.stdout.strip().splitlines()[-1]))
        except Exception:
            out[tgt] = None
        r = out.get(tgt)
        print(f"{tgt:13s} " + (f"{r['clips_per_sec']:7.2f} clips/s "
                               f"(batch {r['batch']})" if r else "FAILED"),
              file=sys.stderr)
    print(json.dumps({"metric": "mvm_sweep_clips_per_sec", **out}))


if __name__ == "__main__":
    main()
