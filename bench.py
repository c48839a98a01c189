"""Benchmark: flagship pretrain train-step throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "pretrain_clips_per_sec_per_chip", "value": N,
   "unit": "clips/s/chip", "vs_baseline": R, "mvm_target": "2d_feature",
   "pixel_clips_per_sec": M}

Config mirrors the reference's headline pretrain setup (ref:
_args/args_pretrain.json): VIOLETv2-base backbone (Video-Swin-base), 4 frames
at 224^2, 32 text tokens, MTM+VTM+MVM objectives with bm/rm masking — the
full jitted training step including on-device masking, in-batch VTM
negatives, backward, and the AdamW update.

Round 3 (VERDICT r2 item 2): the HEADLINE value is now the reference's real
flagship MVM target — ``mvm_target="2d_feature"`` (frozen 2D-Swin feature
teacher in the loop, ref: _args/args_pretrain.json:28, main_pretrain.py:
508-545) — with the round-1/2 pixel series kept as a secondary key for
continuity. The series break is deliberate: 2d_feature carries a frozen
teacher forward (~60ms/step) that pixel does not, so the headline drops
from 56.6 (r2 pixel) to ~44 while measuring strictly MORE reference work.

``vs_baseline``: the reference publishes NO throughput numbers
(BASELINE.md: "speed baselines must be measured"). We normalize against a
documented analytic estimate of the reference's per-A100 throughput,
REFERENCE_CLIPS_PER_SEC_PER_GPU below, so the ratio is comparable across
rounds; the absolute clips/s/chip value is the real measurement.

Measured context (round 2, TPU v5e): ~1100 GFLOP/clip after the VTM
positive-pair reuse (the MTM pass CLS scores the positive; the reference
recomputes it, main_pretrain.py:243-260), MTM+negatives merged into one
fusion-stack call. History: 39.1 (round 1) -> 42.99 (VTM reuse) -> 48.25
(packed-qkv window attention) -> 52.4 (fused BERT attention w/ in-kernel
dropout) -> 54.2 (merged fusion pass) clips/s/chip. The chip's measured
GEMM ceiling is 138 bf16 TFLOP/s (host-readback-timed 8192^3), so this is
~42% MFU; see BENCH_LOCAL_r2.txt for the profile breakdown and the
measured negative results.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

try:
    os.makedirs("/root/.cache/jax_comp", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
try:
    # hardware RNG for dropout/masking keys: threefry derivation costs ~3%
    # of the step (53.9 -> 55.5 clips/s measured round 2); the env var wins
    # for experiments
    jax.config.update("jax_default_prng_impl",
                      os.environ.get("JAX_DEFAULT_PRNG_IMPL", "rbg"))
except Exception:
    pass

# Analytic estimate for the torch reference on one A100 (DeepSpeed fp16,
# batch 20/GPU): ~240 GFLOPs/clip for fwd+bwd of Swin-B(T=4) + fusion + VTM
# at ~25% MFU on 312 TFLOP/s fp16 => ~50 clips/s/GPU. Documented estimate,
# not a measurement (the reference repo publishes none).
REFERENCE_CLIPS_PER_SEC_PER_GPU = 50.0

# Measured chip ceiling: 138 bf16 TFLOP/s on this v5e (host-readback-timed
# 8192^3 GEMM, BENCH_LOCAL_r2.txt). MFU = step FLOPs (XLA cost analysis of
# the compiled program) x steps/s / this ceiling — BASELINE.md's honest
# speed metric (the >=5x clips/s north star is physically unreachable at
# reference FLOPs on this part; >=65% MFU is the reconciled target).
CHIP_BF16_FLOPS = 138e12


def build(batch_size: int, mvm_target: str = "2d_feature"):
    from empirical_mvm_tpu.core.config import ModelConfig
    from empirical_mvm_tpu.models.pretrain import VioletPretrain
    from empirical_mvm_tpu.train.optimizer import build_optimizer
    from empirical_mvm_tpu.train.train_step import (
        create_train_state, make_pretrain_train_step)

    from empirical_mvm_tpu.core.config import BertConfig, SwinConfig
    import dataclasses
    cfg = ModelConfig(
        vis_backbone_size="base", size_img=224, size_frame=4, size_txt=32,
        # fused Pallas window attention: keeps the NxN score matrices in VMEM
        # (measured 14x faster than the XLA einsum path at stage-0 shapes)
        swin_custom=dataclasses.replace(SwinConfig.base(),
                                        use_pallas_attention=True),
        # fused self-attention in the 12-layer cross-modal encoder: probs
        # (62MB/layer/pass at the VTM shapes) stay in VMEM, dropout in-kernel
        fusion=dataclasses.replace(BertConfig.base_uncased(),
                                   use_pallas_attention=True))
    model = VioletPretrain(config=cfg, dtype=jnp.bfloat16,
                           mvm_target=(mvm_target,),
                           pretrain_masks=("bm", "rm"))
    b, t, s = batch_size, cfg.size_frame, cfg.size_img
    rs = np.random.RandomState(0)
    batch = {
        "img": jnp.asarray(rs.rand(b, t, s, s, 3).astype(np.float32)),
        "txt": jnp.asarray(rs.randint(999, 25000, (b, cfg.size_txt))
                           .astype(np.int32)),
        "mask": jnp.asarray(np.ones((b, cfg.size_txt), np.int32)),
    }
    rng = jax.random.PRNGKey(0)
    params = jax.jit(lambda: model.init(
        {"params": rng, "dropout": rng, "mask": rng},
        batch["img"], batch["txt"], batch["mask"],
        method=model.losses)["params"])()
    # flat-optimizer A/B SETTLED round 5 (VERDICT r3 item 7 / r5 task 5):
    # the single-flat-buffer AdamW measured 48.53 clips/s vs 61.93 for the
    # per-leaf optax chain on the 2d_feature flagship (clean, uncontended) —
    # a 22% REGRESSION. ravel_pytree's gather of ~450 leaves into one buffer
    # costs far more than the ~900 small fused kernels it replaces; XLA
    # already fuses the per-leaf chain well. build_flat_optimizer deleted
    # (BENCH_LOCAL_r5.txt).
    tx = build_optimizer(params, lr=5e-5, max_iter=1000)
    step = make_pretrain_train_step(model, tx, mesh=None, donate=True)
    state = create_train_state(params, tx)
    return step, state, batch


def measure(mvm_target: str):
    batch_size = None
    step = state = batch = None
    for bs in (16, 8, 4):
        # several attempts per size: the tunnel's remote-compile service
        # occasionally drops the connection mid-result, and the TPU backend
        # sporadically returns FAILED_PRECONDITION for a minute or two after
        # heavy use (observed round 2) — both recover on retry
        for attempt in range(4):
            try:
                step, state, batch = build(bs, mvm_target)
                rng = jax.random.PRNGKey(1)
                state, ls = step(state, batch, rng)   # compile + step 1
                jax.block_until_ready(ls)
                batch_size = bs
                break
            except Exception as e:  # noqa: BLE001
                msg = str(e)
                import sys
                print(f"[bench] {mvm_target} bs={bs} attempt={attempt} "
                      f"failed: {type(e).__name__}: {msg[:400]}",
                      file=sys.stderr)
                if "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg:
                    break                              # try a smaller batch
                if "FAILED_PRECONDITION" in msg or "backend error" in msg:
                    time.sleep(45)                     # transient backend blip
                    continue
                if attempt < 2:
                    continue                           # transient: retry
                # repeated remote-compile failure usually means the compiler
                # itself ran out of memory at this batch size — fall through
                # to the next size instead of dying
                break
        if batch_size is not None:
            break
    assert batch_size is not None, f"no batch size compiled for {mvm_target}"

    step_flops = None
    try:   # XLA's own FLOP count for the compiled step program
        ca = step.lower(state, batch, jax.random.PRNGKey(2)) \
                 .compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        step_flops = float(ca.get("flops", 0.0)) or None
    except Exception:  # noqa: BLE001 — cost analysis is best-effort
        pass

    rng = jax.random.PRNGKey(2)
    n_warm, n_meas = 3, 10
    for _ in range(n_warm):
        state, ls = step(state, batch, rng)
    jax.block_until_ready(ls)
    # the flagship step costs >=17.6 TFLOP at batch 16 and the chip tops out
    # at 138 bf16 TFLOP/s, so >200 clips/s/chip is physically impossible —
    # observed once when a parent bench process still held the tunnel and
    # the child's timed loop returned without real execution (764 "clips/s")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_meas):
            state, ls = step(state, batch, rng)
        jax.block_until_ready(ls)
        dt = time.perf_counter() - t0
        rate = batch_size * n_meas / dt
        if rate <= 200.0:
            mfu = (step_flops * (rate / batch_size) / CHIP_BF16_FLOPS
                   if step_flops else None)
            return rate, mfu
        time.sleep(10)
    raise RuntimeError(f"implausible rate {rate:.1f} clips/s for "
                       f"{mvm_target}; refusing to report it")


def main():
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "--series":
        # child mode: measure one series; prints "rate mfu"
        rate, mfu = measure(sys.argv[2])
        print(round(rate, 2), round(mfu, 4) if mfu else "nan")
        return
    clips_per_sec, mfu = measure("2d_feature")  # the reference flagship target
    out = {
        "metric": "pretrain_clips_per_sec_per_chip",
        "value": round(clips_per_sec, 2),
        "unit": "clips/s/chip",
        "vs_baseline": round(clips_per_sec / REFERENCE_CLIPS_PER_SEC_PER_GPU,
                             3),
        "mvm_target": "2d_feature",
    }
    if mfu is not None:
        out["mfu"] = round(mfu, 4)
    try:
        # secondary series for round-over-round continuity (r1/r2 headline).
        # A FRESH process per series: measuring a second model in the same
        # process reads ~9% slow (device-memory/compilation residue from the
        # first — measured 56.6 alone vs 51.5 in-process, round 3).
        import subprocess
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--series", "pixel"],
            capture_output=True, text=True, timeout=1200)
        if r.returncode == 0 and r.stdout.strip():
            parts = r.stdout.strip().split()[-2:]
            out["pixel_clips_per_sec"] = float(parts[0])
            if len(parts) > 1 and parts[1] != "nan":
                out["pixel_mfu"] = float(parts[1])
    except Exception:  # noqa: BLE001 — secondary series must not kill the run
        pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
