"""On-chip sweep: lane window-attention time vs EMVM_LANE_BUDGET_MB.

Round-3f experiment: the measured kernel cost law (BENCH_LOCAL_r3) is
~per-program issue overhead x (B_/g); g was capped by a 10MB budget
because Mosaic's DEFAULT scoped-VMEM limit is 16MB. With
pltpu.CompilerParams(vmem_limit_bytes=...) raising that ceiling toward
v5e's 128MB of physical VMEM, larger budgets should cut program count
and kernel time. Run one budget per process:

  EMVM_LANE_BUDGET_MB=32 python tools/vmemsweep.py --stage 0
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from empirical_mvm_tpu.ops import window_attention as wa

# flagship shapes at batch 16, 4x224^2: (B_, N, C, nh, n_windows)
STAGES = {
    0: (1024, 196, 128, 4, 64),
    1: (256, 196, 256, 8, 16),
    2: (64, 196, 512, 16, 4),
    3: (16, 196, 1024, 32, 1),
    "bert": (16, 232, 768, 12, 0),   # self-attention shape (B, L, C, nh)
}


def bench(fn, args, iters=30):
    out = fn(*args)
    # host-readback sync for warmup too: block_until_ready does not reliably
    # block through the axon tunnel (BENCH_LOCAL_r2 notes), so a plain block
    # lets warmup bleed into the timed window
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    # force a host readback: block_until_ready does not reliably block
    # through the axon tunnel for dispatch chains (BENCH_LOCAL_r2 notes)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3


def run_stage(key, iters):
    budget = os.environ.get("EMVM_LANE_BUDGET_MB", "10")
    vlim = os.environ.get("EMVM_VMEM_LIMIT_MB", "96")

    rng = np.random.default_rng(0)
    if key == "bert":
        b, n, c, nh, _ = STAGES[key]
        x3 = jnp.asarray(rng.standard_normal((b, n, 3 * c)), jnp.bfloat16)
        mask = jnp.zeros((b, n, n), jnp.float32)
        seed = jnp.zeros((1,), jnp.uint32)
        scale = (c // nh) ** -0.5
        gf = wa._lane_sa_g(b, n, c, nh, 0.0, backward=False)
        gb = wa._lane_sa_g(b, n, c, nh, 0.0, backward=True)
        f = jax.jit(lambda x: wa.lane_self_attention(x, mask, seed, nh,
                                                     scale, 0.0))
        fb = jax.jit(jax.grad(lambda x: wa.lane_self_attention(
            x, mask, seed, nh, scale, 0.0).astype(jnp.float32).sum()))
        tf = bench(f, (x3,), iters)
        tb = bench(fb, (x3,), iters)
        print(f"bert budget={budget}MB vlim={vlim}MB g_fwd={gf} g_bwd={gb} "
              f"fwd={tf:.3f}ms fwd+bwd={tb:.3f}ms", flush=True)
        return

    b_, n, c, nh, nw = STAGES[key]
    hd = c // nh
    scale = hd ** -0.5
    x3 = jnp.asarray(rng.standard_normal((b_, n, 3 * c)), jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((nh, n, n)), jnp.float32)
    mask = jnp.asarray(rng.standard_normal((max(nw, 1), n, n)), jnp.float32)
    fits = wa.lane_attention_fits(b_, n, c, nh, nw)
    gf = wa._lane_g(b_, n, c, nh, nw, backward=False)
    gb = wa._lane_g(b_, n, c, nh, nw, backward=True)
    f = jax.jit(functools.partial(wa.lane_window_attention,
                                  n_windows=max(nw, 1), n_heads=nh,
                                  scale=scale))
    fb = jax.jit(jax.grad(lambda x, bi, m: wa.lane_window_attention(
        x, bi, m, max(nw, 1), nh, scale).astype(jnp.float32).sum()))
    tf = bench(f, (x3, bias, mask), iters)
    tb = bench(fb, (x3, bias, mask), iters)
    print(f"stage{key} budget={budget}MB vlim={vlim}MB fits={fits} "
          f"g_fwd={gf} g_bwd={gb} fwd={tf:.3f}ms fwd+bwd={tb:.3f}ms",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="0")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    keys = ([0, 1, 2, 3, "bert"] if args.stage == "all"
            else [args.stage if args.stage == "bert" else int(args.stage)])
    n_failed = 0
    for key in keys:
        try:
            run_stage(key, args.iters)
        except Exception as e:  # noqa: BLE001 — report and keep sweeping
            n_failed += 1
            print(f"stage{key} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
    if n_failed:   # scripted sweeps must see stage failures in the exit code
        sys.exit(1)


if __name__ == "__main__":
    main()
