"""Microbench: 5D-direct window attention vs partition + lane + reverse.

Round-5 probe (VERDICT r5 task 4, "5D-direct window kernel"): the lane
kernel consumes pre-partitioned (B_, N, 3C) windows, so every swin block
pays window_partition + window_reverse HBM round-trips around the
attention call. direct_window_attention reads the qkv GEMM output in its
native (B, D, Hp, Wp, 3C) layout — one h-strip of windows per program,
in-VMEM window stacking — and writes the 5D output directly.

This tool measures both forms at the flagship student stage shapes
(batch 16, T=4, 224^2: windows (4,7,7), N=196) for the forward and for
a full fwd+bwd through a scalar loss, so the e2e bench delta can be
attributed. The math is parity-tested in
tests/test_window_attention_kernel.py (direct-vs-reference).

Run on the chip:  python tools/directbench.py [--stage 0|1|2|3] [--iters 30]
"""
import argparse
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

from empirical_mvm_tpu.models.video_swin import (window_partition,
                                                 window_reverse,
                                                 _shift_attn_mask)
from empirical_mvm_tpu.ops.window_attention import (
    direct_window_attention, direct_attention_fits, lane_window_attention)

# flagship student stages: (Hp, Wp, C, nH) at T=4, 224^2, window (4,7,7)
STAGES = {0: (56, 56, 128, 4), 1: (28, 28, 256, 8),
          2: (14, 14, 512, 16), 3: (7, 7, 1024, 32)}
B, D, WIN = 16, 4, (4, 7, 7)


def timed(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=None)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--shifted", action="store_true",
                    help="bench the shifted (masked) block form")
    args = ap.parse_args()
    stages = [args.stage] if args.stage is not None else [0, 1, 2, 3]
    wd, wh, ww = WIN
    n = wd * wh * ww
    interp = jax.default_backend() != "tpu"
    for st in stages:
        hp, wp, c, nh = STAGES[st]
        nw = (hp // wh) * (wp // ww)
        has_mask = args.shifted and nw > 1
        rs = np.random.RandomState(st)
        x3 = jnp.asarray(rs.rand(B, D, hp, wp, 3 * c).astype(np.float32),
                         jnp.bfloat16)
        bias = jnp.asarray(rs.rand(nh, n, n).astype(np.float32))
        if has_mask:
            mask = jnp.asarray(_shift_attn_mask((D, hp, wp), WIN, (0, 3, 3)))
        else:
            mask = jnp.zeros((max(nw, 1), n, n), jnp.float32)
        scale = (c // nh) ** -0.5
        assert direct_attention_fits(B, D, hp, wp, c, nh, WIN), st

        @jax.jit
        def lane_form(x3):
            xw = window_partition(x3, WIN)            # (B*nW, N, 3C)
            o = lane_window_attention(xw, bias, mask, max(nw, 1), nh,
                                      scale, interp, has_mask)
            return window_reverse(o, WIN, B, D, hp, wp)

        @jax.jit
        def direct_form(x3):
            return direct_window_attention(x3, bias, mask, WIN, nh,
                                           scale, interp, has_mask)

        o1, o2 = lane_form(x3), direct_form(x3)
        err = float(jnp.max(jnp.abs(o1.astype(jnp.float32)
                                    - o2.astype(jnp.float32))))
        t_lane = timed(lane_form, x3, iters=args.iters)
        t_dir = timed(direct_form, x3, iters=args.iters)

        @jax.jit
        def lane_grad(x3):
            return jax.grad(lambda a: jnp.sum(
                lane_form.__wrapped__(a).astype(jnp.float32) ** 2))(x3)

        @jax.jit
        def direct_grad(x3):
            return jax.grad(lambda a: jnp.sum(
                direct_form.__wrapped__(a).astype(jnp.float32) ** 2))(x3)

        tg_lane = timed(lane_grad, x3, iters=max(args.iters // 3, 5))
        tg_dir = timed(direct_grad, x3, iters=max(args.iters // 3, 5))
        print(f"stage {st} ({hp}x{wp} C={c} nH={nh} nW={nw}"
              f"{' shifted' if has_mask else ''}): "
              f"fwd lane {t_lane:.2f}ms direct {t_dir:.2f}ms | "
              f"fwd+bwd lane {tg_lane:.2f}ms direct {tg_dir:.2f}ms | "
              f"max|diff| {err:.2e}")


if __name__ == "__main__":
    main()
