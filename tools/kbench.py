"""Micro-benchmark: fused window-attention kernel across the swin-base
stage shapes (batch 16, T=4, 224^2 -> window (4,7,7), N=196).

Times fwd and grad of the Pallas kernel vs the XLA reference path, weighted
by stage depth (2,2,18,2), and prints a per-stage table. Run on the real
TPU chip:

    python tools/kbench.py [--impl pallas|xla] [--grad]
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

# (B_ per clip-batch-16, nH, N, hd, nW, depth)
STAGES = [
    ("s0", 1024, 4, 196, 32, 64, 2),
    ("s1", 256, 8, 196, 32, 16, 2),
    ("s2", 64, 16, 196, 32, 4, 18),
    ("s3", 16, 32, 196, 32, 1, 2),
]


def make_args(b_, nh, n, hd, nw, dtype=jnp.bfloat16, seed=0):
    rs = np.random.RandomState(seed)
    q = jnp.asarray(rs.randn(b_, nh, n, hd), dtype)
    k = jnp.asarray(rs.randn(b_, nh, n, hd), dtype)
    v = jnp.asarray(rs.randn(b_, nh, n, hd), dtype)
    bias = jnp.asarray(rs.randn(nh, n, n).astype(np.float32) * 0.02)
    mask = jnp.asarray(
        (rs.rand(nw, n, n) > 0.9).astype(np.float32) * -100.0)
    return q, k, v, bias, mask


def timeit(f, *args, n_meas=60):
    """Per-iteration device time: N dependent iterations inside ONE jitted
    fori_loop (a single dispatch — the axon tunnel adds ~ms per call, which
    would otherwise swamp sub-ms kernels)."""
    @jax.jit
    def run(q, *rest):
        def body(_, q):
            return f(q, *rest).astype(q.dtype)
        return jax.lax.fori_loop(0, n_meas, body, q)

    o = run(*args)                      # compile + warm
    jax.block_until_ready(o)
    # measure with DIFFERENT data than the warmup: identical remote calls
    # can be served from a result cache by the axon tunnel
    q2 = (args[0] + jnp.asarray(1, args[0].dtype)).block_until_ready()
    t0 = time.perf_counter()
    o = run(q2, *args[1:])
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / n_meas


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="pallas", choices=["pallas", "xla"])
    ap.add_argument("--fwd-only", action="store_true")
    args = ap.parse_args()

    from empirical_mvm_tpu.ops.window_attention import (
        fused_window_attention, window_attention_reference)

    total_f, total_g = 0.0, 0.0
    print(f"impl={args.impl}  backend={jax.default_backend()}")
    for name, b_, nh, n, hd, nw, depth in STAGES:
        q, k, v, bias, mask = make_args(b_, nh, n, hd, nw)
        scale = hd ** -0.5
        if args.impl == "pallas":
            f = jax.jit(functools.partial(
                fused_window_attention, n_windows=nw, scale=scale))
        else:
            f = jax.jit(functools.partial(
                window_attention_reference, n_windows=nw, scale=scale))
        tf = timeit(f, q, k, v, bias, mask)

        tg = float("nan")
        if not args.fwd_only:
            def loss(q, k, v, bias):
                o = (fused_window_attention(q, k, v, bias, mask, nw, scale)
                     if args.impl == "pallas" else
                     window_attention_reference(q, k, v, bias, mask, nw,
                                                scale))
                return jnp.sum(o.astype(jnp.float32) ** 2)
            g = jax.grad(loss, argnums=(0, 1, 2, 3))
            tg = timeit(lambda *a: g(*a)[0], q, k, v, bias)

        # useful attention flops: 2 matmuls fwd, +5 bwd (recompute style)
        gf = 2 * 2 * b_ * nh * n * n * hd / 1e9
        print(f"{name}: fwd {tf*1e3:8.3f} ms ({gf/tf/1e3:6.1f} TF/s)   "
              f"grad {tg*1e3:8.3f} ms   x{depth}")
        total_f += depth * tf
        total_g += depth * (tg if tg == tg else 0.0)
    print(f"depth-weighted totals: fwd {total_f*1e3:.1f} ms   "
          f"grad {total_g*1e3:.1f} ms")


if __name__ == "__main__":
    main()
