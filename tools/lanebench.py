"""Microbench: window attention consuming the qkv GEMM output DIRECTLY.

Round-3 experiment (VERDICT r2 item 1b): the packed-qkv path spends
~20ms/step on XLA layout copies transposing (B_, N, 3nH, hd) -> (B_, 3nH,
N, hd) (trace: copy.8874/8884 at 1.83ms each, x~10 instances incl remat).
The Mosaic BlockSpec rule that killed a zero-copy variant in round 2 was
"block minor dims must be 128-divisible or whole" — but the C-SEGMENTS of
the (B_, N, 3C) GEMM output ARE 128-divisible at every swin stage (C in
{128, 256, 512, 1024}) and in BERT (768). So: block q/k/v as (g, N, C)
lane-segments of the same array and split the hd=32 heads INSIDE the
kernel with static lane slices. This file measures whether Mosaic handles
those 32-lane in-kernel slices well enough to beat transpose+packed.

Run on the chip:  python tools/lanebench.py [--stage 0|2]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

try:
    os.makedirs("/root/.cache/jax_comp", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def _lane_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref, *,
                 scale, nh):
    qa = q_ref[...]                                  # (G, N, C)
    ka = k_ref[...]
    va = v_ref[...]
    g, n, c = qa.shape
    hd = c // nh
    m = mask_ref[...]                                # (G or 1, N, N)
    outs = []
    for h in range(nh):
        q = jax.lax.slice_in_dim(qa, h * hd, (h + 1) * hd, axis=2)
        k = jax.lax.slice_in_dim(ka, h * hd, (h + 1) * hd, axis=2)
        v = jax.lax.slice_in_dim(va, h * hd, (h + 1) * hd, axis=2)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale      # (G, N, N)
        s = s + bias_ref[h][None]
        s = s + (m if m.shape[0] == g else
                 jnp.broadcast_to(m[0][None], s.shape))
        p = jax.nn.softmax(s, axis=-1).astype(va.dtype)
        o = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)              # (G, N, hd)
        outs.append(o.astype(o_ref.dtype))
    o_ref[...] = jnp.concatenate(outs, axis=-1)


def lane_attention(x3, bias, mask, nh, scale, g):
    """x3: (B_, N, 3C) qkv GEMM output; returns (B_, N, C)."""
    b_, n, c3 = x3.shape
    c = c3 // 3
    seg = lambda s: pl.BlockSpec((g, n, c), lambda b, s=s: (b, 0, s),
                                 memory_space=pltpu.VMEM)
    nw = mask.shape[0]
    if nw > 1:
        mask_spec = pl.BlockSpec((g, n, n), lambda b: (b % (nw // g), 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        mask_spec = pl.BlockSpec((1, n, n), lambda b: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((nh, n, n), lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_lane_kernel, scale=scale, nh=nh),
        grid=(b_ // g,),
        in_specs=[seg(0), seg(1), seg(2), bias_spec, mask_spec],
        out_specs=pl.BlockSpec((g, n, c), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_, n, c), x3.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b_ * n * n * c,
            bytes_accessed=4 * b_ * n * c * x3.dtype.itemsize,
            transcendentals=b_ * nh * n * n),
    )(x3, x3, x3, bias, mask)


def packed_path(x3, bias, mask, nh, scale):
    from empirical_mvm_tpu.ops.window_attention import packed_window_attention
    b_, n, c3 = x3.shape
    c = c3 // 3
    hd = c // nh
    qkv = x3.reshape(b_, n, 3 * nh, hd).transpose(0, 2, 1, 3)
    o = packed_window_attention(qkv, bias, mask, mask.shape[0], nh,
                                scale, False)
    return o.transpose(0, 2, 1, 3).reshape(b_, n, c)


def oracle(x3, bias, mask, nh, scale):
    b_, n, c3 = x3.shape
    c = c3 // 3
    hd = c // nh
    qkv = x3.reshape(b_, n, 3, nh, hd).astype(jnp.float32)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]   # (B_, N, nH, hd)
    s = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k) + bias[None]
    nw = mask.shape[0]
    s = s.reshape(b_ // nw, nw, nh, n, n) + mask[None, :, None]
    p = jax.nn.softmax(s.reshape(b_, nh, n, n), axis=-1)
    o = jnp.einsum("bhnm,bmhd->bnhd", p, v)
    return o.reshape(b_, n, c)


def bench(fn, *args, iters=30):
    f = jax.jit(fn)
    o = f(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=2)
    ap.add_argument("--grad", action="store_true",
                    help="also compile+time the lane bwd at each stage")
    args = ap.parse_args()
    shapes = {
        0: dict(b_=1024, n=196, c=128, nh=4, nw=64, g=16),
        1: dict(b_=256, n=196, c=256, nh=8, nw=16, g=16),
        2: dict(b_=64, n=196, c=512, nh=16, nw=4, g=4),
    }
    for stage, sh in shapes.items():
        if args.stage >= 0 and stage != args.stage:
            continue
        b_, n, c, nh, nw, g = (sh["b_"], sh["n"], sh["c"], sh["nh"],
                               sh["nw"], sh["g"])
        rs = np.random.RandomState(0)
        x3 = jnp.asarray(rs.randn(b_, n, 3 * c).astype(np.float32) * 0.1,
                         jnp.bfloat16)
        bias = jnp.asarray(rs.randn(nh, n, n).astype(np.float32) * 0.1)
        mask = jnp.zeros((nw, n, n), jnp.float32)
        scale = (c // nh) ** -0.5

        ol = oracle(x3, bias, mask, nh, scale)
        la = jax.jit(lambda *a: lane_attention(*a, nh, scale, g))(
            x3, bias, mask)
        pk = jax.jit(lambda *a: packed_path(*a, nh, scale))(x3, bias, mask)
        err_l = float(jnp.max(jnp.abs(la.astype(jnp.float32) - ol)))
        err_p = float(jnp.max(jnp.abs(pk.astype(jnp.float32) - ol)))
        t_l = bench(lambda *a: lane_attention(*a, nh, scale, g),
                    x3, bias, mask)
        t_p = bench(lambda *a: packed_path(*a, nh, scale), x3, bias, mask)
        print(f"stage{stage} B_={b_} N={n} C={c} nH={nh}: "
              f"lane {t_l:.3f} ms (err {err_l:.2e})  "
              f"transpose+packed {t_p:.3f} ms (err {err_p:.2e})")
        if args.grad:
            from empirical_mvm_tpu.ops.window_attention import (
                lane_window_attention)

            def loss_lane(x3, bias):
                o = lane_window_attention(x3, bias, mask, nw, nh, scale,
                                          False)
                return jnp.sum(o.astype(jnp.float32) ** 2)

            def loss_pk(x3, bias):
                o = packed_path(x3, bias, mask, nh, scale)
                return jnp.sum(o.astype(jnp.float32) ** 2)

            gl = bench(jax.grad(loss_lane, argnums=(0, 1)), x3, bias)
            gp = bench(jax.grad(loss_pk, argnums=(0, 1)), x3, bias)
            print(f"  grad: lane {gl:.3f} ms  transpose+packed {gp:.3f} ms")


if __name__ == "__main__":
    main()
