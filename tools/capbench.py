"""Caption-generation throughput bench (VERDICT r3 item 10).

Measures captions/s of the autoregressive decoder at flagship geometry.
``--mode full`` is the full re-encode scan (the reference's asymptotics,
ref: model_for_captioning.py:239-310; its KV-cache path was never finished,
:102,215); ``--mode cached`` is the round-5 KV-cached decoder (video K/V
computed once, two-token steps); ``--mode compare`` runs both, asserts the
greedy outputs are IDENTICAL, and prints the speedup.

Run on the chip:
  python tools/capbench.py [--batch 8] [--max-len 20] [--decode greedy]
                           [--mode compare]
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
    jax.config.update("jax_default_prng_impl",
                      os.environ.get("JAX_DEFAULT_PRNG_IMPL", "rbg"))
except Exception:  # noqa: BLE001
    pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--max-len", type=int, default=20)
    ap.add_argument("--decode", default="greedy")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--mode", default="compare",
                    choices=["full", "cached", "compare"])
    args = ap.parse_args()

    from empirical_mvm_tpu.core.config import ModelConfig
    from empirical_mvm_tpu.models.captioning import VioletCaptioning

    # flagship geometry: VIOLETv2-base video swin + BERT fusion, 4x224^2
    cfg = ModelConfig(vis_backbone_size="base", size_img=224, size_frame=4,
                      size_txt=args.max_len)
    model = VioletCaptioning(config=cfg, dtype=jnp.bfloat16)
    b, t, s = args.batch, cfg.size_frame, cfg.size_img
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(b, t, s, s, 3).astype(np.float32))

    rng = jax.random.PRNGKey(0)
    params = jax.jit(lambda: model.init(
        {"params": rng, "dropout": rng},
        img, jnp.zeros((b, args.max_len), jnp.int32),
        jnp.ones((b, args.max_len), jnp.int32))["params"])()

    def make_gen(use_cache: bool):
        return jax.jit(lambda p, im: model.apply(
            {"params": p}, im, max_len=args.max_len, decode=args.decode,
            use_cache=use_cache, method=model.generate))

    def timed(gen):
        out = gen(params, img)
        # host readback sync (block_until_ready unreliable thru the tunnel)
        int(np.asarray(out).sum())
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = gen(params, img)
        toks = np.asarray(out)
        dt = (time.perf_counter() - t0) / args.iters
        return dt, toks

    results = {}
    modes = (["full", "cached"] if args.mode == "compare" else [args.mode])
    for mode in modes:
        dt, toks = timed(make_gen(use_cache=(mode == "cached")))
        results[mode] = (dt, toks)
        print(f"caption generation [{mode}]: batch={args.batch} "
              f"max_len={args.max_len} decode={args.decode}  "
              f"{dt * 1e3:.1f} ms/batch  {args.batch / dt:.2f} captions/s  "
              f"{args.batch * (args.max_len - 1) / dt:.1f} tokens/s")
    if args.mode == "compare":
        dt_f, toks_f = results["full"]
        dt_c, toks_c = results["cached"]
        if args.decode == "greedy":
            assert (toks_f == toks_c).all(), \
                "cached decoder diverged from the full re-encode"
            print("greedy outputs identical: OK")
        print(f"speedup: {dt_f / dt_c:.2f}x")


if __name__ == "__main__":
    main()
