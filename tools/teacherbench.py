"""Profile the frozen 2D-Swin feature teacher alone on the real chip.

The 2d_feature flagship carries a frozen Swin-base forward over (B, T,
224, 224, 3); its XLA-cost-analysis roofline is ~7-9 ms at batch 16 on
this v5e, but the round-3 step-time diff against the pixel series says it
costs ~40 ms in situ. This tool jits EXACTLY the teacher forward the
pretrain step runs (same config, dtype, stop_gradient) and prints timing +
the per-family profile, so teacher work is separated from student work.

Run: python tools/teacherbench.py [--batch 16] [--frames 4] [--profile]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--out", default="/tmp/emvm_teacher_prof")
    args = ap.parse_args()

    import dataclasses as dc

    from empirical_mvm_tpu.models.encoders2d import swin2d_config
    from empirical_mvm_tpu.models.video_swin import SwinTransformer3D

    cfg = dc.replace(swin2d_config("base"), use_pallas_layernorm=True)
    model = SwinTransformer3D(config=cfg, dtype=jnp.bfloat16)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(args.batch, args.frames, args.size, args.size,
                            3).astype(np.float32))
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x,
                                        deterministic=True)["params"])()

    @jax.jit
    def fwd(p, x):
        return jax.lax.stop_gradient(
            model.apply({"params": p}, x, deterministic=True))

    out = fwd(params, x)
    jax.block_until_ready(out)
    try:
        ca = fwd.lower(params, x).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        gf = float(ca.get("flops", 0.0)) / 1e9
        print(f"cost-analysis FLOPs: {gf:.1f} GF "
              f"(roofline {gf / 138e3 * 1e3:.2f} ms at 138 TFLOP/s)")
    except Exception as e:  # noqa: BLE001
        print("cost analysis unavailable:", e)

    # host-readback sync: block_until_ready does not reliably block through
    # the axon tunnel (ADVICE r3); a scalar device->host read does
    sync = jax.jit(lambda o: jnp.sum(o.astype(jnp.float32)))
    for _ in range(3):
        out = fwd(params, x)
    float(sync(out))
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        out = fwd(params, x)
    float(sync(out))
    dt = (time.perf_counter() - t0) / n
    print(f"teacher fwd: {dt * 1e3:.2f} ms/call  "
          f"({args.batch / dt:.1f} clips/s bound)  out={out.shape}")

    if args.profile:
        os.makedirs(args.out, exist_ok=True)
        with jax.profiler.trace(args.out):
            for _ in range(5):
                out = fwd(params, x)
            jax.block_until_ready(out)
        # reuse profstep's aggregation
        from tools.profstep import classify
        import collections
        import glob
        import gzip
        import json
        import re
        cands = sorted(glob.glob(os.path.join(
            args.out, "plugins/profile/*/*.trace.json.gz")),
            key=os.path.getmtime)
        with gzip.open(cands[-1], "rt") as f:
            ev = json.load(f)["traceEvents"]
        pid_names = {e["pid"]: e["args"].get("name", "")
                     for e in ev if e.get("ph") == "M"
                     and e.get("name") == "process_name" and "args" in e}
        tpu_pids = {p for p, nme in pid_names.items() if "TPU" in nme}
        by_name = collections.Counter()
        by_fam = collections.Counter()
        total = 0.0
        for e in ev:
            if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
                continue
            name = e.get("name", "?")
            if re.match(r"^jit_|^\d+$", name):
                continue
            dur = e.get("dur", 0) / 1e3 / 5
            by_name[re.sub(r"[.\d]+$", "", name) or name] += dur
            by_fam[classify(name)] += dur
            total += dur
        print(f"\n== device time {total:.2f} ms/call ==")
        for fam, ms in by_fam.most_common():
            print(f"{fam:18s} {ms:7.2f} ms  {100 * ms / total:5.1f}%")
        print("-- top 25 --")
        for name, ms in by_name.most_common(25):
            print(f"{ms:7.3f} ms  {name[:100]}")


if __name__ == "__main__":
    main()
