"""Microbench the t-sliced lane window-attention forward at the frozen
2D-Swin teacher's per-stage shapes, to localize the teacher's ~8ms of
Pallas attention time (round 4).

Each teacher stage runs `depth` blocks; half are shifted (has_mask=True).
Prints ms/call per (stage, masked) and the implied per-teacher-call total.

Run: python tools/tslicebench.py [--budget-env as usual]
"""
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

from empirical_mvm_tpu.ops.window_attention import (_lane_g,
                                                    lane_window_attention)

# teacher swin2d-base at batch 16, T=4, 224^2, t_fold=4:
# (B_, nh, c, n_windows(spatial), depth)
STAGES = {
    0: (1024, 4, 128, 64, 2),
    1: (256, 8, 256, 16, 2),
    2: (64, 16, 512, 4, 18),
    3: (16, 32, 1024, 1, 2),
}
F = 4
N = 49


def main():
    rs = np.random.RandomState(0)
    total = 0.0
    for stage, (b_, nh, c, nw, depth) in STAGES.items():
        x3 = jnp.asarray(rs.standard_normal((b_, F, N, 3 * c)) * 0.1,
                         jnp.bfloat16)
        bias = jnp.asarray(rs.standard_normal((nh, N, N)) * 0.1, jnp.float32)
        scale = (c // nh) ** -0.5
        for masked in ((False, True) if nw > 1 else (False,)):
            nwm = nw if masked else 1
            mask = jnp.asarray(
                np.where(rs.rand(nwm, N, N) > 0.9, -100.0, 0.0), jnp.float32)

            @jax.jit
            def run(x3, bias, mask, nwm=nwm, masked=masked, scale=scale,
                    nh=nh):
                return lane_window_attention(x3, bias, mask, nwm, nh,
                                             float(scale), False, masked,
                                             t_slices=F)

            out = run(x3, bias, mask)
            sync = jax.jit(lambda o: jnp.sum(o.astype(jnp.float32)))
            float(sync(out))
            # wall time through the axon tunnel is dispatch-bound (~2.2ms
            # floor); aggregate DEVICE time from a profiler trace instead
            import glob
            import gzip
            import json
            import shutil
            prof_dir = "/tmp/tslice_prof"
            shutil.rmtree(prof_dir, ignore_errors=True)
            iters = 10
            with jax.profiler.trace(prof_dir):
                for _ in range(iters):
                    out = run(x3, bias, mask)
                float(sync(out))
            path = sorted(glob.glob(os.path.join(
                prof_dir, "plugins/profile/*/*.trace.json.gz")),
                key=os.path.getmtime)[-1]
            with gzip.open(path, "rt") as f:
                ev = json.load(f)["traceEvents"]
            pids = {e["pid"] for e in ev if e.get("ph") == "M"
                    and e.get("name") == "process_name"
                    and "TPU" in e.get("args", {}).get("name", "")}
            import re
            dt = sum(e.get("dur", 0) for e in ev
                     if e.get("ph") == "X" and e.get("pid") in pids
                     and not re.match(r"^jit_|^\d+$", e.get("name", ""))
                     ) / 1e3 / iters
            g = _lane_g(b_, N, c, nh, nwm, backward=False)
            blocks = depth / 2  # half the blocks are shifted
            total += dt * blocks
            print(f"stage {stage} masked={int(masked)}: {dt:7.3f} ms  "
                  f"g={g} grid=({b_ // g}x{F})  x{blocks:.0f} blocks "
                  f"-> {dt * blocks:6.2f} ms")
    print(f"implied teacher attention total: {total:.2f} ms/call")


if __name__ == "__main__":
    main()
