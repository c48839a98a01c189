"""Profile the pretrain train step on the real TPU chip and print a per-op
time table (aggregated from the jax profiler trace).

The axon tunnel supports jax.profiler.trace (round-2 finding, memory notes):
parse ``plugins/profile/*/*.trace.json.gz`` traceEvents, keep the pid whose
process_name is the TPU device, and aggregate ``dur`` by op-name prefix.

Run: python tools/profstep.py [--batch 16] [--mvm pixel] [--steps 3]
     [--out /tmp/emvm_prof] [--top 40]
"""
import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

try:
    os.makedirs("/root/.cache/jax_comp", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_default_prng_impl",
                      os.environ.get("JAX_DEFAULT_PRNG_IMPL", "rbg"))
except Exception:
    pass


def classify(name: str) -> str:
    """Collapse an XLA/trace op name to a readable family."""
    n = name.lower()
    for pat, fam in [
        (r"pallas|custom-call.*mosaic|tpu_custom_call", "pallas_kernel"),
        (r"^fusion", "fusion"),
        (r"^loop_", "loop_fusion"),
        (r"^copy|copy\.", "copy"),
        (r"^transpose", "transpose"),
        (r"^reshape|bitcast", "reshape_bitcast"),
        (r"^convolution|conv", "convolution"),
        (r"^dot|gemm|matmul", "dot"),
        (r"^reduce", "reduce"),
        (r"^convert", "convert"),
        (r"^slice|dynamic-slice", "slice"),
        (r"^concatenate", "concat"),
        (r"^scatter", "scatter"),
        (r"^gather", "gather"),
        (r"^rng|prng", "rng"),
        (r"^select", "select"),
        (r"^broadcast", "broadcast"),
        (r"^add|^multiply|^subtract|^divide", "elementwise"),
        (r"infeed|outfeed|barrier", "infeed_outfeed"),
    ]:
        if re.search(pat, n):
            return fam
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--mvm", default="pixel")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", default="/tmp/emvm_prof")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    from tools.mvmbench import build
    step, state, batch = build(args.batch, args.mvm)
    rng = jax.random.PRNGKey(1)
    state, ls = step(state, batch, rng)
    jax.block_until_ready(ls)
    for _ in range(2):
        state, ls = step(state, batch, rng)
    jax.block_until_ready(ls)

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        for _ in range(args.steps):
            state, ls = step(state, batch, rng)
        jax.block_until_ready(ls)

    # newest trace dir
    cands = sorted(glob.glob(os.path.join(
        args.out, "plugins/profile/*/*.trace.json.gz")),
        key=os.path.getmtime)
    assert cands, f"no trace under {args.out}"
    path = cands[-1]
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    ev = trace["traceEvents"]

    # pids named like a TPU device
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in ev if e.get("ph") == "M"
                 and e.get("name") == "process_name" and "args" in e}
    tpu_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "tpu" in n}
    if not tpu_pids:
        print("process names:", pid_names, file=sys.stderr)
        raise SystemExit("no TPU pid in trace")

    by_name = collections.Counter()
    by_fam = collections.Counter()
    total = 0.0
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        name = e.get("name", "?")
        # skip container spans (whole-module / per-step tracks): they nest
        # the real op events and would double-count
        if re.match(r"^jit_|^\d+$", name):
            continue
        dur = e.get("dur", 0) / 1e3 / args.steps   # us -> ms, per step
        # collapse op instances: 'fusion.8925' -> 'fusion', 'attn.95' -> 'attn'
        by_name[re.sub(r"[.\d]+$", "", name) or name] += dur
        by_fam[classify(name)] += dur
        total += dur

    print(f"== per-step device time: {total:.1f} ms "
          f"({args.batch / (total / 1e3):.1f} clips/s upper bound), "
          f"mvm={args.mvm} batch={args.batch} ==")
    print("\n-- by family --")
    for fam, ms in by_fam.most_common():
        print(f"{fam:18s} {ms:8.2f} ms  {100 * ms / total:5.1f}%")
    print(f"\n-- top {args.top} ops --")
    for name, ms in by_name.most_common(args.top):
        print(f"{ms:8.2f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
