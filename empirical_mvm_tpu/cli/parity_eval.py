"""One-command real-artifact parity check against the reference's published
retrieval numbers (BASELINE.md table 3; ref README results tables).

The day the released checkpoint + benchmark TSVs are mountable, this is the
single command that closes the loop (ref: eval_retrieval_tsv.py:32-92,
model.py:295-386):

  python -m empirical_mvm_tpu.cli.parity_eval \
      --config configs/msrvtt-retrieval.json \
      --path_ckpt ckpt_violet_msrvtt-retrieval.pt \
      [--tol 0.5] [--expected 36.3,64.9,75.5]

Flow: torch ``.pt`` (trainer-wrapped or raw; ``.msgpack`` also accepted)
-> lenient convert/import -> two-stage retrieval eval (encode all videos
multi-clip + all texts, cross-encode the cartesian product, rank) ->
R@1/5/10/MedR -> compare against the expected numbers within ``--tol`` pts.

Prints one JSON line with the metrics and a pass/fail verdict per metric;
exits nonzero when any metric misses the tolerance (so CI can gate on it).

Expected defaults come from BASELINE.md's "Repo" column for the config's
dataset (msrvtt / didemo / lsmdc); override with --expected for other
checkpoints.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys

import jax
import jax.numpy as jnp

# BASELINE.md table 3, "Repo reproduction" column (R@1/R@5/R@10)
BASELINE_T2V = {
    "msrvtt": (36.3, 64.9, 75.5),
    "didemo": (46.0, 74.1, 83.9),
    "lsmdc": (25.1, 44.2, 54.9),
}


def main():
    ap = argparse.ArgumentParser(
        description="Reference-checkpoint retrieval parity in one command")
    ap.add_argument("--config", required=True, help="task JSON config")
    ap.add_argument("--path_ckpt", required=True,
                    help="reference .pt (wrapped ok) or native .msgpack")
    ap.add_argument("--tol", type=float, default=0.5,
                    help="max |ours - expected| per metric, pts")
    ap.add_argument("--expected", default=None,
                    help="R@1,R@5,R@10 override; default from BASELINE.md "
                         "by dataset name")
    args, rest = ap.parse_known_args()

    from empirical_mvm_tpu.cli import common
    from empirical_mvm_tpu.core.config import load_run_config
    from empirical_mvm_tpu.data.datasets import RetrievalDataset
    from empirical_mvm_tpu.models.tasks import VioletRetrieval
    from empirical_mvm_tpu.train.evaluators import retrieval_two_stage_eval

    cfg = load_run_config(args.config)
    cfg = dataclasses.replace(cfg, path_ckpt=args.path_ckpt)
    cfg = common.adopt_ckpt_args(cfg)
    cfg = common.setup_run(cfg)
    tokzr = common.get_tokenizer(cfg)
    img_src, txt = common.tsv_sources(cfg)
    split = "test" if "test" in txt else "val"
    ds = RetrievalDataset(cfg, split, tokzr, img_src, txt[split])

    model = VioletRetrieval(config=cfg.model, dtype=jnp.bfloat16)
    t, s, x = cfg.model.size_frame, cfg.model.size_img, cfg.model.size_txt

    def init_fn():
        rng = jax.random.PRNGKey(cfg.train.seed)
        return jax.jit(lambda: model.init(
            rng, jnp.zeros((1, t, s, s, 3)), jnp.zeros((1, x), jnp.int32),
            jnp.ones((1, x), jnp.int32))["params"])()

    params = common.load_initial_params(cfg, model, init_fn,
                                        heads={"fc": "score_head"})
    metrics = retrieval_two_stage_eval(model, params, ds,
                                       progress=lambda m: print(m, flush=True))

    if args.expected:
        expected = tuple(float(v) for v in args.expected.split(","))
    else:
        ds_name = (cfg.data.dataset[0] if cfg.data.dataset
                   else cfg.task.split("-")[0])
        expected = BASELINE_T2V.get(ds_name)
    verdict = {}
    ok = True
    if expected is not None:
        for key, want in zip(("r1", "r5", "r10"), expected):
            got = float(metrics[key])
            hit = abs(got - want) <= args.tol
            verdict[key] = {"got": round(got, 2), "want": want, "ok": hit}
            ok = ok and hit
    print(json.dumps({"task": cfg.task, "split": split,
                      **{k: float(v) for k, v in metrics.items()},
                      "expected": expected, "tol": args.tol,
                      "verdict": verdict, "parity_ok": bool(ok)}))
    if expected is not None and not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
