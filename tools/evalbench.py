"""Two-stage retrieval-eval throughput bench (VERDICT r4 task 2).

Times ``train/evaluators.py:retrieval_two_stage_eval`` at flagship MSRVTT
geometry (base swin, 224^2, 5-frame clips, 25-token texts, multi-clip
testing) on synthetic device-shaped inputs: stage 1 (encode every text and
video once) in items/s and stage 2 (cross-score the |T| x |V| cartesian
product, ref: eval_retrieval_tsv.py:47-92) in pairs/s, then extrapolates
the full 1000x1000 MSRVTT eval wall time. Use ``--sweep`` to tune
``encode_batch`` / ``chunk_size`` from data instead of folklore.

Run on the chip:
  python tools/evalbench.py [--n 128] [--clips 2] [--chunk 512]
                            [--encode-batch 32] [--sweep]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


class SynthRetrievalDataset:
    """multi_clip_item-compatible dataset; ONE shared clip buffer so host
    memory stays O(1) in n (the evaluator keeps every item in a list)."""

    def __init__(self, n: int, clips: int, t: int, s: int, x: int):
        rs = np.random.RandomState(0)
        self.img = rs.rand(clips, t, s, s, 3).astype(np.float32)
        self.txts = rs.randint(5, 20000, (n, x)).astype(np.int32)
        self.mask = np.ones((x,), np.int32)
        self.n = n
        self.gt_txt2vid = {f"t{i}": f"v{i}" for i in range(n)}

    def __len__(self):
        return self.n

    def multi_clip_item(self, i):
        return {"img": self.img, "txt": self.txts[i], "mask": self.mask,
                "vid": f"v{i}", "tid": f"t{i}"}


def run_once(model, params, ds, chunk, enc_bs):
    from empirical_mvm_tpu.train.evaluators import retrieval_two_stage_eval
    marks = {"t0": time.perf_counter(), "stage2_first": None,
             "stage1_last": None}

    def progress(msg):
        now = time.perf_counter()
        if msg.startswith("stage1"):
            marks["stage1_last"] = now
        elif marks["stage2_first"] is None:
            marks["stage2_first"] = now

    m = retrieval_two_stage_eval(model, params, ds, chunk_size=chunk,
                                 encode_batch=enc_bs, progress=progress)
    t_end = time.perf_counter()
    return {"metrics": m, "total": t_end - marks["t0"],
            "stage1": marks["stage1_last"] - marks["t0"],
            "stage2": t_end - marks["stage1_last"]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=128,
                    help="texts (= videos); MSRVTT full is 1000")
    ap.add_argument("--clips", type=int, default=2)
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--txt", type=int, default=25)
    ap.add_argument("--chunk", type=int, default=512)
    ap.add_argument("--encode-batch", type=int, default=32)
    ap.add_argument("--size-img", type=int, default=224)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny swin/bert (CPU smoke test, not a benchmark)")
    ap.add_argument("--sweep", action="store_true",
                    help="sweep encode_batch x chunk_size")
    args = ap.parse_args()

    from empirical_mvm_tpu.core.config import (BertConfig, ModelConfig,
                                               SwinConfig)
    from empirical_mvm_tpu.models.tasks import VioletRetrieval

    s = args.size_img
    if args.tiny:
        tb = BertConfig(vocab_size=20000, hidden_size=32,
                        num_hidden_layers=2, num_attention_heads=4,
                        intermediate_size=64)
        cfg = ModelConfig(size_img=s, size_frame=args.frames,
                          size_txt=args.txt, fusion=tb, text=tb,
                          swin_custom=SwinConfig(
                              embed_dim=8, depths=(1, 1, 1, 1),
                              num_heads=(1, 2, 4, 8), drop_path_rate=0.0))
    else:
        cfg = ModelConfig(vis_backbone_size="base", size_img=s,
                          size_frame=args.frames, size_txt=args.txt)
    model = VioletRetrieval(config=cfg, dtype=jnp.bfloat16)
    ds = SynthRetrievalDataset(args.n, args.clips, args.frames, s, args.txt)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(lambda: model.init(
        rng, jnp.zeros((1, args.frames, s, s, 3)),
        jnp.zeros((1, args.txt), jnp.int32),
        jnp.ones((1, args.txt), jnp.int32))["params"])()

    combos = ([(eb, ck) for eb in (16, 32, 64) for ck in (256, 512, 1024)]
              if args.sweep else [(args.encode_batch, args.chunk)])
    n_pairs = args.n * args.n
    for eb, ck in combos:
        # warm run compiles both stages; the second run is the measurement
        run_once(model, params, ds, ck, eb)
        r = run_once(model, params, ds, ck, eb)
        full = 1000 / (args.n / r["stage1"]) + 1e6 / (n_pairs / r["stage2"])
        print(f"encode_batch={eb:3d} chunk={ck:5d}  "
              f"stage1 {args.n / r['stage1']:7.2f} items/s  "
              f"stage2 {n_pairs / r['stage2']:8.1f} pairs/s  "
              f"total {r['total']:.1f}s  "
              f"-> full MSRVTT 1000x1000 ~ {full / 60:.1f} min",
              flush=True)


if __name__ == "__main__":
    main()
