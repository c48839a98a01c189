"""Two-stage retrieval benchmark eval CLI (ref: eval_retrieval_tsv.py).

Produces the MSRVTT/DiDeMo/LSMDC R@1/5/10/MedR numbers from BASELINE.md.

Usage:
  python -m empirical_mvm_tpu.cli.retrieval_eval \
      --config configs/msrvtt-retrieval.json --path_ckpt ckpt.msgpack
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp

from empirical_mvm_tpu.cli import common
from empirical_mvm_tpu.data.datasets import RetrievalDataset
from empirical_mvm_tpu.models.tasks import VioletRetrieval
from empirical_mvm_tpu.train.evaluators import retrieval_two_stage_eval


def main():
    cfg = common.parse_cli(__doc__)
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
    print(json.dumps({"task": cfg.task, "split": split, **metrics}))


if __name__ == "__main__":
    main()
