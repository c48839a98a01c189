"""Text-to-video retrieval fine-tune CLI (ref: main_retrieval_tsv.py).

Usage:
  python -m empirical_mvm_tpu.cli.retrieval --config configs/msrvtt-retrieval.json
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from empirical_mvm_tpu.cli import common
from empirical_mvm_tpu.data.datasets import RetrievalDataset
from empirical_mvm_tpu.models.tasks import VioletRetrieval
from empirical_mvm_tpu.train.agent import RetrievalAgent
from empirical_mvm_tpu.train.evaluators import in_batch_retrieval_accuracy


def main():
    cfg = common.parse_cli(__doc__)
    cfg = common.setup_run(cfg)
    tokzr = common.get_tokenizer(cfg)
    img_src, txt = common.tsv_sources(cfg)

    splits = ["train", "val"] + (["test"] if "test" in txt else [])
    datasets = {s: RetrievalDataset(cfg, s, tokzr, img_src, txt[s])
                for s in splits}
    loaders = common.make_loaders(cfg, datasets)

    model = VioletRetrieval(config=cfg.model, dtype=jnp.bfloat16)
    b, t, s, x = (cfg.train.size_batch, cfg.model.size_frame,
                  cfg.model.size_img, cfg.model.size_txt)

    def init_fn():
        rng = jax.random.PRNGKey(cfg.train.seed)
        return jax.jit(lambda: model.init(
            rng, jnp.zeros((b, t, s, s, 3)), jnp.zeros((b, x), jnp.int32),
            jnp.ones((b, x), jnp.int32))["params"])()

    params = common.load_initial_params(cfg, model, init_fn,
                                        heads={"fc": "score_head"})
    max_iter = len(loaders["train"]) * cfg.train.size_epoch
    agent = RetrievalAgent(cfg, model, params, max_iter=max(max_iter, 1))

    def eval_fn(p, dl):
        accs = []
        for _, db, n_valid in agent.eval_batches(dl):
            scores = agent.eval_forward(p, db["img"], db["txt"], db["mask"])
            accs.append(in_batch_retrieval_accuracy(
                np.asarray(scores)[:n_valid, :n_valid]))
        from empirical_mvm_tpu.parallel.mesh import all_gather_metrics
        accs = all_gather_metrics(accs)
        return float(np.mean(accs)) if accs else 0.0

    if cfg.train.size_epoch > 0:
        agent.fit(loaders["train"], loaders.get("val"), loaders.get("test"),
                  eval_fn=eval_fn)
    else:
        for s in ("val", "test"):
            if loaders.get(s) is not None:
                print(s, eval_fn(agent.state.params, loaders[s]))


if __name__ == "__main__":
    main()
