"""QA fine-tune CLIs: multiple-choice (score-head and generative MLM-head)
and open-ended (vocab-head and MLM-head).

Mirrors the reference entry scripts:
  qamc      -> main_qamc_tsv.py            (score head)
  qamc-gen  -> main_qamc_tsv_mlm_gen_ans_idx.py  (README TGIF path)
  qaoe      -> main_qaoe_tsv.py            (answer-vocab head)
  qaoe-mlm  -> main_qaoe_tsv_mlm_head.py   (MSRVTT/MSVD-QA path)
  qaoe-fib  -> main_qaoe_tsv_lsmdc_fib.py  (LSMDC fill-in-blank)

Usage:
  python -m empirical_mvm_tpu.cli.qa --mode qamc-gen --config configs/tgif-action.json
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from empirical_mvm_tpu.cli import common
from empirical_mvm_tpu.data.datasets import (QAMCDataset, QAMCGenDataset,
                                             QAMCMLMDataset, QAOEDataset,
                                             QAOEMLMDataset)
from empirical_mvm_tpu.models.tasks import (VioletQAMC, VioletQAMCGen,
                                            VioletQAMCMLMHead, VioletQAOE,
                                            VioletQAOEMLMHead,
                                            qamc_mlm_head_accuracy)
from empirical_mvm_tpu.train.agent import (QAMCAgent, QAMCGenAgent, QAOEAgent,
                                           QAOEMLMAgent)
from empirical_mvm_tpu.train.evaluators import (qamc_accuracy,
                                                qamc_gen_accuracy,
                                                qaoe_mlm_topk)


def build(mode: str, cfg, tokzr, img_src, txt):
    splits = ["train", "val"] + (["test"] if "test" in txt else [])
    mk = {
        "qamc": (QAMCDataset, VioletQAMC, QAMCAgent, {"fc": "score_head"}),
        "qamc-gen": (QAMCGenDataset, VioletQAMCGen, QAMCGenAgent,
                     {"fc_mtm": "mlm_head"}),
        "qamc-mlm": (QAMCMLMDataset, VioletQAMCMLMHead, QAMCGenAgent,
                     {"fc_mtm": "mlm_head"}),
        "qaoe": (QAOEDataset, VioletQAOE, QAOEAgent, {"fc": "score_head"}),
        "qaoe-mlm": (QAOEMLMDataset, VioletQAOEMLMHead, QAOEMLMAgent,
                     {"fc_mtm": "mlm_head"}),
        "qaoe-fib": (QAOEMLMDataset, VioletQAOEMLMHead, QAOEMLMAgent,
                     {"fc_mtm": "mlm_head"}),
    }[mode]
    ds_cls, model_cls, agent_cls, heads = mk
    datasets = {}
    for s in splits:
        if mode == "qaoe":
            datasets[s] = ds_cls(cfg, s, tokzr, img_src, txt[s],
                                 txt.get("ans2label", {}))
        elif mode in ("qaoe-mlm", "qaoe-fib"):
            datasets[s] = ds_cls(cfg, s, tokzr, img_src, txt[s],
                                 fib=(mode == "qaoe-fib"))
        else:
            datasets[s] = ds_cls(cfg, s, tokzr, img_src, txt[s])
    model_kwargs = {}
    if mode == "qaoe":
        model_kwargs["size_vocab"] = cfg.model.size_vocab
    if mode in ("qaoe-mlm", "qaoe-fib") and cfg.model.enable_prompt:
        # fixed-per-run prompt prefix, baked in as a static constant
        # (ref: main_qaoe_lsmdc_fib.py:135 batch["prompt"] = get_prompt())
        p_txt, p_mask = datasets["train"].get_prompt()
        model_kwargs["prompt_tokens"] = tuple(int(i) for i in p_txt)
        model_kwargs["prompt_mask_static"] = tuple(int(i) for i in p_mask)
    model = model_cls(config=cfg.model, dtype=jnp.bfloat16, **model_kwargs)
    return datasets, model, agent_cls, heads


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", required=True,
                    choices=["qamc", "qamc-gen", "qamc-mlm", "qaoe",
                             "qaoe-mlm", "qaoe-fib"])
    ap.add_argument("--config", required=True)
    ap.add_argument("--path_ckpt", default=None)
    args, rest = ap.parse_known_args()
    import sys
    sys.argv = [sys.argv[0], "--config", args.config] + (
        ["--path_ckpt", args.path_ckpt] if args.path_ckpt else [])
    cfg = common.parse_cli("qa")
    cfg = common.setup_run(cfg)
    tokzr = common.get_tokenizer(cfg)
    img_src, txt = common.tsv_sources(cfg)

    datasets, model, agent_cls, heads = build(args.mode, cfg, tokzr, img_src,
                                              txt)
    loaders = common.make_loaders(cfg, datasets)

    b, t, s, x = (cfg.train.size_batch, cfg.model.size_frame,
                  cfg.model.size_img, cfg.model.size_txt)
    o = cfg.model.size_option

    def init_fn():
        rng = jax.random.PRNGKey(cfg.train.seed)
        if args.mode in ("qamc", "qamc-mlm"):
            txt_shape, mask_shape = (b, o, x), (b, o, x)
        else:
            txt_shape, mask_shape = (b, x), (b, x)
        return jax.jit(lambda: model.init(
            rng, jnp.zeros((b, t, s, s, 3)),
            jnp.zeros(txt_shape, jnp.int32),
            jnp.ones(mask_shape, jnp.int32))["params"])()

    params = common.load_initial_params(cfg, model, init_fn, heads=heads)
    max_iter = len(loaders["train"]) * cfg.train.size_epoch
    agent = agent_cls(cfg, model, params, max_iter=max(max_iter, 1))

    def eval_fn(p, dl):
        accs = []
        for batch, db, n_valid in agent.eval_batches(dl):
            out = np.asarray(agent.eval_forward(p, db["img"], db["txt"],
                                                db["mask"]))[:n_valid]
            if args.mode == "qamc":
                accs.append(qamc_accuracy(out, np.asarray(batch["ans"])))
            elif args.mode == "qamc-mlm":
                accs.extend(qamc_mlm_head_accuracy(
                    out, np.asarray(batch["mask_ans"]),
                    datasets["train"].true_token_id,
                    datasets["train"].false_token_id))
            elif args.mode == "qamc-gen":
                accs.extend(qamc_gen_accuracy(
                    out, np.asarray(batch["txt"]), tokzr.mask_token_id,
                    datasets["train"].ans_tok_ids,
                    np.asarray(batch["ans_idx"])))
            elif args.mode == "qaoe":
                accs.append(float((np.argmax(out, -1)
                                   == np.asarray(batch["ans"])).mean()))
            else:
                accs.extend(qaoe_mlm_topk(out, np.asarray(batch["mask_ans"]),
                                          k=1))
        from empirical_mvm_tpu.parallel.mesh import all_gather_metrics
        accs = all_gather_metrics(accs)
        return float(np.mean(accs)) if accs else 0.0

    if cfg.train.size_epoch > 0:
        agent.fit(loaders["train"], loaders.get("val"), loaders.get("test"),
                  eval_fn=eval_fn)
    else:
        for sname in ("val", "test"):
            if loaders.get(sname) is not None:
                print(sname, eval_fn(agent.state.params, loaders[sname]))


if __name__ == "__main__":
    main()
