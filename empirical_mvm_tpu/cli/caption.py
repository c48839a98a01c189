"""Video captioning CLI (ref: main_caption.py — training loop at :114-163,
inference at :70-112).

Train: seq2seq-masked caption modeling with label-smoothed CE.
Eval: scan-based autoregressive generation + BLEU-4/CIDEr-D.

Usage:
  python -m empirical_mvm_tpu.cli.caption --config configs/caption.json
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from empirical_mvm_tpu.cli import common
from empirical_mvm_tpu.data.datasets import DatasetBase, TsvImageSource
from empirical_mvm_tpu.models.captioning import VioletCaptioning
from empirical_mvm_tpu.train.agent import AgentBase
from empirical_mvm_tpu.train.caption_metrics import caption_scores
from empirical_mvm_tpu.train import losses as L
from empirical_mvm_tpu.train.train_step import TrainState


class CaptionDataset(DatasetBase):
    """Caption pairs over the img TSV (ref: main_caption dataset usage)."""

    def __init__(self, cfg, split, tokzr, img_source: TsvImageSource,
                 txt: list[dict], mask_prob: float = 0.15):
        super().__init__(cfg, split, tokzr)
        self.img_source = img_source
        self.txt = txt
        self.mask_prob = mask_prob

    def __len__(self):
        return len(self.txt)

    def __getitem__(self, idx: int):
        item = self.txt[idx]
        caption = item["caption"]
        if isinstance(caption, list):
            caption = caption[0]
        txt, mask = self.str2txt(caption)
        # corrupt tokens for seq2seq MLM training (ref: main_caption.py:56-68)
        ans = np.full_like(txt, -1)
        rng = self.rng
        for i in range(1, int(mask.sum()) - 1):
            if rng.random() < self.mask_prob:
                ans[i] = txt[i]
                txt = txt.copy()
                txt[i] = self.tokzr.mask_token_id
        bufs = self.img_source.frames(item["video"])
        img = self.decode_clip(bufs) if bufs else self.zero_clip()
        return {"img": img, "txt": txt, "mask": mask, "mask_ans": ans,
                "vid": item["video"], "raw": caption}


class CaptionAgent(AgentBase):
    def _build_steps(self):
        import optax
        from empirical_mvm_tpu.parallel.mesh import batch_sharding, replicated
        model, tx = self.model, self.tx

        def step_fn(state, batch, rng):
            rng_step = jax.random.fold_in(rng, state.step)

            def loss_fn(p):
                logits = model.apply({"params": p}, batch["img"],
                                     batch["txt"], batch["mask"],
                                     deterministic=False,
                                     rngs={"dropout": rng_step})
                # label-smoothed CE (ref: model_for_captioning.py:8-33)
                return L.label_smoothed_nll(logits, batch["mask_ans"]), logits

            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            return (TrainState(params, opt_state, state.step + 1),
                    {"total": loss})

        rep = replicated(self.mesh)
        bsh = batch_sharding(self.mesh)
        st = TrainState(params=rep, opt_state=rep, step=rep)
        self.train_step = jax.jit(step_fn, in_shardings=(st, bsh, rep),
                                  out_shardings=(st, rep),
                                  donate_argnums=(0,))
        if self.cfg.data.num_beams > 1:
            nb = self.cfg.data.num_beams
            self.generate = jax.jit(
                lambda p, img: self.model.apply(
                    {"params": p}, img, max_len=20, beam_size=nb,
                    method=self.model.generate_beam),
                in_shardings=(rep, bsh))
        else:
            dec = self.cfg.data.decode
            self.generate = jax.jit(
                lambda p, img: self.model.apply(
                    {"params": p}, img, max_len=20, decode=dec,
                    method=self.model.generate),
                in_shardings=(rep, bsh))


def main():
    cfg = common.parse_cli(__doc__)
    cfg = common.setup_run(cfg)
    tokzr = common.get_tokenizer(cfg)
    img_src, txt = common.tsv_sources(cfg)

    splits = ["train", "val"] + (["test"] if "test" in txt else [])
    datasets = {s: CaptionDataset(cfg, s, tokzr, img_src, txt[s])
                for s in splits}
    loaders = common.make_loaders(cfg, datasets)

    model = VioletCaptioning(
        config=cfg.model, dtype=jnp.bfloat16,
        cls_token_id=tokzr.cls_token_id, sep_token_id=tokzr.sep_token_id,
        pad_token_id=tokzr.pad_token_id, mask_token_id=tokzr.mask_token_id)
    b, t, s, x = (cfg.train.size_batch, cfg.model.size_frame,
                  cfg.model.size_img, cfg.model.size_txt)

    def init_fn():
        rng = jax.random.PRNGKey(cfg.train.seed)
        return jax.jit(lambda: model.init(
            rng, jnp.zeros((b, t, s, s, 3)), jnp.zeros((b, x), jnp.int32),
            jnp.ones((b, x), jnp.int32))["params"])()

    params = common.load_initial_params(cfg, model, init_fn,
                                        heads={"fc_mtm": "mlm_head"})
    max_iter = len(loaders["train"]) * cfg.train.size_epoch
    agent = CaptionAgent(cfg, model, params, max_iter=max(max_iter, 1))

    def eval_fn(p, dl):
        hyps, refs = {}, {}
        ds = dl.ds
        for batch, db, n_valid in agent.eval_batches(dl):
            toks = np.asarray(agent.generate(p, db["img"]))[:n_valid]
            for i in range(n_valid):
                vid = batch["vid"][i]
                words = []
                for tid in toks[i, 1:]:
                    if tid in (tokzr.sep_token_id, tokzr.pad_token_id):
                        break
                    words.append(tokzr.convert_ids_to_tokens([int(tid)])[0])
                hyps[vid] = " ".join(w.replace("##", "") for w in words)
                refs.setdefault(vid, []).append(batch["raw"][i])
        return caption_scores(hyps, refs) if hyps else {
            "bleu4": 0.0, "cider": 0.0, "rouge_l": 0.0, "meteor": 0.0}

    if cfg.train.size_epoch > 0:
        agent.fit(loaders["train"], loaders.get("val"), loaders.get("test"),
                  eval_fn=eval_fn)
    else:
        for sname in ("val", "test"):
            if loaders.get(sname) is not None:
                print(sname, json.dumps(eval_fn(agent.state.params,
                                                loaders[sname])))


if __name__ == "__main__":
    main()
