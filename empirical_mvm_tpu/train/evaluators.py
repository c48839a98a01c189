"""Evaluation pipelines: two-stage retrieval ranking and QA accuracies.

Parity targets:
* two-stage retrieval eval (ref: eval_retrieval.py:96-115 feat/cross modes,
  eval_retrieval_tsv.py:47-92 ranking -> R@1/5/10/MedR). The reference
  cross-encodes the full |T| x |V| cartesian product under nn.DataParallel;
  here stage 2 runs as jitted chunks of (text, video) pairs on the mesh.
* QA-MC accuracy incl. the generative digit-token renormalization
  (ref: main_qamc_tsv_mlm_gen_ans_idx.py:120-130);
* QA-OE top-1/top-5 via MLM logits at the [MASK] position
  (ref: main_qaoe_lsmdc_fib.py:96-116).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def rank_metrics(score_matrix: np.ndarray, gt_idx: Sequence[int]) -> dict:
    """R@1/5/10 + MedR from a (n_text, n_video) score matrix
    (ref: eval_retrieval_tsv.py:79-92)."""
    s = np.asarray(score_matrix)
    gt = np.asarray(gt_idx)
    order = np.argsort(-s, axis=1)
    ranks = np.array([int(np.where(order[i] == gt[i])[0][0]) + 1
                      for i in range(len(gt))])
    return {"r1": float((ranks <= 1).mean() * 100),
            "r5": float((ranks <= 5).mean() * 100),
            "r10": float((ranks <= 10).mean() * 100),
            "medr": float(np.median(ranks))}


def retrieval_two_stage_eval(
    model, params, dataset, *, chunk_size: int = 64,
    progress: Callable[[str], None] | None = None,
) -> dict:
    """Full MSRVTT-style eval: encode every (text, video), cross-score all
    pairs, rank (ref: eval_retrieval.py + eval_retrieval_tsv.py __main__)."""
    enc = jax.jit(lambda p, img, txt, mask: model.apply(
        {"params": p}, img, txt, mask, method=model.encode))
    score = jax.jit(lambda p, fi, mi, ft, mt: model.apply(
        {"params": p}, fi, mi, ft, mt, method=model.score_pairs))

    # stage 1, batched: group items by clip count (the clip axis is a static
    # shape) so each jitted encode sees full batches instead of one video at
    # a time like the reference's DataParallel pass (eval_retrieval.py:100).
    n = len(dataset)
    items = [dataset.multi_clip_item(i) for i in range(n)]
    by_clips: dict[int, list[int]] = {}
    for i, it in enumerate(items):
        by_clips.setdefault(it["img"].shape[0], []).append(i)

    feats: list[dict] = [None] * n
    enc_bs = max(chunk_size // 8, 1)
    done = 0
    for n_clips, idxs in by_clips.items():
        for c0 in range(0, len(idxs), enc_bs):
            sel = idxs[c0:c0 + enc_bs]
            pad = enc_bs - len(sel)
            sel_p = sel + [sel[-1]] * pad
            img = jnp.asarray(np.stack([items[i]["img"] for i in sel_p]))
            txt = jnp.asarray(np.stack([items[i]["txt"] for i in sel_p]))
            mask = jnp.asarray(np.stack([items[i]["mask"] for i in sel_p]))
            fi, mi, ft, mt = enc(params, img, txt, mask)
            for j, i in enumerate(sel):
                feats[i] = {"fi": np.asarray(fi[j]), "mi": np.asarray(mi[j]),
                            "ft": np.asarray(ft[j]), "mt": np.asarray(mt[j]),
                            "vid": items[i]["vid"], "tid": items[i]["tid"]}
            done += len(sel)
            if progress:
                progress(f"stage1 {done}/{n}")

    vids = sorted({f["vid"] for f in feats})
    vid2col = {v: j for j, v in enumerate(vids)}
    # unique videos: first feature row per vid
    vid_feat = {}
    for f in feats:
        vid_feat.setdefault(f["vid"], f)
    vfeats = [vid_feat[v] for v in vids]

    n_txt, n_vid = len(feats), len(vids)
    scores = np.zeros((n_txt, n_vid), np.float32)
    pairs = [(ti, vj) for ti in range(n_txt) for vj in range(n_vid)]
    for c0 in range(0, len(pairs), chunk_size):
        chunk = pairs[c0:c0 + chunk_size]
        pad = chunk_size - len(chunk)
        chunk_p = chunk + [chunk[-1]] * pad
        fi = jnp.asarray(np.stack([vfeats[vj]["fi"] for _, vj in chunk_p]))
        mi = jnp.asarray(np.stack([vfeats[vj]["mi"] for _, vj in chunk_p]))
        ft = jnp.asarray(np.stack([feats[ti]["ft"] for ti, _ in chunk_p]))
        mt = jnp.asarray(np.stack([feats[ti]["mt"] for ti, _ in chunk_p]))
        out = np.asarray(score(params, fi, mi, ft, mt))
        for k, (ti, vj) in enumerate(chunk):
            scores[ti, vj] = out[k]
        if progress and c0 % (chunk_size * 50) == 0:
            progress(f"stage2 {c0}/{len(pairs)}")

    gt = [vid2col[dataset.gt_txt2vid[f["tid"]]] for f in feats]
    return rank_metrics(scores, gt)


def qamc_accuracy(logits: np.ndarray, answers: np.ndarray) -> float:
    """(ref: main_qamc.py:152-154)"""
    return float((np.argmax(logits, axis=1) == answers).mean())


def qamc_gen_accuracy(mlm_logits: np.ndarray, txt: np.ndarray,
                      mask_token_id: int, ans_tok_ids: Sequence[int],
                      ans_idx: np.ndarray) -> list[float]:
    """Renormalize MLM logits over the digit tokens at the [MASK] position
    (ref: main_qamc_tsv_mlm_gen_ans_idx.py:120-130)."""
    accs = []
    for b in range(mlm_logits.shape[0]):
        pos = np.where(txt[b] == mask_token_id)[0]
        if len(pos) == 0:
            accs.append(0.0)
            continue
        p = mlm_logits[b, pos[0], list(ans_tok_ids)]
        accs.append(float(int(np.argmax(p)) == int(ans_idx[b])))
    return accs


def qaoe_mlm_topk(mlm_logits: np.ndarray, mask_ans: np.ndarray,
                  k: int = 5) -> list[float]:
    """Top-k accuracy at positions where mask_ans != -1
    (ref: main_qaoe_lsmdc_fib.py:105-116); absent answers count 0."""
    b = mlm_logits.shape[0]
    accs = []
    for i in range(b):
        pos = np.where(mask_ans[i] != -1)[0]
        if len(pos) == 0:
            accs.append(0.0)
            continue
        logit = mlm_logits[i, pos[0]]
        topk = np.argpartition(-logit, k)[:k]
        accs.append(float(int(mask_ans[i, pos[0]]) in topk.tolist()))
    return accs


def in_batch_retrieval_accuracy(scores: np.ndarray) -> float:
    """Diagonal argmax accuracy used during retrieval fine-tune validation
    (ref: main_retrieval.py:103-106)."""
    return float((np.argmax(scores, axis=1) == np.arange(len(scores))).mean())
