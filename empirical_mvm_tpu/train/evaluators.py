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
    model, params, dataset, *, chunk_size: int = 512,
    encode_batch: int = 32, mesh=None,
    progress: Callable[[str], None] | None = None,
) -> dict:
    """Full MSRVTT-style eval: encode every (text, video), cross-score all
    pairs, rank (ref: eval_retrieval.py + eval_retrieval_tsv.py __main__).

    Mesh-parallel: the reference spreads the |T| x |V| cross-scoring over
    GPUs with ``T.nn.DataParallel`` (ref: eval_retrieval_tsv.py:45); here
    BOTH stages run data-sharded over the device mesh. Stage-1 encode
    batches (``encode_batch`` clips) and stage-2 pair chunks (``chunk_size``
    pairs) are padded up to a mesh multiple and sharded on their leading
    axis. Stage 2 keeps the full feature banks device-resident (replicated)
    and gathers each chunk's (text, video) rows ON DEVICE from int32 pair
    indices — host->device traffic is O((|T|+|V|) * D + |pairs| * 8 bytes),
    not O(|pairs| * D)."""
    from empirical_mvm_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                                 replicated)
    if mesh is None:
        mesh = make_mesh()
    n_mesh = mesh.shape["data"]
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    params = jax.device_put(params, rep)

    def _pad_to_mesh(b: int) -> int:
        return max(-(-b // n_mesh) * n_mesh, n_mesh)

    enc_bs = _pad_to_mesh(encode_batch)
    chunk_size = _pad_to_mesh(chunk_size)

    enc = jax.jit(lambda p, img, txt, mask: model.apply(
        {"params": p}, img, txt, mask, method=model.encode),
        in_shardings=(rep, bsh, bsh, bsh))

    # stage 1, batched: group items by clip count (the clip axis is a static
    # shape) so each jitted encode sees full batches instead of one video at
    # a time like the reference's DataParallel pass (eval_retrieval.py:100).
    n = len(dataset)
    items = [dataset.multi_clip_item(i) for i in range(n)]
    by_clips: dict[int, list[int]] = {}
    for i, it in enumerate(items):
        by_clips.setdefault(it["img"].shape[0], []).append(i)

    feats: list[dict] = [None] * n
    done = 0
    for n_clips, idxs in by_clips.items():
        for c0 in range(0, len(idxs), enc_bs):
            sel = idxs[c0:c0 + enc_bs]
            pad = enc_bs - len(sel)
            sel_p = sel + [sel[-1]] * pad
            img = np.stack([items[i]["img"] for i in sel_p])
            txt = np.stack([items[i]["txt"] for i in sel_p])
            mask = np.stack([items[i]["mask"] for i in sel_p])
            fi, mi, ft, mt = enc(params, img, txt, mask)
            fi, mi, ft, mt = (np.asarray(x) for x in (fi, mi, ft, mt))
            for j, i in enumerate(sel):
                feats[i] = {"fi": fi[j], "mi": mi[j],
                            "ft": ft[j], "mt": mt[j],
                            "vid": items[i]["vid"], "tid": items[i]["tid"]}
            done += len(sel)
            if progress:
                progress(f"stage1 {done}/{n} (mesh={n_mesh})")

    vids = sorted({f["vid"] for f in feats})
    vid2col = {v: j for j, v in enumerate(vids)}
    # unique videos: first feature row per vid
    vid_feat = {}
    for f in feats:
        vid_feat.setdefault(f["vid"], f)
    vfeats = [vid_feat[v] for v in vids]

    n_txt, n_vid = len(feats), len(vids)
    # device-resident feature banks, replicated once
    bank = jax.device_put(
        {"fi": np.stack([v["fi"] for v in vfeats]),
         "mi": np.stack([v["mi"] for v in vfeats]),
         "ft": np.stack([f["ft"] for f in feats]),
         "mt": np.stack([f["mt"] for f in feats])}, rep)

    score = jax.jit(
        lambda p, bk, ti, vj: model.apply(
            {"params": p}, bk["fi"][vj], bk["mi"][vj],
            bk["ft"][ti], bk["mt"][ti], method=model.score_pairs),
        in_shardings=(rep, rep, bsh, bsh))

    ti_all, vj_all = np.meshgrid(np.arange(n_txt, dtype=np.int32),
                                 np.arange(n_vid, dtype=np.int32),
                                 indexing="ij")
    ti_all, vj_all = ti_all.ravel(), vj_all.ravel()
    n_pairs = n_txt * n_vid
    scores = np.zeros((n_txt, n_vid), np.float32)
    for c0 in range(0, n_pairs, chunk_size):
        ti = ti_all[c0:c0 + chunk_size]
        vj = vj_all[c0:c0 + chunk_size]
        k = len(ti)
        if k < chunk_size:   # pad the tail chunk to the static shape
            ti = np.concatenate([ti, np.full(chunk_size - k, ti[-1], np.int32)])
            vj = np.concatenate([vj, np.full(chunk_size - k, vj[-1], np.int32)])
        out = np.asarray(score(params, bank, ti, vj))
        scores[ti[:k], vj[:k]] = out[:k]
        if progress and (c0 // chunk_size) % 50 == 0:
            progress(f"stage2 {c0}/{n_pairs} (mesh={n_mesh})")

    gt = [vid2col[dataset.gt_txt2vid[f["tid"]]] for f in feats]
    out = rank_metrics(scores, gt)
    out["_mesh_devices"] = float(n_mesh)
    return out


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
