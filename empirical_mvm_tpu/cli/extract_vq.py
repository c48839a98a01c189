"""Offline VQ-token extraction for pre-extracted MVM-VQ pretraining.

The reference's cheap MVM-VQ mode consumes pre-extracted dVAE tokens — a
``{vid: [per-frame (hv, wv) int arrays]}`` dict — instead of running the
dVAE in the training loop (ref: main_pretrain.py:27-30,87). The extraction
tooling itself is not in the reference repo; this CLI produces that dict
from a raw pretrain TSV.

Per frame, the token grid must match the visual-token grid the fusion model
sees: ``hv = wv = size_img // size_patch`` (e.g. 7 for 224^2 / patch 32), so
frames are decoded at ``hv * 8`` pixels (the dVAE's stride-8 patch,
ref: visbackbone/dalle/__init__.py:56-58) with the DETERMINISTIC eval
transform (uniform temporal sample + center crop) so tokens line up with the
frames a val-mode loader would draw.

Usage:
  python -m empirical_mvm_tpu.cli.extract_vq \
      --tsv webvid.tsv --dvae dvae_encoder.pt --out webvid.vq.pkl \
      [--size-img 224 --size-patch 32 --size-frame 4 --batch 32]
"""

from __future__ import annotations

import argparse
import logging
import pickle

import numpy as np

logger = logging.getLogger(__name__)


def load_dvae_teacher(path: str, dtype=None, n_hid: int = 256,
                      vocab_size: int = 8192, n_blk_per_group: int = 2):
    """dVAE encoder weights from a torch ``.pt`` state_dict or a native
    msgpack param tree -> :class:`DvaeTeacher`."""
    import jax.numpy as jnp

    from empirical_mvm_tpu.teachers.dvae import (DvaeTeacher,
                                                 dvae_params_from_torch)
    dtype = dtype or jnp.bfloat16
    if path.endswith((".pt", ".pth", ".bin")):
        import torch
        sd = torch.load(path, map_location="cpu")
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
              for k, v in sd.items()}
        params = dvae_params_from_torch(sd, n_blk_per_group=n_blk_per_group)
    else:
        from empirical_mvm_tpu.train.checkpoint import load_params
        params = load_params(path)
    return DvaeTeacher(params, n_hid=n_hid, vocab_size=vocab_size,
                       n_blk_per_group=n_blk_per_group, dtype=dtype)


def extract_tsv(tsv_path: str, teacher, *, size_img: int = 224,
                size_patch: int = 32, size_frame: int = 4,
                batch: int = 32) -> dict[str, list[np.ndarray]]:
    """Run the dVAE over every row of a pretrain TSV
    (``vid \\t frame_b64 ...``); returns the PretrainTsvDataset ``vq`` dict."""
    import jax

    from empirical_mvm_tpu.data.native_tsv import open_tsv
    from empirical_mvm_tpu.data.transforms import decode_clip
    from empirical_mvm_tpu.data.tsv import TSVFile

    hv = size_img // size_patch
    dec_size = hv * teacher.vq_patch          # stride-8 dVAE -> hv x hv grid

    TSVFile(tsv_path, generate_lineidx_if_missing=True)
    tsv = open_tsv(tsv_path)

    @jax.jit
    def run(frames):                          # (N, dec, dec, 3) normalized
        return teacher.extract_vq_tokens(frames)

    out: dict[str, list[np.ndarray]] = {}
    buf_vids: list[str] = []
    buf_counts: list[int] = []
    buf_frames: list[np.ndarray] = []

    def flush():
        if not buf_vids:
            return
        n = len(buf_frames)
        # pad to the compiled batch so one program serves every flush
        frames = np.stack(buf_frames + [buf_frames[-1]] *
                          (batch * size_frame - n))
        toks = np.asarray(run(frames))[:n]    # (n, hv, wv)
        i = 0
        for vid, c in zip(buf_vids, buf_counts):
            out[vid] = [toks[i + j] for j in range(c)]
            i += c
        buf_vids.clear(), buf_counts.clear(), buf_frames.clear()

    for r in range(tsv.num_rows()):
        row = tsv[r]
        vid, bufs = row[0], [b for b in row[1:] if b]
        if not bufs:
            continue
        try:
            clip = decode_clip(bufs, dec_size, size_frame, split="val")
        except Exception:                     # noqa: BLE001 corrupt row
            logger.warning("row %d (%s): decode failed, skipped", r, vid)
            continue
        buf_vids.append(vid)
        buf_counts.append(clip.shape[0])
        buf_frames.extend(clip)
        if len(buf_frames) >= batch * size_frame:
            flush()
    flush()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tsv", required=True)
    ap.add_argument("--dvae", required=True,
                    help="dVAE encoder weights (.pt state_dict or .msgpack)")
    ap.add_argument("--out", required=True, help="output .pkl")
    ap.add_argument("--size-img", type=int, default=224)
    ap.add_argument("--size-patch", type=int, default=32)
    ap.add_argument("--size-frame", type=int, default=4)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--n-hid", type=int, default=256)
    ap.add_argument("--vocab-size", type=int, default=8192)
    ap.add_argument("--n-blk-per-group", type=int, default=2)
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)

    teacher = load_dvae_teacher(args.dvae, n_hid=args.n_hid,
                                vocab_size=args.vocab_size,
                                n_blk_per_group=args.n_blk_per_group)
    vq = extract_tsv(args.tsv, teacher, size_img=args.size_img,
                     size_patch=args.size_patch, size_frame=args.size_frame,
                     batch=args.batch)
    with open(args.out, "wb") as f:
        pickle.dump(vq, f)
    logger.info("wrote %d videos to %s", len(vq), args.out)


if __name__ == "__main__":
    main()
