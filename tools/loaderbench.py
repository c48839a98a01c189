"""Host input-pipeline benchmark: TSV -> base64 -> JPEG decode -> transform
-> collate throughput, in clips/s, for the flagship pretrain shapes.

The TPU step consumes batches at `bench.py`'s clips/s; this proves the host
side can feed it. Builds a synthetic WebVid-like shard (N videos x F frames,
340x256 JPEG ~ the reference's source resolution), then drives
PretrainTsvDataset through ShardedBatchLoader exactly as cli/pretrain.py
does (ref data plane: dataset.py:136-195 + utils/tsv_file.py seek/readline
in DataLoader workers).

    python tools/loaderbench.py [--videos 256] [--threads 8] [--reader both]
"""
import argparse
import base64
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_shard(data_dir: str, n_videos: int, n_frames: int,
                h: int = 256, w: int = 340) -> tuple[str, dict]:
    import cv2
    rs = np.random.RandomState(0)
    path = os.path.join(data_dir, "webvid2.5m_train_0.tsv")
    txt = {}
    # realistic JPEG entropy: smooth random fields, not white noise
    base = cv2.GaussianBlur((rs.rand(h, w, 3) * 255).astype(np.uint8),
                            (0, 0), 9)
    with open(path, "w") as f:
        for i in range(n_videos):
            vid = f"clip{i}"
            fields = [vid]
            for t in range(n_frames):
                shift = np.roll(base, (i * 7 + t * 13) % h, axis=0)
                ok, buf = cv2.imencode(".jpg", shift,
                                       [cv2.IMWRITE_JPEG_QUALITY, 87])
                assert ok
                fields.append(base64.b64encode(buf.tobytes()).decode())
            f.write("\t".join(fields) + "\n")
            txt[vid] = [f"a synthetic clip number {i} doing things"]
    return path, txt


def run(tsv_path, txt, *, reader: str, batch: int, threads: int,
        size_img: int, size_frame: int, n_epochs: int = 3) -> float:
    from empirical_mvm_tpu.core.config import load_run_config
    from empirical_mvm_tpu.data import native_tsv
    from empirical_mvm_tpu.data.datasets import PretrainTsvDataset
    from empirical_mvm_tpu.data.loader import ShardedBatchLoader
    from empirical_mvm_tpu.data.tokenizer import load_tokenizer

    cfg = load_run_config({"size_img": size_img, "size_frame": size_frame,
                           "size_txt": 32,
                           "img_transform": ["vid_rand_crop"]})
    tok = load_tokenizer("bert-base-uncased")
    ds = PretrainTsvDataset(cfg, "train", tok, tsv_path, txt)
    if reader == "python":
        from empirical_mvm_tpu.data.tsv import TSVFile
        ds.tsv = TSVFile(tsv_path, generate_lineidx_if_missing=True)
    else:
        assert native_tsv.native_available(), "native reader not built"
        assert isinstance(ds.tsv, native_tsv.NativeTSVFile), type(ds.tsv)
    loader = ShardedBatchLoader(ds, batch, shuffle=True,
                                num_threads=threads, prefetch=4)
    # warm epoch (page cache, thread pools, jit-free)
    for b in loader:
        pass
    n = 0
    t0 = time.perf_counter()
    for ep in range(1, n_epochs + 1):
        loader.set_epoch(ep)
        for b in loader:
            n += b["img"].shape[0]
            assert b["img"].dtype == np.uint8   # on-device normalization
    dt = time.perf_counter() - t0
    return n / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", type=int, default=256)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--size-img", type=int, default=224)
    ap.add_argument("--size-frame", type=int, default=4)
    ap.add_argument("--reader", default="both",
                    choices=["both", "native", "python"])
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as tmp:
        tsv_path, txt = build_shard(tmp, args.videos, args.frames)
        sz = os.path.getsize(tsv_path) / 1e6
        print(f"shard: {args.videos} videos x {args.frames} frames "
              f"({sz:.0f} MB)", file=sys.stderr)
        out = {}
        readers = (["native", "python"] if args.reader == "both"
                   else [args.reader])
        for r in readers:
            cps = run(tsv_path, txt, reader=r, batch=args.batch,
                      threads=args.threads, size_img=args.size_img,
                      size_frame=args.size_frame)
            out[r] = round(cps, 1)
            print(f"{r:7s} {cps:8.1f} clips/s "
                  f"({args.threads} threads)", file=sys.stderr)
        print(json.dumps({"metric": "loader_clips_per_sec", "unit": "clips/s",
                          **out}))


if __name__ == "__main__":
    main()
