"""Synthetic dataset builder for end-to-end CLI tests.

Produces the reference on-disk layout (ref: dataset.py:230-246,
main_pretrain.py:44-65): ``img_{ds}.tsv`` with base64-JPEG frames +
``img_{ds}.id2lineidx.pkl`` + ``txt_{task}.json``; pretrain shards
``{ds}_train_{part}.tsv``; plus a tiny WordPiece ``vocab.txt``.
"""

from __future__ import annotations

import base64
import json
import os
import pickle

import numpy as np

VOCAB = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
         + [f"{i}" for i in range(10)]
         + ["the", "a", "cat", "dog", "runs", "sits", "red", "blue", "option",
            "what", "is", "doing", "answer", ":", ",", ".", "true", "false"]
         + list("abcdefghijklmnopqrstuvwxyz")
         + ["##" + c for c in "abcdefghijklmnopqrstuvwxyz"])


def write_vocab(path: str) -> str:
    with open(path, "w") as f:
        f.write("\n".join(VOCAB))
    return path


def _jpeg_b64(rs: np.random.RandomState, h=48, w=64) -> str:
    import cv2
    arr = (rs.rand(h, w, 3) * 255).astype(np.uint8)
    ok, buf = cv2.imencode(".jpg", arr)
    assert ok
    return base64.b64encode(buf.tobytes()).decode()


def make_downstream(data_dir: str, ds_name: str, task: str, *,
                    n_videos: int = 6, n_frames: int = 4,
                    kind: str = "retrieval", n_options: int = 3,
                    seed: int = 0) -> None:
    os.makedirs(data_dir, exist_ok=True)
    rs = np.random.RandomState(seed)
    img_path = os.path.join(data_dir, f"img_{ds_name}.tsv")
    id2lineidx = {}
    with open(img_path, "w") as f:
        for v in range(n_videos):
            vid = f"video{v}"
            id2lineidx[vid] = f.tell()
            frames = [_jpeg_b64(rs) for _ in range(n_frames)]
            f.write("\t".join([vid, "{}"] + frames) + "\n")
    with open(os.path.join(data_dir, f"img_{ds_name}.id2lineidx.pkl"),
              "wb") as f:
        pickle.dump(id2lineidx, f)

    words = ["cat", "dog", "runs", "sits", "red", "blue"]
    def caption(v):
        return f"the {words[v % 6]} {words[(v + 2) % 6]}"

    txt: dict = {}
    for split, n in (("train", n_videos), ("val", max(n_videos // 2, 2))):
        items = []
        for i in range(n):
            v = i % n_videos
            if kind == "retrieval":
                items.append({"video": f"video{v}", "caption": caption(v)})
            elif kind == "qamc":
                # learnable from text alone: the correct option carries a
                # marker phrase (for the pair-scoring QAMC head) AND the
                # question spells out the answer digit (for the generative
                # head — a copy task a tiny random-init model can overfit in
                # tens of steps, unlike find-the-marker positional induction)
                ans = v % n_options
                item = {"video": f"video{v}",
                        "question": f"the answer is {ans}",
                        "answer": ans}
                for o in range(n_options):
                    item[f"option_{o}"] = ("the cat runs" if o == ans
                                           else f"a dog sits {words[o]}")
                items.append(item)
            elif kind == "qaoe":
                # LSMDC-FiB schema: the question carries an inline [MASK]
                # placeholder (ref: main_qaoe_lsmdc_fib.py:32 q.replace);
                # non-fib modes tokenize it as a plain mask token, harmless
                items.append({"video": f"video{v}",
                              "question": f"the [MASK] {words[(v + 2) % 6]}",
                              "answer": v % 4,
                              "answer_text": words[v % 6]})
        txt[split] = items
    if kind == "qaoe":
        txt["ans2label"] = {w: i for i, w in enumerate(words[:4])}
    with open(os.path.join(data_dir, f"txt_{task}.json"), "w") as f:
        json.dump(txt, f)


def make_pretrain(data_dir: str, ds_name: str = "webvid2.5m", *,
                  n_videos: int = 8, n_frames: int = 4, n_parts: int = 2,
                  n_val: int = 4, seed: int = 0) -> None:
    os.makedirs(data_dir, exist_ok=True)
    rs = np.random.RandomState(seed)
    txt = {}
    per_part = n_videos // n_parts
    for part in range(n_parts):
        path = os.path.join(data_dir, f"{ds_name}_train_{part}.tsv")
        with open(path, "w") as f:
            for i in range(per_part):
                vid = f"clip{part}_{i}"
                frames = [_jpeg_b64(rs) for _ in range(n_frames)]
                f.write("\t".join([vid] + frames) + "\n")
                txt[vid] = [f"a red cat runs {i}"]
    txt_val = {}
    if n_val:
        with open(os.path.join(data_dir, f"{ds_name}_val_0.tsv"), "w") as f:
            for i in range(n_val):
                vid = f"valclip_{i}"
                frames = [_jpeg_b64(rs) for _ in range(n_frames)]
                f.write("\t".join([vid] + frames) + "\n")
                txt_val[vid] = [f"a blue dog sits {i}"]
    with open(os.path.join(data_dir, f"txt_{ds_name}.json"), "w") as f:
        json.dump({"train": txt, "val": txt_val}, f)


TINY_RUN_OVERRIDES = {
    "size_img": 64,
    "size_frame": 2,
    "size_txt": 12,
    "size_batch": 4,
    "size_epoch": 1,
    "n_workers": 2,
    "swin_custom": {"embed_dim": 8, "depths": [1, 1, 1, 1],
                    "num_heads": [1, 2, 4, 8], "drop_path_rate": 0.0},
    "fusion": {"vocab_size": len(VOCAB), "hidden_size": 32,
               "num_hidden_layers": 2, "num_attention_heads": 4,
               "intermediate_size": 64},
    "text": {"vocab_size": len(VOCAB), "hidden_size": 32,
             "num_hidden_layers": 2, "num_attention_heads": 4,
             "intermediate_size": 64},
}


def make_pretrain_yaml(data_dir: str, name: str = "webvidcc", *,
                       n_videos: int = 6, n_frames: int = 4,
                       seed: int = 0) -> str:
    """Composite-YAML pretrain manifest (ref: main_pretrain_yaml.py flow):
    img/caption TSVs + caption_linelist, registered as {name}.yaml."""
    import json as _json
    os.makedirs(data_dir, exist_ok=True)
    rs = np.random.RandomState(seed)
    from empirical_mvm_tpu.data.tsv import tsv_writer
    rows_img, rows_cap, linelist = [], [], []
    for i in range(n_videos):
        rows_img.append([f"v{i}", "{}"]
                        + [_jpeg_b64(rs) for _ in range(n_frames)])
        rows_cap.append([f"v{i}", _json.dumps(
            [{"caption": f"a red cat runs {i}"}])])
        linelist.append([i, 0])
    tsv_writer(rows_img, os.path.join(data_dir, f"{name}_img.tsv"))
    tsv_writer(rows_cap, os.path.join(data_dir, f"{name}_cap.tsv"))
    with open(os.path.join(data_dir, f"{name}_linelist.tsv"), "w") as f:
        for a, b in linelist:
            f.write(f"{a}\t{b}\n")
    yaml_path = os.path.join(data_dir, f"{name}.yaml")
    with open(yaml_path, "w") as f:
        f.write(f"img: {name}_img.tsv\ncaption: {name}_cap.tsv\n"
                f"caption_linelist: {name}_linelist.tsv\n")
    return yaml_path
