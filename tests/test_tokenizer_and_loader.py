"""Tests for the WordPiece tokenizer, transforms, and loaders."""

import os
import numpy as np
import pytest

import tests.conftest  # noqa: F401

from empirical_mvm_tpu.data import tokenizer as tok
from empirical_mvm_tpu.data.loader import MetaLoader, ShardedBatchLoader
from empirical_mvm_tpu.data.tokenizer import WordPieceTokenizer
from empirical_mvm_tpu.data.transforms import (
    center_crop, decode_clip, multi_clip_indices, pad_resize, sampling,
    temporal_sample)

VOCAB = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
         + list("abcdefghijklmnopqrstuvwxyz")
         + ["##" + c for c in "abcdefghijklmnopqrstuvwxyz"]
         + ["the", "a", "cat", "sat", "on", "mat", "##s", "run", "##ning",
            "true", "false", "0", "1", "2", "3", "4", "answer", ":", ",", "."])


@pytest.fixture
def tk():
    return WordPieceTokenizer(VOCAB)


def test_wordpiece_basic(tk):
    assert tk.tokenize("the cat sat") == ["the", "cat", "sat"]
    assert tk.tokenize("cats") == ["cat", "##s"]
    assert tk.tokenize("running") == ["run", "##ning"]
    assert tk.tokenize("The CAT.") == ["the", "cat", "."]
    # unknown word -> [UNK]
    assert tk.tokenize("zzqy") in (["[UNK]"],
                                   [p for p in tk.tokenize("zzqy")])


def test_wordpiece_matches_hf_if_available(tk):
    transformers = pytest.importorskip("transformers")
    from transformers import BertTokenizer
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        vp = os.path.join(d, "vocab.txt")
        with open(vp, "w") as f:
            f.write("\n".join(VOCAB))
        hf = BertTokenizer(vp, do_lower_case=True)
        for s in ["The cat sat on the mats.", "running cats, true false",
                  "answer: 3"]:
            assert tk.tokenize(s) == hf.tokenize(s), s
            assert tk.encode(s) == hf.encode(s), s


def test_str2txt_fixed_length(tk):
    txt, mask = tok.str2txt(tk, "the cat sat on the mat", 8)
    assert txt.shape == (8,) and mask.shape == (8,)
    assert txt[0] == tk.cls_token_id
    assert mask.sum() == (txt != tk.pad_token_id).sum()
    # truncation keeps size_txt-1 then pads
    long_txt, m2 = tok.str2txt(tk, " ".join(["cat"] * 50), 8)
    assert long_txt.shape == (8,) and m2[-1] == 0


def test_mask_tok_policies(tk):
    for pos in ("append", "prepend", "insert", "replace"):
        txt, mask = tok.str2txt_with_mask_tok(tk, "the cat", 8, mask_pos=pos)
        assert (txt == tk.mask_token_id).sum() == 1, pos


def test_temporal_sampling_matches_reference():
    # (ref: dataset.py:142-146)
    assert sampling(0, 9, 4) == [0, 3, 6, 9]
    assert sampling(0, 9, 1) == [4]  # round(4.5) banker's -> 4
    assert temporal_sample(1, 4, random_clip=False) == [0]
    assert temporal_sample(4, 4, random_clip=False) == [0, 1, 2, 3]
    idx = temporal_sample(32, 4, random_clip=False)
    assert idx == sampling(0, 31, 4)
    clips = multi_clip_indices(32, 4)
    assert len(clips) == 8 and all(len(c) == 4 for c in clips)


def test_transforms_shapes():
    img = (np.random.RandomState(0).rand(100, 160, 3) * 255).astype(np.uint8)
    for fn in (pad_resize, center_crop):
        out = fn(img, 64)
        assert out.shape == (64, 64, 3) and out.dtype == np.float32
    # normalization applied: mean near 0 for uniform noise
    assert abs(float(center_crop(img, 64).mean())) < 2.0


def test_decode_clip_from_b64():
    import base64
    import cv2
    frames = []
    for i in range(6):
        arr = np.full((40, 60, 3), i * 30, np.uint8)
        ok, buf = cv2.imencode(".jpg", arr)
        frames.append(base64.b64encode(buf.tobytes()))
    clip = decode_clip(frames, size_img=32, size_frame=3, split="val",
                       transform="img_center_crop")
    assert clip.shape == (3, 32, 32, 3) and clip.dtype == np.float32


class _ToyDS:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((2,), i, np.int32), "vid": f"v{i}"}


def test_sharded_loader_partitions_and_shuffles():
    ds = _ToyDS(20)
    seen = []
    for host in range(2):
        dl = ShardedBatchLoader(ds, 2, shuffle=True, seed=1, num_hosts=2,
                                host_index=host)
        assert len(dl) == 5
        for batch in dl:
            assert batch["x"].shape == (2, 2)
            seen.extend(batch["x"][:, 0].tolist())
    assert sorted(set(seen)) == list(range(20))
    # deterministic epoch shuffles differ
    dl = ShardedBatchLoader(ds, 2, shuffle=True, seed=1)
    a = [b["x"][0, 0] for b in dl]
    dl.set_epoch(1)
    b = [b["x"][0, 0] for b in dl]
    assert a != b


def test_meta_loader_deterministic_mixing():
    ds = _ToyDS(8)
    mk = lambda: ShardedBatchLoader(ds, 2, shuffle=False)
    ml1 = MetaLoader({"a": (mk(), 3), "b": (mk(), 1)}, seed=7)
    ml2 = MetaLoader({"a": (mk(), 3), "b": (mk(), 1)}, seed=7)
    seq1 = [t for t, _ in zip((t for t, _ in iter(ml1)), range(20))]
    seq2 = [t for t, _ in zip((t for t, _ in iter(ml2)), range(20))]
    assert seq1 == seq2                        # same schedule on every host
    assert seq1.count("a") > seq1.count("b")   # respects 3:1 weighting


def test_loader_limit_samples():
    ds = _ToyDS(20)
    dl = ShardedBatchLoader(ds, 2, shuffle=False, limit_samples=6)
    batches = list(dl)
    assert len(batches) == 3  # 6 samples / batch 2


def test_fallback_vocab_loads_offline():
    """Zero-egress startup: load_tokenizer('bert-base-uncased') must work
    with no HF cache by falling back to the bundled vocab
    (tools/build_vocab.py; ref downloads from the hub, dataset.py:22)."""
    from empirical_mvm_tpu.data.tokenizer import (FALLBACK_VOCAB,
                                                  load_tokenizer)
    assert os.path.exists(FALLBACK_VOCAB)
    tk = load_tokenizer("bert-base-uncased")
    assert tk.vocab_size == 30522
    # canonical special-token ids (bert-base-uncased layout)
    assert (tk.pad_token_id, tk.unk_token_id, tk.cls_token_id,
            tk.sep_token_id, tk.mask_token_id) == (0, 100, 101, 102, 103)
    # char-piece coverage: no printable-ascii word ever hits [UNK]
    ids = tk.encode("a person zzxqj-floofs 42 skateboarding!")
    assert tk.unk_token_id not in ids
    assert ids[0] == tk.cls_token_id and ids[-1] == tk.sep_token_id


def test_meta_loader_fractional_ratios():
    """Weights < 1 (rational iters ratios) must not be silently dropped."""
    ds = _ToyDS(8)
    mk = lambda: ShardedBatchLoader(ds, 2, shuffle=False)
    ml = MetaLoader({"a": (mk(), 1.0), "b": (mk(), 0.5)}, seed=3)
    assert ml.pool.count("a") == 2 and ml.pool.count("b") == 1
    with pytest.raises(ValueError):
        MetaLoader({"a": (mk(), 0)}, seed=3)
