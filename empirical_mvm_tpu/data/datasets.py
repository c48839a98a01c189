"""Task datasets: host-side example assembly over the TSV storage layer.

Parity targets (the Dataset half of every (Dataset, Model, Agent) triple,
SURVEY.md §1):
* Dataset_Base text/video helpers (ref: dataset.py:13-218);
* TSV-backed downstream datasets: img TSV + ``id2lineidx`` pkl + txt JSON
  (ref: dataset.py:230-250 get_tsv_dls, main_retrieval_tsv.py:9-41);
* Dataset_Pretrain sharded raw-TSV reading with corrupt-row zero fallback
  (ref: main_pretrain.py:15-138);
* Dataset_QAMC option assembly (ref: main_qamc.py:22-37), generative-MC
  prompt building (ref: main_qamc_tsv_mlm_gen_ans_idx.py:47-66);
* Dataset_QAOE answer-vocab / MLM-head variants
  (ref: main_qaoe.py:21-28, main_qaoe_tsv_mlm_head.py:63-89);
* retrieval train/eval datasets incl. multi-clip testing
  (ref: main_retrieval.py:10-45, eval_retrieval.py:7-76).

Unlike the torch Dataset/DataLoader pattern (worker processes + collate),
these are plain indexable objects; ``loader.py`` shards indices per host and
assembles numpy batches — one host->device transfer per step.
"""

from __future__ import annotations

import json
import logging
import pickle
import random
from typing import Any, Sequence

import numpy as np

from empirical_mvm_tpu.data import tokenizer as tok
from empirical_mvm_tpu.data.transforms import decode_clip, multi_clip_indices
from empirical_mvm_tpu.data.tsv import TSVFile

logger = logging.getLogger(__name__)


class DatasetBase:
    """(ref: dataset.py:13-218)"""

    def __init__(self, cfg, split: str, tokzr, size_frame: int | None = None):
        self.cfg = cfg            # RunConfig
        self.split = split
        self.tokzr = tokzr
        self.size_frame = size_frame or cfg.model.size_frame
        self.size_img = cfg.model.size_img
        self.size_txt = cfg.model.size_txt
        self.transform = cfg.data.img_transform[0]
        self.rng = random.Random(cfg.train.seed)

    def str2txt(self, s: str):
        return tok.str2txt(self.tokzr, s, self.size_txt)

    # (ref: main_qaoe_lsmdc_fib.py:24-26 prompt_text)
    PROMPT_TEXT = "fill in the mask to complete the sentence."

    def get_prompt(self, prompt_text: str | None = None):
        """Fixed-per-run text prompt as ([CLS] toks [SEP], mask) int32 arrays
        (ref: dataset.py:58-65 get_prompt)."""
        if prompt_text is None:
            prompt_text = getattr(self.cfg.data, "prompt", "") or \
                self.PROMPT_TEXT
        ids = ([self.tokzr.cls_token_id]
               + self.tokzr.convert_tokens_to_ids(
                   self.tokzr.tokenize(prompt_text))
               + [self.tokzr.sep_token_id])
        txt = np.asarray(ids, np.int32)
        mask = (txt != self.tokzr.pad_token_id).astype(np.int32)
        return txt, mask

    def item_rng(self, idx: int) -> random.Random:
        """Per-item deterministic RNG: loader threads share the dataset, so a
        single random.Random would interleave draws non-deterministically
        (the torch reference sidesteps this with worker processes)."""
        # int() cast: loader threads pass numpy int64 indices, which
        # random.Random rejects as a seed type
        return random.Random((self.cfg.train.seed * 1_000_003 + int(idx))
                             % (2 ** 31))

    def decode_clip(self, bufs: Sequence[str],
                    idx: int | None = None,
                    normalize: bool = True) -> np.ndarray:
        rng = self.item_rng(idx) if idx is not None else self.rng
        return decode_clip(bufs, self.size_img, self.size_frame,
                           split=self.split, transform=self.transform,
                           rng=rng, normalize=normalize)

    def zero_clip(self, dtype=np.float32) -> np.ndarray:
        """Corrupt-sample fallback (ref: main_pretrain.py:94-117). The uint8
        pipeline zeroes corrupt clips ON DEVICE after normalization (via the
        batch's ``corrupt`` flag) so the result matches the reference's
        normalized-space zeros exactly."""
        return np.zeros((self.size_frame, self.size_img, self.size_img, 3),
                        dtype)

    def partial_txt(self, txt: list[dict]) -> list[dict]:
        """data_ratio subsetting, grouped by video (ref: dataset.py:40-52):
        a ratio < 1 keeps that fraction of videos; an integer >= 1 keeps that
        many videos. Train split only."""
        ratio = self.cfg.data.data_ratio
        if self.split != "train" or ratio == 1:
            return txt
        assert ratio > 0
        by_vid: dict[str, list[dict]] = {}
        for item in txt:
            by_vid.setdefault(item["video"], []).append(item)
        vids = list(by_vid)
        self.rng.shuffle(vids)
        n = (int(np.ceil(len(vids) * ratio)) if ratio < 1
             else min(int(ratio), len(vids)))
        out: list[dict] = []
        for v in vids[:n]:
            out.extend(by_vid[v])
        return out


class TsvImageSource:
    """img TSV + id2lineidx lookup (ref: dataset.py:232-246,
    main_retrieval_tsv.py seek_img_tsv)."""

    def __init__(self, img_tsv_path: str, id2lineidx_path: str):
        import threading
        self.tsv_path = img_tsv_path
        with open(id2lineidx_path, "rb") as f:
            self.id2lineidx: dict[str, int] = pickle.load(f)
        self._fp = None
        self._pid = None
        # loader THREADS share this source: seek+readline must be atomic
        # (the torch reference gets isolation from worker processes instead,
        # utils/tsv_file.py:103-111)
        self._lock = threading.Lock()
        # prefer the lock-free native mmap reader (native/tsv_reader.cpp):
        # id2lineidx stores byte offsets; row numbers follow offset order
        # because the pickle indexes every row of the img TSV
        self._native = None
        self._vid2row: dict[str, int] | None = None
        try:
            from empirical_mvm_tpu.data.native_tsv import (NativeTSVFile,
                                                           native_available)
            if native_available():
                # downstream img TSVs ship only id2lineidx.pkl; the native
                # reader needs the row-offset .lineidx sidecar — generate it
                # once like PretrainTsvDataset does (datasets.py:422)
                TSVFile(img_tsv_path, generate_lineidx_if_missing=True)
                self._native = NativeTSVFile(img_tsv_path)
                offs = sorted(self.id2lineidx.values())
                if len(offs) == self._native.num_rows():
                    off2row = {o: i for i, o in enumerate(offs)}
                    self._vid2row = {v: off2row[o]
                                     for v, o in self.id2lineidx.items()}
                else:           # partial index: keep the seek path
                    self._native = None
        except Exception:  # noqa: BLE001 — .so missing/unbuildable
            self._native = None

    def frames(self, video_id: str) -> list[str] | None:
        import os
        if video_id not in self.id2lineidx:
            return None
        if self._native is not None:
            return self._native[self._vid2row[video_id]][2:]
        with self._lock:
            if self._fp is None or self._pid != os.getpid():
                self._fp = open(self.tsv_path, "r")
                self._pid = os.getpid()
            self._fp.seek(self.id2lineidx[video_id])
            row = [s.strip() for s in self._fp.readline().split("\t")]
        return row[2:]  # key, meta, frames...


def load_txt_json(path: str) -> dict[str, Any]:
    with open(path) as f:
        return json.load(f)


class RetrievalDataset(DatasetBase):
    """(ref: main_retrieval.py:10-55, main_retrieval_tsv.py:9-41)"""

    def __init__(self, cfg, split, tokzr, img_source: TsvImageSource,
                 txt: list[dict]):
        super().__init__(cfg, split, tokzr)
        self.img_source = img_source
        self.txt = self.partial_txt(txt)
        self.gt_txt2vid = {i: item["video"]
                           for i, item in enumerate(self.txt)}

    def __len__(self):
        return len(self.txt)

    def __getitem__(self, idx: int):
        item = self.txt[idx]
        raw_txt = item["caption"]
        if isinstance(raw_txt, list):
            if self.split == "train":
                n = self.rng.randint(1, len(raw_txt))
                ids = self.rng.sample(range(len(raw_txt)), n)
                raw_txt = " ".join(raw_txt[i] for i in ids)
            else:
                raw_txt = " ".join(raw_txt)
        txt, mask = self.str2txt(raw_txt)
        bufs = self.img_source.frames(item["video"])
        img = (self.decode_clip(bufs, idx) if bufs
               else self.zero_clip())
        return {"img": img, "txt": txt, "mask": mask, "vid": item["video"]}

    def multi_clip_item(self, idx: int):
        """Eval stage-1: all temporal crops (ref: eval_retrieval.py:18-43)."""
        item = self.txt[idx]
        bufs = self.img_source.frames(item["video"]) or []
        clips_idx = (multi_clip_indices(len(bufs), self.size_frame)
                     if self.cfg.data.multi_clip_testing and bufs
                     else [list(range(min(len(bufs), self.size_frame)))])
        clips = []
        for ci in clips_idx:
            sel = [bufs[i] for i in ci] if bufs else []
            clips.append(self.decode_clip(sel) if sel else self.zero_clip())
        txt, mask = self.str2txt(item["caption"]
                                 if not isinstance(item["caption"], list)
                                 else " ".join(item["caption"]))
        return {"img": np.stack(clips), "txt": txt, "mask": mask,
                "vid": item["video"], "tid": idx}


class QAMCDataset(DatasetBase):
    """Score-head MC: question [SEP] option per row
    (ref: main_qamc.py:22-37)."""

    def __init__(self, cfg, split, tokzr, img_source: TsvImageSource,
                 txt: list[dict]):
        super().__init__(cfg, split, tokzr)
        self.img_source = img_source
        self.txt = self.partial_txt(txt)
        self.size_option = cfg.model.size_option

    def __len__(self):
        return len(self.txt)

    def __getitem__(self, idx: int):
        item = self.txt[idx]
        q = item["question"]
        txts, masks = [], []
        for i in range(self.size_option):
            opt = item[f"option_{i}"]
            s = tok.concat_txt(self.tokzr, q, opt) if q else opt
            t, m = self.str2txt(s)
            txts.append(t)
            masks.append(m)
        bufs = self.img_source.frames(item["video"])
        img = (self.decode_clip(bufs, idx) if bufs
               else self.zero_clip())
        return {"img": img, "txt": np.stack(txts), "mask": np.stack(masks),
                "ans": np.int32(item["answer"])}


class QAMCMLMDataset(DatasetBase):
    """MLM-head MC: per-option "question option [MASK]" rows with true/false
    answers at the mask (ref: main_qamc_tsv_mlm_head.py:9-54)."""

    def __init__(self, cfg, split, tokzr, img_source: TsvImageSource,
                 txt: list[dict]):
        super().__init__(cfg, split, tokzr)
        self.img_source = img_source
        self.txt = self.partial_txt(txt)
        self.size_option = cfg.model.size_option
        self.true_token_id = tokzr.convert_tokens_to_ids(["true"])[0]
        self.false_token_id = tokzr.convert_tokens_to_ids(["false"])[0]

    def __len__(self):
        return len(self.txt)

    def __getitem__(self, idx: int):
        item = self.txt[idx]
        q = item["question"]
        ans_idx = int(item["answer"])
        txts, masks, mask_ans = [], [], []
        for i in range(self.size_option):
            opt = item[f"option_{i}"]
            s = f"{q} {opt}" if q else opt
            # fixed-length encode, then append [MASK] (ref :13-16 appends
            # the mask token after the standard encoding)
            t, m = tok.str2txt_with_mask_tok(self.tokzr, s, self.size_txt,
                                             mask_pos="append")
            ma = np.full_like(t, -1)
            ans_id = (self.true_token_id if i == ans_idx
                      else self.false_token_id)
            ma[t == self.tokzr.mask_token_id] = ans_id
            txts.append(t)
            masks.append(m)
            mask_ans.append(ma)
        bufs = self.img_source.frames(item["video"])
        img = (self.decode_clip(bufs, idx) if bufs
               else self.zero_clip())
        return {"img": img, "txt": np.stack(txts), "mask": np.stack(masks),
                "mask_ans": np.stack(mask_ans), "ans": np.int32(ans_idx)}


class QAMCGenDataset(DatasetBase):
    """Generative MC: options inside the prompt, [MASK] predicts the digit
    (ref: main_qamc_tsv_mlm_gen_ans_idx.py:8-81)."""

    def __init__(self, cfg, split, tokzr, img_source: TsvImageSource,
                 txt: list[dict]):
        super().__init__(cfg, split, tokzr)
        self.img_source = img_source
        self.txt = self.partial_txt(txt)
        self.size_option = cfg.model.size_option
        self.ans_tok_ids = tokzr.convert_tokens_to_ids(
            [f"{i}" for i in range(self.size_option)])

    def __len__(self):
        return len(self.txt)

    def __getitem__(self, idx: int):
        item = self.txt[idx]
        question = item["question"]
        for i in range(self.size_option):
            question = tok.concat_txt(self.tokzr, question,
                                      f"option {i}: " + item[f"option_{i}"])
        txt, mask = tok.str2txt_with_mask_tok(
            self.tokzr, question, self.size_txt,
            mask_pos=self.cfg.data.mask_pos)
        ans_idx = int(item["answer"])
        ans_tok = self.tokzr.convert_tokens_to_ids([f"{ans_idx}"])[0]
        mask_ans = np.where(txt == self.tokzr.mask_token_id, ans_tok,
                            -1).astype(np.int32)
        bufs = self.img_source.frames(item["video"])
        img = (self.decode_clip(bufs, idx) if bufs
               else self.zero_clip())
        return {"img": img, "txt": txt, "mask": mask, "mask_ans": mask_ans,
                "ans_idx": np.int32(ans_idx)}


class QAOEDataset(DatasetBase):
    """Open-ended QA with an answer vocabulary (ref: main_qaoe.py:9-38)."""

    def __init__(self, cfg, split, tokzr, img_source: TsvImageSource,
                 txt: list[dict], ans2label: dict[str, int]):
        super().__init__(cfg, split, tokzr)
        self.img_source = img_source
        self.txt = self.partial_txt(txt)
        self.ans2label = ans2label
        self.label2ans = {v: k for k, v in ans2label.items()}

    def __len__(self):
        return len(self.txt)

    def __getitem__(self, idx: int):
        item = self.txt[idx]
        txt, mask = self.str2txt(item["question"])
        bufs = self.img_source.frames(item["video"])
        img = (self.decode_clip(bufs, idx) if bufs
               else self.zero_clip())
        return {"img": img, "txt": txt, "mask": mask,
                "ans": np.int32(item["answer"])}


class QAOEMLMDataset(DatasetBase):
    """Open-ended QA through the MLM head: 'answer: [MASK]' appended, label
    is the answer's token id (ref: main_qaoe_tsv_mlm_head.py:27-89);
    LSMDC-FiB replaces the inline [MASK] (ref: main_qaoe_lsmdc_fib.py:28-41).
    """

    def __init__(self, cfg, split, tokzr, img_source: TsvImageSource,
                 txt: list[dict], fib: bool = False):
        super().__init__(cfg, split, tokzr)
        self.img_source = img_source
        self.txt = txt
        self.fib = fib
        n_bad = sum(1 for it in txt if self._ans_id(it) in
                    (self.tokzr.unk_token_id, -1))
        if txt:
            logger.info("%s upper-bound %.2f%% (%d invalid / %d)", split,
                        (1 - n_bad / len(txt)) * 100, n_bad, len(txt))

    def _ans_id(self, item) -> int:
        ans = item.get("answer_text")
        if ans is None:
            return int(item["answer"])
        aid = self.tokzr.convert_tokens_to_ids([ans])[0]
        return -1 if aid == self.tokzr.unk_token_id else aid

    def __len__(self):
        return len(self.txt)

    def __getitem__(self, idx: int):
        item = self.txt[idx]
        q = item["question"]
        if self.fib:
            q = q.replace("[MASK]", self.tokzr.mask_token)
            txt, mask = self.str2txt(q)
        else:
            # append policy adds 'answer: [MASK]' (ref: qaoe_tsv_mlm_head:27-29)
            toks = self.tokzr.tokenize(q)[: self.size_txt - 1]
            pad_len = self.size_txt - len(toks)
            toks = ([self.tokzr.cls_token] + toks
                    + self.tokzr.tokenize("answer: ")
                    + [self.tokzr.mask_token, self.tokzr.sep_token]
                    + [self.tokzr.pad_token] * pad_len)
            ids = np.asarray(self.tokzr.convert_tokens_to_ids(toks), np.int32)
            txt, mask = ids, (ids != self.tokzr.pad_token_id).astype(np.int32)
        ans_id = self._ans_id(item)
        mask_ans = np.where(txt == self.tokzr.mask_token_id, ans_id,
                            -1).astype(np.int32)
        bufs = self.img_source.frames(item["video"])
        img = (self.decode_clip(bufs, idx) if bufs
               else self.zero_clip())
        if bufs is None:
            mask_ans[:] = -1
        return {"img": img, "txt": txt, "mask": mask, "mask_ans": mask_ans}


class PretrainTsvDataset(DatasetBase):
    """Sharded raw-TSV pretrain dataset (ref: main_pretrain.py:15-138).

    Row format: ``vid \t frame1_b64 \t ... frameN_b64``; captions come from a
    separate per-split dict {vid: [caption, ...]}. Image datasets (cc3m etc.)
    use size_frame=1 (ref: main_pretrain.py:19).
    """

    IMAGE_DATASETS = ("cc3m", "coco", "vg", "cc12m", "sbu")

    def __init__(self, cfg, split, tokzr, tsv_path: str, txt: dict,
                 dataset_name: str = "webvid2.5m", vq: dict | None = None):
        size_frame = 1 if dataset_name in self.IMAGE_DATASETS else None
        super().__init__(cfg, split, tokzr, size_frame=size_frame)
        # prefer the C++ mmap reader (native/tsv_reader.cpp); falls back to
        # the Python TSVFile when the .so isn't built
        from empirical_mvm_tpu.data.native_tsv import open_tsv
        TSVFile(tsv_path, generate_lineidx_if_missing=True)  # ensure lineidx
        self.tsv = open_tsv(tsv_path)
        self.txt = txt
        self.vq = vq
        self.dataset_name = dataset_name

    def __len__(self):
        return self.tsv.num_rows()

    def _read_clip(self, idx: int):
        """(vid, uint8 clip, corrupt). On the native reader, base64-decode
        ONLY the temporally-sampled frame fields in one batched C++ call and
        feed cv2.imdecode zero-copy views — the Python path materializes
        every field of the row as str first (ref's loader does the same
        per-field python b64, utils/tsv_file.py:86-93). Clips stay uint8 on
        the host; normalization runs on device (pretrain.losses)."""
        from empirical_mvm_tpu.data.native_tsv import NativeTSVFile
        from empirical_mvm_tpu.data.transforms import (clip_from_images,
                                                       decode_raw_image,
                                                       temporal_sample)
        if isinstance(self.tsv, NativeTSVFile):
            rb = self.tsv.row_bytes(idx)
            tab = rb.find(b"\t")
            vid = (rb if tab < 0 else rb[:tab]).decode("utf-8")
            n_avail = rb.count(b"\t")
            if n_avail <= 0:
                return vid, self.zero_clip(np.uint8), True
            sel = temporal_sample(n_avail, self.size_frame,
                                  random_clip=self.split == "train",
                                  rng=self.rng)
            try:
                raws = self.tsv.decode_fields(
                    [(idx, 1 + i) for i in sel], copy=False)
                imgs = [decode_raw_image(r) for r in raws]
                return vid, clip_from_images(
                    imgs, self.size_img, split=self.split,
                    transform=self.transform, rng=self.rng,
                    normalize=False), False
            except Exception:
                return vid, self.zero_clip(np.uint8), True
        row = self.tsv[idx]
        vid, bufs = row[0], row[1:]
        try:
            return vid, self.decode_clip(bufs, normalize=False), False
        except Exception:
            return vid, self.zero_clip(np.uint8), True

    def __getitem__(self, idx: int):
        vid, img, corrupt = self._read_clip(idx)
        raw_txt = ""
        if vid in self.txt:
            raw = self.txt[vid]
            raw_txt = raw[0] if isinstance(raw, list) else raw
        else:
            corrupt = True
        if self.vq is not None and vid not in self.vq:
            # the reference marks a row corrupt when its vid is absent from
            # the pre-extracted vq table (ref: main_pretrain.py:88-93)
            corrupt = True
        t = img.shape[0]
        h = w = self.size_img // self.cfg.model.size_patch
        lv = t * (1 + h * w)
        vq_arr = np.full((lv,), -1, np.int32)
        if self.vq is not None and vid in self.vq and not corrupt:
            cells = self.vq[vid]
            flat = []
            for c in cells:
                flat.extend([-1] + list(np.asarray(c).flatten()))
            if len(flat) == lv:
                vq_arr = np.asarray(flat, np.int32)
        if corrupt:
            raw_txt = ""
            img = np.zeros_like(img)
            vq_arr[:] = -1
        txt, mask = self.str2txt(raw_txt)
        # ``corrupt`` lets the device zero the clip AFTER normalization,
        # matching the reference's normalized-space zeros exactly (uint8
        # zeros alone would normalize to -mean/std, not 0)
        return {"img": img, "txt": txt, "mask": mask, "vq": vq_arr,
                "corrupt": np.bool_(corrupt)}
