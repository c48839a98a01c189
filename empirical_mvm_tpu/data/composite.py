"""YAML-manifest composite TSV datasets.

Parity target: ``TsvCompositeDataset`` (ref: dataset.py:260-462) and the
YAML-driven pretrain entry (ref: main_pretrain_yaml.py:10-105): a YAML file
names ``img`` / ``caption`` / ``label`` TSVs plus a ``caption_linelist``
mapping (img_line, cap_line); composite manifests span sharded TSV files
with per-shard source indices (used for shard->host affinity).
"""

from __future__ import annotations

import json
import logging
import os.path as op
import random

import numpy as np
import yaml

from empirical_mvm_tpu.data.datasets import DatasetBase
from empirical_mvm_tpu.data.tsv import CompositeTSVFile, TSVFile, tsv_reader

logger = logging.getLogger(__name__)


def load_yaml_manifest(path: str) -> dict:
    """(ref: utils/load_files.py:61 load_from_yaml_file)"""
    with open(path) as f:
        return yaml.safe_load(f)


def find_file_path_in_yaml(fname: str | None, root: str) -> str | None:
    """(ref: utils/load_files.py:66)"""
    if fname is None:
        return None
    if op.isfile(fname):
        return fname
    cand = op.join(root, fname)
    if op.isfile(cand):
        return cand
    raise FileNotFoundError(f"{fname} (root={root})")


class CompositeYamlDataset(DatasetBase):
    """(ref: dataset.py:260-462). Yields the same meta dict shape as
    ``get_img_txt_pair`` (ref: dataset.py:444-462) plus decoded clips."""

    def __init__(self, cfg, yaml_file: str, split: str = "train", tokzr=None):
        super().__init__(cfg, split, tokzr)
        if not op.isfile(yaml_file):
            yaml_file = op.join(cfg.data.data_dir, yaml_file)
        self.yaml_file = yaml_file
        self.root = op.dirname(yaml_file)
        self.manifest = load_yaml_manifest(yaml_file)
        self.is_composite = self.manifest.get("composite", False)
        self.cap_linelist_file = find_file_path_in_yaml(
            self.manifest.get("caption_linelist"), self.root)

        self.visual_tsv = self._get_tsv(self.manifest.get("img"))
        self.label_tsv = self._get_tsv(self.manifest.get("label"))
        self.cap_tsv = self._get_tsv(self.manifest.get("caption"))

        if self.is_composite:
            assert self.cap_linelist_file
            self.cap_line_list = [int(row[2])
                                  for row in tsv_reader(self.cap_linelist_file)]
            self.img_line_list = list(range(len(self.cap_line_list)))
        elif self.cap_linelist_file:
            rows = list(tsv_reader(self.cap_linelist_file))
            self.img_line_list = [int(r[0]) for r in rows]
            self.cap_line_list = [int(r[1]) for r in rows]
        else:
            n = self.cap_tsv.num_rows() if self.cap_tsv else \
                self.visual_tsv.num_rows()
            self.img_line_list = list(range(n))
            self.cap_line_list = [0] * n
        if cfg.data.data_ratio != 1 and split == "train":
            self._partial(cfg.data.data_ratio)

    def _get_tsv(self, spec):
        if not spec:
            return None
        if self.is_composite:
            return CompositeTSVFile(spec, self.cap_linelist_file,
                                    root=self.root)
        return TSVFile(find_file_path_in_yaml(spec, self.root),
                       generate_lineidx_if_missing=True)

    def _partial(self, ratio: float):
        """(ref: dataset.py:310-322)"""
        idx = list(range(len(self.img_line_list)))
        rng = random.Random(self.cfg.train.seed)
        rng.shuffle(idx)
        n = (int(np.ceil(len(idx) * ratio)) if ratio < 1
             else min(int(ratio), len(idx)))
        keep = idx[:n]
        self.img_line_list = [self.img_line_list[i] for i in keep]
        self.cap_line_list = [self.cap_line_list[i] for i in keep]

    def get_composite_source_idx(self) -> list[int]:
        """(ref: dataset.py:330-335) for shard->host affinity."""
        if self.is_composite:
            return [int(row[0]) for row in tsv_reader(self.cap_linelist_file)]
        return [0] * len(self.cap_line_list)

    def __len__(self):
        return len(self.img_line_list)

    def get_caption(self, img_idx: int, cap_idx: int) -> str:
        """(ref: dataset.py:372-377,393-422)"""
        if self.cap_tsv is None:
            return ""
        row = self.cap_tsv[img_idx]
        data = json.loads(row[1])
        if isinstance(data, dict):           # MERLOT-style (ref :379-391)
            caps = data.get("captions") or [data.get("caption", "")]
            return caps[0]
        return data[cap_idx].get("caption", "")

    def __getitem__(self, idx: int):
        img_idx, cap_idx = self.img_line_list[idx], self.cap_line_list[idx]
        caption = self.get_caption(img_idx, cap_idx) \
            if self.split == "train" or self.cap_tsv else ""
        row = self.visual_tsv[img_idx]
        bufs = row[2:]
        try:
            img = self.decode_clip(bufs) if bufs else self.zero_clip()
            corrupt = not bufs
        except Exception:
            img = self.zero_clip()
            corrupt = True
        if corrupt:
            caption = ""
        txt, mask = self.str2txt(caption)
        t = img.shape[0]
        h = w = self.size_img // self.cfg.model.size_patch
        vq = np.full((t * (1 + h * w),), -1, np.int32)
        return {"img": img, "txt": txt, "mask": mask, "vq": vq}


def shard_affinity_indices(source_idx: list[int], num_hosts: int,
                           host_index: int, seed: int = 88,
                           shuffle: bool = True) -> np.ndarray:
    """NodeSplitSampler-equivalent shard->host affinity
    (ref: swinbert/data_sampler.py:98-193): whole source shards are assigned
    to hosts so each host touches few files, then rows shuffle within the
    host's shards."""
    source_idx = np.asarray(source_idx)
    shards = np.unique(source_idx)
    rs = np.random.RandomState(seed)
    order = rs.permutation(len(shards))
    my_shards = set(shards[order[host_index::num_hosts]].tolist())
    mine = np.where(np.isin(source_idx, list(my_shards)))[0]
    if shuffle:
        rs2 = np.random.RandomState(seed + 1 + host_index)
        rs2.shuffle(mine)
    return mine
