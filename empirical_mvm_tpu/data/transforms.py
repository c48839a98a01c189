"""Frame decode + spatial transforms + temporal sampling (host side).

Parity targets in the reference's L1 data pipeline (ref: dataset.py:91-195,
visbackbone/video_transform.py):
* base64 -> RGB decode with the cv2-then-PIL fallback (ref: dataset.py:136-140);
* pad_resize / img_center_crop / img_rand_crop / vid_center_crop with
  ImageNet normalization (ref: dataset.py:91-134);
* uniform temporal sampling with a random clip offset at train time
  (ref: dataset.py:142-163);
* multi-clip temporal crops for retrieval eval (ref: eval_retrieval.py:18-43).

Implementation is numpy/cv2 only (no torch/torchvision): decode happens in
host loader processes, the normalized (T, H, W, 3) float32 clip ships to the
device once per step (single host->device boundary, like move_to_cuda at
ref dataset.py:252). Output layout is channel-last for TPU.
"""

from __future__ import annotations

import base64
import io
import math
import random
from typing import Sequence

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def decode_raw_image(raw: bytes | np.ndarray) -> np.ndarray:
    """compressed image bytes -> RGB uint8 HWC, cv2 with PIL fallback
    (ref: dataset.py:136-140)."""
    try:
        import cv2
        buf = raw if isinstance(raw, np.ndarray) \
            else np.frombuffer(raw, np.uint8)
        arr = cv2.imdecode(buf, cv2.IMREAD_COLOR)
        if arr is None:
            raise ValueError("cv2 decode failed")
        return arr[:, :, ::-1].copy()          # BGR -> RGB
    except Exception:
        from PIL import Image
        raw_b = raw.tobytes() if isinstance(raw, np.ndarray) else raw
        return np.asarray(Image.open(io.BytesIO(raw_b)).convert("RGB"))


def decode_b64_image(b: str | bytes) -> np.ndarray:
    """base64 -> RGB uint8 HWC (ref: dataset.py:136-140)."""
    return decode_raw_image(base64.b64decode(b))


def _resize(img: np.ndarray, size: int | tuple[int, int],
            short_side: bool = False) -> np.ndarray:
    import cv2
    h, w = img.shape[:2]
    if short_side:
        # torchvision Resize(int): scale the short side to `size`
        if h < w:
            nh, nw = size, max(1, int(round(w * size / h)))
        else:
            nh, nw = max(1, int(round(h * size / w))), size
    else:
        nh, nw = (size, size) if isinstance(size, int) else size
    return cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)


def _normalize(img: np.ndarray) -> np.ndarray:
    x = img.astype(np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def pad_resize(img: np.ndarray, size: int,
               normalize: bool = True) -> np.ndarray:
    """Pad to square then resize (ref: dataset.py:91-98)."""
    h, w = img.shape[:2]
    if w > h:
        pad = (w - h) // 2
        img = np.pad(img, ((pad, w - h - pad), (0, 0), (0, 0)))
    elif h > w:
        pad = (h - w) // 2
        img = np.pad(img, ((0, 0), (pad, h - w - pad), (0, 0)))
    img = _resize(img, size)
    return _normalize(img) if normalize else img


def center_crop(img: np.ndarray, size: int,
                normalize: bool = True) -> np.ndarray:
    """Resize short side then center crop (ref: dataset.py:100-106)."""
    img = _resize(img, size, short_side=True)
    h, w = img.shape[:2]
    top, left = (h - size) // 2, (w - size) // 2
    img = img[top:top + size, left:left + size]
    return _normalize(img) if normalize else img


def rand_crop(img: np.ndarray, size: int,
              rng: random.Random | None = None,
              normalize: bool = True) -> np.ndarray:
    """Resize short side then random crop (ref: dataset.py:127-134)."""
    rng = rng or random
    img = _resize(img, size, short_side=True)
    h, w = img.shape[:2]
    top = rng.randint(0, h - size) if h > size else 0
    left = rng.randint(0, w - size) if w > size else 0
    img = img[top:top + size, left:left + size]
    return _normalize(img) if normalize else img


def apply_transform(img: np.ndarray, kind: str, size: int,
                    rng: random.Random | None = None,
                    normalize: bool = True) -> np.ndarray:
    if kind == "pad_resize":
        return pad_resize(img, size, normalize=normalize)
    if kind in ("img_center_crop", "vid_center_crop"):
        return center_crop(img, size, normalize=normalize)
    if kind in ("img_rand_crop", "vid_rand_crop"):
        return rand_crop(img, size, rng, normalize=normalize)
    raise ValueError(f"unknown transform {kind}")


def sampling(start: int, end: int, n: int) -> list[int]:
    """Evenly spaced rounded indices (ref: dataset.py:142-146)."""
    if n == 1:
        return [int(round((start + end) / 2.0))]
    step = (end - start) / float(n - 1)
    return [int(round(start + x * step)) for x in range(n)]


def temporal_sample(n_avail: int, size_frame: int, random_clip: bool,
                    rng: random.Random | None = None) -> list[int]:
    """Frame indices for one clip (ref: dataset.py:148-163)."""
    rng = rng or random
    if n_avail == 1 or n_avail == size_frame:
        return list(range(n_avail))
    sf = min(size_frame, n_avail)
    size_clips = int(math.ceil(n_avail / sf))
    if random_clip:
        start = rng.randrange(size_clips)
        end = min(start + (sf - 1) * size_clips, n_avail - 1)
    else:
        start, end = 0, n_avail - 1
    return sampling(start, end, sf)


def multi_clip_indices(n_avail: int, size_frame: int) -> list[list[int]]:
    """All temporal crops for multi-clip retrieval eval
    (ref: eval_retrieval.py:28-36)."""
    if n_avail == 1 or n_avail == size_frame:
        return [list(range(n_avail))]
    sf = min(size_frame, n_avail)
    size_clips = int(math.ceil(n_avail / sf))
    clips = []
    for start in range(size_clips):
        end = min(start + (sf - 1) * size_clips, n_avail - 1)
        clips.append(sampling(start, end, sf))
    return clips


def decode_clip(bufs: Sequence[str | bytes], size_img: int, size_frame: int,
                split: str = "train",
                transform: str = "img_rand_crop",
                rng: random.Random | None = None,
                normalize: bool = True) -> np.ndarray:
    """base64 frame buffers -> (T, H, W, 3) normalized float32 clip
    (ref: dataset.py:165-195 get_img_or_video).

    ``vid_*`` transforms crop the whole clip with ONE shared window
    (ref: visbackbone/video_transform.py:248-306 clip-level RandomCrop);
    ``img_*`` transforms draw an independent crop per frame.
    """
    rng = rng or random
    train = split == "train"
    idx = temporal_sample(len(bufs), size_frame, random_clip=train, rng=rng)
    return clip_from_images([decode_b64_image(bufs[i]) for i in idx],
                            size_img, split=split, transform=transform,
                            rng=rng, normalize=normalize)


def eval_transform(transform: str, split: str) -> str:
    """Eval-time transform downgrades (ref: dataset.py:179-189)."""
    if split == "train":
        return transform
    return {"vid_rand_crop": "vid_center_crop",
            "img_rand_crop": "img_center_crop"}.get(transform, transform)


def clip_from_images(imgs: Sequence[np.ndarray], size_img: int,
                     split: str = "train",
                     transform: str = "img_rand_crop",
                     rng: random.Random | None = None,
                     normalize: bool = True) -> np.ndarray:
    """Decoded RGB frames -> (T, H, W, 3) clip: normalized float32, or raw
    uint8 with ``normalize=False`` (the TPU pipeline normalizes on device,
    ops/preprocess.maybe_normalize — 4x fewer host bytes and no fp32 passes
    on the host). Temporal sampling and image decode live with the caller so
    the native reader path (datasets.PretrainTsvDataset) can batch-decode
    only the sampled frames in C++."""
    rng = rng or random
    transform = eval_transform(transform, split)
    if transform == "vid_rand_crop":
        imgs = [_resize(im, size_img, short_side=True) for im in imgs]
        h, w = imgs[0].shape[:2]
        top = rng.randint(0, h - size_img) if h > size_img else 0
        left = rng.randint(0, w - size_img) if w > size_img else 0
        crops = [im[top:top + size_img, left:left + size_img] for im in imgs]
        frames = [_normalize(c) for c in crops] if normalize else crops
    else:
        frames = [apply_transform(im, transform, size_img, rng,
                                  normalize=normalize)
                  for im in imgs]
    out = np.stack(frames)
    return out.astype(np.float32) if normalize else out
