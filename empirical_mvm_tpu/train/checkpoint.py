"""Checkpoint save/load: msgpack param trees + torch-checkpoint ingestion.

Parity targets (ref: agent.py:127-141 save_model + model.py:295-353 lenient
load): params are saved per eval-step/epoch by the main process only, with
``args.json``/``log.json`` beside them; loading intersects keys, reports
the rest, and slices position embeddings on size mismatch (implemented in
models/torch_import.py).

Native formats:
* ``.msgpack`` — flax-serialized param tree (our native format);
* ``.npz``     — flat numpy tree (portable interchange);
* ``.pt``      — reference torch checkpoints, ingested via torch.load +
                 models/torch_import.violet_params_from_torch.
"""

from __future__ import annotations

import json
import logging
import os
import os.path as op
from typing import Any, Mapping

import numpy as np

logger = logging.getLogger(__name__)


def _flatten(tree: Mapping, prefix: str = "") -> dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, Mapping):
            out.update(_flatten(v, key + "."))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: Mapping[str, np.ndarray]) -> dict:
    tree: dict = {}
    for k, v in flat.items():
        parts = k.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_params(params: Any, path: str, meta: dict | None = None) -> None:
    """Atomic save; main-process gating is the caller's job
    (ref: agent.py:134-141)."""
    os.makedirs(op.dirname(op.abspath(path)), exist_ok=True)
    import jax
    host_params = jax.tree.map(np.asarray, params)
    from empirical_mvm_tpu.core.retry import retry_io
    if path.endswith(".msgpack"):
        from flax import serialization
        blob = serialization.to_bytes(host_params)
        tmp = path + ".tmp"

        def write():
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, path)

        retry_io(write, what=f"ckpt write {path}")
    elif path.endswith(".npz"):
        np.savez(path + ".tmp.npz", **_flatten(host_params))
        os.replace(path + ".tmp.npz", path)
    else:
        raise ValueError(f"unknown checkpoint format: {path}")
    if meta is not None:
        with open(op.splitext(path)[0] + ".json", "w") as f:
            json.dump(meta, f, indent=2, default=str)


def load_params(path: str, like: Any = None) -> Any:
    """Load a checkpoint in any supported format. For .msgpack, ``like``
    (a param tree) restores through the template with structure validation;
    ``like=None`` restores template-free (plain nested dicts) — required when
    the caller adapts layouts (scan vs per-layer) before merging."""
    from empirical_mvm_tpu.core.retry import retry_io
    if path.endswith(".msgpack"):
        from flax import serialization

        def read():
            with open(path, "rb") as f:
                return f.read()

        data = retry_io(read, what=f"ckpt read {path}")
        if like is None:
            return serialization.msgpack_restore(data)
        return serialization.from_bytes(like, data)
    if path.endswith(".npz"):
        return _unflatten(dict(np.load(path)))
    if path.endswith(".pt") or path.endswith(".pth") or path.endswith(".bin"):
        raise ValueError(
            "torch checkpoints must go through load_torch_violet_ckpt()")
    raise ValueError(f"unknown checkpoint format: {path}")


def save_train_state(state, path: str, meta: dict | None = None) -> None:
    """Full-resume checkpoint: params + optimizer state + step, with a
    double-buffered write (ref: utils/load_save.py:217-338 TrainingRestorer —
    dead code upstream, live here). Writes ``<path>`` then rotates the
    previous one to ``<path>.backup``."""
    import jax
    from flax import serialization

    os.makedirs(op.dirname(op.abspath(path)), exist_ok=True)
    host_state = jax.tree.map(np.asarray, state)
    blob = serialization.to_bytes(host_state)
    tmp = path + ".tmp"

    def write():
        with open(tmp, "wb") as f:
            f.write(blob)
        if op.exists(path):
            os.replace(path, path + ".backup")
        os.replace(tmp, path)

    from empirical_mvm_tpu.core.retry import retry_io
    retry_io(write, what=f"train-state write {path}")
    if meta is not None:
        with open(op.splitext(path)[0] + ".json", "w") as f:
            json.dump(meta, f, indent=2, default=str)


def load_train_state(path: str, like) -> Any:
    """Restore a full TrainState; falls back to the ``.backup`` buffer if the
    primary is corrupt (ref: utils/load_save.py restore-with-retry)."""
    from flax import serialization

    for candidate in (path, path + ".backup"):
        try:
            with open(candidate, "rb") as f:
                return serialization.from_bytes(like, f.read())
        except Exception as e:  # noqa: BLE001
            logger.warning("restore from %s failed: %s", candidate, e)
    raise FileNotFoundError(f"no restorable train state at {path}")


def load_torch_violet_ckpt(path: str, model_cfg, heads: dict[str, str]
                           | None = None) -> Any:
    """Ingest a released reference checkpoint (ref: model.py:295-353),
    including SwinBERT remapping when the filename says so
    (ref: model.py:306)."""
    import torch

    from empirical_mvm_tpu.models.torch_import import (
        remap_swinbert_keys, violet_params_from_torch)

    sd = torch.load(path, map_location="cpu")
    for wrapper in ("state_dict", "model", "module"):   # trainer wrappers
        if isinstance(sd, dict) and wrapper in sd \
                and isinstance(sd[wrapper], dict):
            sd = sd[wrapper]
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}
    if all(k.startswith("module.") for k in sd):        # DDP-wrapped save
        sd = {k[len("module."):]: v for k, v in sd.items()}
    if "SwinBERT" in op.basename(path):
        sd = remap_swinbert_keys(sd)
    return violet_params_from_torch(sd, model_cfg, heads=heads)
