"""Convert released PyTorch VIOLET checkpoints to native flax msgpack.

The reference loads ``.pt`` state-dicts at model-build time
(ref: model.py:295-353); here a one-shot converter materializes the flax
param tree so training/eval jobs start from the fast native format and the
torch dependency stays out of the serving path.

Usage:
  python -m empirical_mvm_tpu.cli.convert_ckpt \
      --src ckpt_violet_pretrain.pt --dst violet_pretrain.msgpack \
      [--config configs/msrvtt-retrieval.json] [--heads fc=score_head]

``--heads`` maps reference head prefixes to our module names the same way the
task CLIs do (e.g. ``fc=score_head fc_mtm=mlm_head``).
"""

from __future__ import annotations

import argparse
import logging

logger = logging.getLogger(__name__)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help=".pt/.pth/.bin torch ckpt")
    ap.add_argument("--dst", required=True, help=".msgpack or .npz output")
    ap.add_argument("--config", default=None,
                    help="task JSON for model geometry (pos-emb slicing); "
                         "defaults to the base VIOLET geometry")
    ap.add_argument("--heads", nargs="*", default=[],
                    metavar="TORCH=FLAX", help="head prefix remaps")
    args = ap.parse_args()

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(levelname)s %(message)s")

    from empirical_mvm_tpu.core.config import ModelConfig, load_run_config
    from empirical_mvm_tpu.train.checkpoint import (load_torch_violet_ckpt,
                                                    save_params)

    if args.config:
        model_cfg = load_run_config(args.config).model
    else:
        model_cfg = ModelConfig()
    heads = dict(kv.split("=", 1) for kv in args.heads) or None

    params = load_torch_violet_ckpt(args.src, model_cfg, heads=heads)
    save_params(params, args.dst, meta={"source": args.src})
    import jax
    n = sum(x.size for x in jax.tree.leaves(params))
    logger.info("wrote %s (%d params, %.1f MB)", args.dst, n, n * 4 / 1e6)


if __name__ == "__main__":
    main()
