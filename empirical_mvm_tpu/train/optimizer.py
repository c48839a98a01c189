"""Optimizer + LR schedule: AdamW(0.9, 0.98) with the reference's 4 param
groups and warmup-linear decay.

Parity targets:
* ``WarmupLinearLR`` (ref: agent.py:13-32): linear warmup over 10% of
  max_iter, then linear decay to 0, floored at min_lr.
* ``Agent_Base.build_optimizer`` (ref: agent.py:84-113): {swin vs rest} x
  {decay vs no-decay(bias / LayerNorm)} groups, with a backbone LR multiplier.
  The torch rule is a *substring* match: any param whose name contains
  "bias" skips weight decay — which includes relative_position_bias_table —
  and we preserve exactly that.
* global grad-norm clip before the update (ref: agent.py:187-189).
* head-LR variant used by QAMC (ref: main_qamc.py:111-141) via ``group_fn``.

No GradScaler: bf16 on TPU needs no loss scaling (params/optimizer fp32,
compute bf16) — this replaces the reference's AMP/DeepSpeed fp16 machinery
(ref: agent.py:60,186-191, utils/deepspeed.py:42-67) entirely.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import optax


def warmup_linear_factor(max_iter: int, warmup_ratio: float = 0.1):
    """The un-floored warmup/decay factor in [0, 1] (ref: agent.py:13-32)."""
    warmup = int(warmup_ratio * max_iter)

    def factor(step):
        step = jax.numpy.minimum(step, max_iter)
        warm = jax.numpy.maximum(0.0, step / max(warmup, 1))
        decay = jax.numpy.maximum(0.0, (max_iter - step) / max(max_iter - warmup, 1))
        return jax.numpy.where(step < warmup, warm, decay)

    return factor


def warmup_linear_schedule(base_lr: float, max_iter: int,
                           warmup_ratio: float = 0.1,
                           min_lr: float = 1e-8) -> optax.Schedule:
    """(ref: agent.py:13-32)"""
    factor = warmup_linear_factor(max_iter, warmup_ratio)

    def schedule(step):
        return jax.numpy.maximum(min_lr, base_lr * factor(step))

    return schedule


# Frozen-teacher modules, always excluded from updates. The reference runs
# its MVM teachers under ``model.eval()`` + ``torch.no_grad()``
# (ref: main_pretrain.py:515-545), so their params reach torch AdamW with
# ``grad is None`` and are SKIPPED outright — no moment state, no decoupled
# weight decay. Without the equivalent label here, optax.adamw would carry
# (mu, nu) for the 88M-param feature teacher (~700MB HBM + ~11ms/step of
# moment updates, round-3 profile) and its weight decay would silently
# shrink the frozen teacher in place every step.
TEACHER_PREFIXES = ("feature_model", "dpt", "raft", "dvae",
                    "clip_model")


def _is_frozen(name: str, freeze_prefixes: tuple[str, ...]) -> bool:
    for pre in freeze_prefixes:         # user prefixes: path-prefix match
        if name == pre or name.startswith(pre + "."):
            return True
    for mod in TEACHER_PREFIXES:        # teacher modules: any tree position
        if name == mod or name.startswith(mod + ".") or (
                "." + mod + ".") in name:
            return True
    return False


def default_group_fn(path: tuple[str, ...]) -> str:
    """Reference grouping (ref: agent.py:86-95): substring 'bias' or a
    LayerNorm parameter -> no decay; 'swin' in the path -> backbone group.
    flax LayerNorm weights are named 'scale' (torch: LayerNorm.weight)."""
    name = ".".join(path)
    leaf = path[-1]
    no_decay = ("bias" in leaf) or (leaf == "scale")
    is_swin = "swin" in name
    return f"{'swin' if is_swin else 'other'}_{'nodecay' if no_decay else 'decay'}"


def head_group_fn(path: tuple[str, ...]) -> str:
    """QAMC variant (ref: main_qamc.py:118-123): head params ('fc.*') get the
    multiplier instead of the backbone."""
    leaf = path[-1]
    no_decay = ("bias" in leaf) or (leaf == "scale")
    is_head = path[0] == "fc"
    return f"{'swin' if is_head else 'other'}_{'nodecay' if no_decay else 'decay'}"


def build_optimizer(
    params: Any,
    lr: float,
    max_iter: int,
    weight_decay: float = 1e-3,
    betas: tuple[float, float] = (0.9, 0.98),
    warmup_ratio: float = 0.1,
    min_lr: float = 1e-8,
    max_grad_norm: float = 1.0,
    backbone_lr_mul: float = 1.0,
    group_fn: Callable[[tuple[str, ...]], str] = default_group_fn,
    grad_accum: int = 1,
    freeze_prefixes: tuple[str, ...] = (),
) -> optax.GradientTransformation:
    """(ref: agent.py:84-113,181-193). ``freeze_prefixes`` excludes any param
    whose path starts with one of the prefixes from updates — the optax
    equivalent of the reference's requires_grad=False freeze helpers
    (ref: model.py:163-172, args.py:59 --freeze_violet)."""

    def label_one(path: tuple[str, ...]) -> str:
        name = ".".join(path)
        if _is_frozen(name, freeze_prefixes):
            return "frozen"
        return group_fn(path)

    def labels(tree):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: label_one(
                tuple(p.key for p in path if hasattr(p, "key"))), tree)

    def adamw(mul: float, wd: float) -> optax.GradientTransformation:
        return optax.adamw(
            learning_rate=warmup_linear_schedule(lr * mul, max_iter,
                                                 warmup_ratio, min_lr),
            b1=betas[0], b2=betas[1], eps=1e-8, weight_decay=wd)

    tx = optax.chain(
        optax.clip_by_global_norm(max_grad_norm) if max_grad_norm > 0
        else optax.identity(),
        optax.multi_transform(
            {"swin_decay": adamw(backbone_lr_mul, weight_decay),
             "swin_nodecay": adamw(backbone_lr_mul, 0.0),
             "other_decay": adamw(1.0, weight_decay),
             "other_nodecay": adamw(1.0, 0.0),
             "frozen": optax.set_to_zero()},
            labels),
    )
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx
