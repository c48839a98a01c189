"""Jitted train/eval steps over the data mesh.

Replaces the reference's Agent forward/backward machinery
(ref: agent.py:161-201: AMP autocast, GradScaler, DDP/DeepSpeed wrap) with a
single jitted function: masking, forward, loss, grad, AdamW update — one XLA
program. The batch is sharded over the ``data`` mesh axis; params/opt state
are replicated (DDP-equivalent) so XLA emits the gradient all-reduce over ICI
automatically.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from empirical_mvm_tpu.parallel.mesh import batch_sharding, replicated


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def create_train_state(params: Any, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))


def make_pretrain_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh | None = None,
    donate: bool = True,
    state_shardings: "TrainState | None" = None,
) -> Callable:
    """Build the jitted pretrain step.

    ``batch``: dict with img (B,T,H,W,3) f32 normalized UNMASKED, txt (B,X)
    i32, mask (B,X) i32, optional vq (B,Lv) i32, hog (B,T,H,W) f32.
    Masking runs inside (see VioletPretrain.losses).
    """

    def step_fn(state: TrainState, batch: dict, rng: jax.Array):
        rng_step = jax.random.fold_in(rng, state.step)
        drop_rng, mask_rng = jax.random.split(rng_step)

        def loss_fn(params):
            ls, mut = model.apply(
                {"params": params},
                batch["img"], batch["txt"], batch["mask"],
                vq=batch.get("vq"), hog=batch.get("hog"),
                corrupt=batch.get("corrupt"),
                deterministic=False,
                method=model.losses,
                rngs={"dropout": drop_rng, "mask": mask_rng},
                mutable=["bn_stats"])   # train-mode BN batch statistics
            return ls["total"], (ls, mut.get("bn_stats", {}))

        grads, (ls, bn_stats) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if bn_stats:   # momentum-update BN running stats (torch semantics)
            from empirical_mvm_tpu.models.encoders2d import fold_bn_stats
            params = fold_bn_stats(params, bn_stats)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1)
        return new_state, ls

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    # replicated state = reference DDP-equivalent; a TrainState of
    # NamedShardings (from AgentBase / parallel.mesh.param_shardings with
    # fsdp=True) gives ZeRO-3-style param+moment sharding instead
    state_sh = (state_shardings if state_shardings is not None
                else TrainState(params=rep, opt_state=rep, step=rep))
    return jax.jit(
        step_fn,
        in_shardings=(state_sh, bsh, rep),
        out_shardings=(state_sh, rep),
        donate_argnums=(0,) if donate else ())


def make_eval_step(model, mesh: Mesh | None = None,
                   method: Callable | None = None) -> Callable:
    """Jitted deterministic forward for eval loops."""

    def eval_fn(params, batch):
        kwargs = dict(batch)
        return model.apply({"params": params}, **kwargs,
                           deterministic=True,
                           **({"method": method} if method else {}))

    if mesh is None:
        return jax.jit(eval_fn)
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(eval_fn, in_shardings=(rep, bsh))
