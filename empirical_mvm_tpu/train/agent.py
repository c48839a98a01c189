"""Training agents: per-task train/eval orchestration.

Parity target: ``Agent_Base`` and its task subclasses (ref: agent.py:52-211,
main_retrieval.py:87-124, main_qamc.py:105-183, main_qaoe.py:64-103,
main_pretrain.py:269-619) — epoch loops with zero-shot eval on startup,
periodic checkpointing by the main process, EMA loss meters, and per-epoch
best tracking.

TPU-native shape: an agent owns (model, optimizer, jitted step fns, mesh).
There is no DDP wrap / GradScaler / autocast — the jitted step from
train/train_step.py is the whole of it. Metrics that the reference
all-gathers across ranks (ref: main_qamc.py:172-175) are computed from
fully-replicated outputs here, so every host already has the global value.
"""

from __future__ import annotations

import logging
import math
import os
import time
from collections import defaultdict
from typing import Callable, Iterable

import jax
import numpy as np

from empirical_mvm_tpu.core.config import RunConfig
from empirical_mvm_tpu.parallel.mesh import (is_main_process, make_data_mesh,
                                             make_mesh, pad_batch,
                                             param_shardings, replicated,
                                             shard_batch)
from empirical_mvm_tpu.train import losses as L
from empirical_mvm_tpu.train.checkpoint import save_params
from empirical_mvm_tpu.train.optimizer import build_optimizer
from empirical_mvm_tpu.train.train_step import (TrainState, create_train_state,
                                                make_pretrain_train_step)

logger = logging.getLogger(__name__)


class RunningMeter:
    """EMA loss meter, smooth=0.99 (ref: utils/logger.py:164-186)."""

    def __init__(self, smooth: float = 0.99):
        self.smooth = smooth
        self._val: float | None = None

    def update(self, v: float) -> None:
        if math.isnan(v) or math.isinf(v):
            return
        self._val = (v if self._val is None
                     else self.smooth * self._val + (1 - self.smooth) * v)

    @property
    def val(self) -> float:
        return float("nan") if self._val is None else self._val


class AgentBase:
    """(ref: agent.py:52-211)"""

    def __init__(self, run_cfg: RunConfig, model, params, *,
                 mesh=None, group_fn=None, max_iter: int | None = None):
        self.cfg = run_cfg
        self.model = model
        tc = run_cfg.train
        # mesh size must divide the per-step batch (data-sharded inputs)
        self.mesh = mesh if mesh is not None else make_data_mesh(tc.size_batch)
        self.max_iter = max_iter or max(tc.max_iter, 1)
        kwargs = {}
        if group_fn is not None:
            kwargs["group_fn"] = group_fn
        self.tx = build_optimizer(
            params, lr=tc.lr, max_iter=self.max_iter,
            weight_decay=tc.decay, betas=tc.betas,
            warmup_ratio=tc.warmup_ratio, min_lr=tc.min_lr,
            max_grad_norm=tc.max_grad_norm,
            backbone_lr_mul=tc.vis_backbone_lr_mul,
            grad_accum=tc.grad_accum, freeze_prefixes=tuple(tc.freeze),
            **kwargs)
        self.state = create_train_state(params, self.tx)
        # state shardings: replicated (reference DDP-equivalent) or ZeRO-3
        # FSDP over the data mesh when TrainConfig.fsdp is set. Param AND
        # optimizer-moment leaves shard their largest divisible dim; XLA
        # all-gathers params just-in-time inside the jitted step.
        shard_rule = lambda tree: param_shardings(   # noqa: E731
            self.mesh, tree, fsdp=tc.fsdp, min_size_to_shard=tc.fsdp_min_size)
        self.state_sh = TrainState(
            params=shard_rule(self.state.params),
            opt_state=shard_rule(self.state.opt_state),
            step=replicated(self.mesh))
        self.state = jax.device_put(self.state, self.state_sh)
        self.global_step = 0
        self.meters: dict[str, RunningMeter] = defaultdict(RunningMeter)
        self.log: dict[str, list] = defaultdict(list)
        self.rng = jax.random.PRNGKey(tc.seed)
        from empirical_mvm_tpu.train.metrics import MetricsLogger
        self.metrics = (MetricsLogger(run_cfg.path_output, run_cfg.task)
                        if is_main_process() else None)
        self._build_steps()

    def _build_steps(self):
        """Subclasses install self.train_step / self.eval_step."""
        raise NotImplementedError

    # ---- loops ----

    # capture a jax profiler trace of steps [PROFILE_FROM, PROFILE_FROM+N)
    # when train.profile_n_steps > 0 (SURVEY §5: the reference has no
    # profiler; jax trace + xprof is the TPU-native upgrade)
    PROFILE_FROM = 3    # skip compile + warmup steps
    _profiling = False

    def _maybe_profile_start(self) -> None:
        prof_n = getattr(self.cfg.train, "profile_n_steps", 0)
        if (prof_n > 0 and not self._profiling
                and self.global_step == self.PROFILE_FROM):
            jax.profiler.start_trace(
                os.path.join(self.cfg.path_output, "profile"))
            self._profiling = True

    def _maybe_profile_stop(self, ls) -> None:
        prof_n = getattr(self.cfg.train, "profile_n_steps", 0)
        if self._profiling and self.global_step >= self.PROFILE_FROM + prof_n:
            jax.block_until_ready(ls)
            jax.profiler.stop_trace()
            self._profiling = False
            logger.info("profiler trace written to %s/profile",
                        self.cfg.path_output)

    def train_epoch(self, loader: Iterable, epoch: int) -> dict[str, float]:
        from empirical_mvm_tpu.data.loader import DevicePrefetcher
        t_start = time.time()
        n = 0
        pending: list[dict] = []   # device scalars; drained at logging steps
        stream = DevicePrefetcher(
            loader, lambda b: shard_batch(self.mesh, self._device_batch(b)))
        for _tag, sb in stream:
            self._maybe_profile_start()
            self.state, ls = self.train_step(self.state, sb, self.rng)
            self.global_step += 1
            n += 1
            self._maybe_profile_stop(ls)
            # don't block on the step result every iteration: calling
            # float(v) here would serialize host collate with device compute.
            # Buffer the device scalars and flush at logging_steps — the EMA
            # update order (and hence every logged value) is unchanged.
            pending.append(ls)
            if n % self.cfg.train.logging_steps == 0:
                self._drain_meters(pending)
                vals = {k: round(m.val, 4) for k, m in self.meters.items()}
                logger.info("ep %d step %d %s", epoch, self.global_step, vals)
                if self.metrics is not None:
                    self.metrics.log({f"train_{k}": v for k, v in vals.items()},
                                     self.global_step)
        self._drain_meters(pending)
        dt = time.time() - t_start
        out = {k: m.val for k, m in self.meters.items()}
        out["steps_per_sec"] = n / max(dt, 1e-9)
        return out

    def _drain_meters(self, pending: list[dict], prefix: str = "") -> None:
        for ls in pending:
            for k, v in ls.items():
                self.meters[prefix + k].update(float(v))
        pending.clear()

    def _device_batch(self, batch: dict) -> dict:
        """Strip non-numeric fields (video-id strings etc.) before device
        transfer."""
        return {k: v for k, v in batch.items()
                if (isinstance(v, np.ndarray)
                    and (np.issubdtype(v.dtype, np.number)
                         or v.dtype == np.bool_))   # e.g. the corrupt flag
                or isinstance(v, (int, float, bool, np.integer,
                                  np.floating, np.bool_))}

    def eval_batches(self, loader: Iterable):
        """Yield (host_batch, sharded_batch, n_valid): tail batches are padded
        to the training batch size so the jitted eval fn sees one shape."""
        for batch in loader:
            db = self._device_batch(batch)
            db, n_valid = pad_batch(db, self.cfg.train.size_batch)
            yield batch, shard_batch(self.mesh, db), n_valid

    def save(self, epoch: int, tag: str | None = None) -> None:
        """(ref: agent.py:134-141)"""
        if not is_main_process():
            return
        tag = tag or self.cfg.task
        path = os.path.join(self.cfg.path_output,
                            f"ckpt_violet_{tag}_{epoch}.msgpack")
        save_params(self.state.params, path,
                    meta={"epoch": epoch, "step": self.global_step,
                          "task": self.cfg.task})
        # log.json beside the checkpoints (ref: agent.py:141)
        import json
        with open(os.path.join(self.cfg.path_output, "log.json"), "w") as f:
            json.dump({k: v for k, v in self.log.items()}, f, indent=2,
                      default=float)
        logger.info("saved %s", path)

    def save_resumable(self, tag: str = "restore") -> None:
        """Full-resume checkpoint incl. optimizer state (double-buffered)."""
        if not is_main_process():
            return
        from empirical_mvm_tpu.train.checkpoint import save_train_state
        path = os.path.join(self.cfg.path_output, f"{tag}.state")
        save_train_state(self.state, path,
                         meta={"step": self.global_step,
                               "task": self.cfg.task})

    def resume(self, tag: str = "restore") -> bool:
        """Restore params+optimizer+step if a resume checkpoint exists."""
        from empirical_mvm_tpu.train.checkpoint import load_train_state
        path = os.path.join(self.cfg.path_output, f"{tag}.state")
        if not (os.path.exists(path) or os.path.exists(path + ".backup")):
            return False
        self.state = jax.device_put(load_train_state(path, self.state),
                                    self.state_sh)
        self.global_step = int(self.state.step)
        logger.info("resumed from %s at step %d", path, self.global_step)
        return True

    def fit(self, dl_tr, dl_vl=None, dl_ts=None,
            eval_fn: Callable | None = None) -> None:
        """Epoch driver with zero-shot eval + best tracking
        (ref: main_qamc_tsv_mlm_gen_ans_idx.py:158-185)."""
        if eval_fn is not None:
            zs = {s: eval_fn(self.state.params, dl)
                  for s, dl in (("vl", dl_vl), ("ts", dl_ts)) if dl is not None}
            logger.info("zero-shot: %s", zs)
        for ep in range(1, self.cfg.train.size_epoch + 1):
            if hasattr(dl_tr, "set_epoch"):
                dl_tr.set_epoch(ep)
            tr = self.train_epoch(dl_tr, ep)
            self.log["ls_tr"].append(tr)
            if eval_fn is not None:
                for s, dl in (("vl", dl_vl), ("ts", dl_ts)):
                    if dl is not None:
                        self.log[f"ac_{s}"].append(eval_fn(self.state.params, dl))
            logger.info("ep %d done: %s", ep,
                        {k: v[-1] for k, v in self.log.items() if v})
            self.save(ep)

    def best_epoch(self) -> tuple[tuple[int, float], tuple[int, float]]:
        """(ref: agent.py:203-210)"""
        vl = [m if np.isscalar(m) else list(m.values())[0]
              for m in self.log["ac_vl"]]
        ts = [m if np.isscalar(m) else list(m.values())[0]
              for m in self.log["ac_ts"]]
        iv, it = int(np.argmax(vl)), int(np.argmax(ts))
        return (iv, vl[iv]), (it, ts[it])


class PretrainAgent(AgentBase):
    """(ref: Agent_Pretrain at main_pretrain.py:269-610)"""

    def _build_steps(self):
        self.train_step = make_pretrain_train_step(
            self.model, self.tx, mesh=self.mesh,
            state_shardings=self.state_sh)

    def make_val_fn(self, val_loaders: dict[str, Iterable],
                    max_batches: int = 16) -> Callable:
        """Validation-loss evaluator over the val loaders (ref:
        main_pretrain_yaml.py:106-149 ``evaluate``, called at startup and
        every eval_step at :168-176,286-293). Deterministic forward (no
        dropout) with a FIXED masking key, so the same tokens/patches are
        masked at every eval and the val losses are comparable across steps.
        Tail batches are padded to the train batch size (padding rows repeat
        the last sample; like the reference's drop_last=False loader they
        shift the mean slightly, identically at every eval)."""
        from empirical_mvm_tpu.parallel.mesh import batch_sharding
        model = self.model
        rep = replicated(self.mesh)
        bsh = batch_sharding(self.mesh)

        def val_step(params, batch, rng):
            return model.apply(
                {"params": params}, batch["img"], batch["txt"], batch["mask"],
                vq=batch.get("vq"), hog=batch.get("hog"),
                corrupt=batch.get("corrupt"), deterministic=True,
                method=model.losses, rngs={"mask": rng})

        jit_val = jax.jit(val_step,
                          in_shardings=(self.state_sh.params, bsh, rep))
        fixed_rng = jax.random.PRNGKey(self.cfg.train.seed + 1)

        def eval_fn(params):
            out: dict[str, float] = {}
            for name, dl in val_loaders.items():
                sums: dict[str, float] = defaultdict(float)
                cnt = 0
                for batch, _ in zip(iter(dl), range(max_batches)):
                    db = self._device_batch(batch)
                    db, _ = pad_batch(db, self.cfg.train.size_batch)
                    sb = shard_batch(self.mesh, db)
                    ls = jit_val(params, sb, fixed_rng)
                    for k, v in ls.items():
                        sums[k] += float(v)
                    cnt += 1
                for k, s in sums.items():
                    out[f"{name}/{k}"] = s / max(cnt, 1)
                # the reference evaluates the FULL val loader
                # (main_pretrain_yaml.py:106-149); we subsample to
                # max_batches — log how many batches the numbers cover so
                # the subsampling is visible next to the metrics
                out[f"{name}/n_batches"] = float(cnt)
            return out

        return eval_fn

    def _log_eval(self, results: dict[str, float]) -> None:
        logger.info("val @%d: %s",
                    self.global_step,
                    {k: round(v, 4) for k, v in results.items()})
        if self.metrics is not None:
            self.metrics.log({f"val_{k}": v for k, v in results.items()},
                             self.global_step)

    def run_meta(self, meta_loader, num_steps: int,
                 eval_every: int = 0, eval_fn=None) -> None:
        """MetaLoader-driven pretraining (ref: main_pretrain_yaml.py:151-194).
        ``eval_fn(params) -> dict`` runs zero-shot at startup and every
        ``eval_every`` steps (ref: main_pretrain_yaml.py:168-176,286-293)."""
        from empirical_mvm_tpu.data.loader import DevicePrefetcher
        if eval_fn is not None:
            self._log_eval(eval_fn(self.state.params))   # zero-shot
        stream = DevicePrefetcher(
            iter(meta_loader),
            lambda b: shard_batch(self.mesh, self._device_batch(b)))
        pending: list[tuple[str, dict]] = []
        for (task, sb), _ in zip(iter(stream), range(num_steps)):
            self._maybe_profile_start()
            self.state, ls = self.train_step(self.state, sb, self.rng)
            self.global_step += 1
            self._maybe_profile_stop(ls)
            pending.append((task, ls))   # defer host sync (see train_epoch)
            if self.global_step % self.cfg.train.logging_steps == 0:
                for t, dls in pending:
                    self._drain_meters([dls], prefix=f"{t}/")
                pending.clear()
                vals = {k: round(m.val, 4) for k, m in self.meters.items()}
                logger.info("step %d %s", self.global_step, vals)
                if self.metrics is not None:
                    self.metrics.log({f"train_{k}": v for k, v in vals.items()},
                                     self.global_step)
            if eval_every and self.global_step % eval_every == 0:
                if eval_fn is not None:
                    self._log_eval(eval_fn(self.state.params))
                self.save(self.global_step, tag="pretrain")
                self.save_resumable()
        for t, dls in pending:
            self._drain_meters([dls], prefix=f"{t}/")
        pending.clear()


def make_supervised_agent(loss_kind: str):
    """Agent factory for the downstream heads. ``loss_kind``:
    'ce'        — logits (B, K) vs int answers (qamc/qaoe, ref main_qamc.py:147)
    'mlm'       — logits (B, X, V) vs mask_ans (qamc-gen/qaoe-mlm,
                  ref main_qamc_tsv_mlm_gen_ans_idx.py:113-117)
    'nce'       — (B, B) scores, NormSoftmaxLoss (retrieval,
                  ref main_retrieval.py:91-99)
    """

    class SupervisedAgent(AgentBase):
        def _build_steps(self):
            import optax
            from empirical_mvm_tpu.parallel.mesh import batch_sharding
            model, tx, temp = self.model, self.tx, self.cfg.train.temp

            def step_fn(state, batch, rng):
                rng_step = jax.random.fold_in(rng, state.step)

                def loss_fn(p):
                    out, mut = model.apply(
                        {"params": p}, batch["img"], batch["txt"],
                        batch["mask"], deterministic=False,
                        rngs={"dropout": rng_step},
                        mutable=["bn_stats"])   # train-mode BN batch stats
                    bn = mut.get("bn_stats", {})
                    if loss_kind == "nce":
                        return L.norm_softmax_loss(out, temp), bn
                    if loss_kind == "mlm":
                        return L.cross_entropy_ignore(
                            out, batch["mask_ans"]), bn
                    return L.cross_entropy_ignore(out, batch["ans"]), bn

                (loss, bn_stats), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params)
                updates, opt_state = tx.update(grads, state.opt_state,
                                               state.params)
                params = optax.apply_updates(state.params, updates)
                if bn_stats:   # momentum-update BN running stats (torch
                    from empirical_mvm_tpu.models.encoders2d import \
                        fold_bn_stats   # semantics, ref resnet50.py:18-21)
                    params = fold_bn_stats(params, bn_stats)
                return (TrainState(params, opt_state, state.step + 1),
                        {"total": loss})

            rep = replicated(self.mesh)
            bsh = batch_sharding(self.mesh)
            st_sh = self.state_sh   # replicated, or FSDP when cfg.train.fsdp
            self.train_step = jax.jit(
                step_fn, in_shardings=(st_sh, bsh, rep),
                out_shardings=(st_sh, rep), donate_argnums=(0,))
            self.eval_forward = jax.jit(
                lambda p, img, txt, mask: model.apply(
                    {"params": p}, img, txt, mask, deterministic=True),
                in_shardings=(st_sh.params, bsh, bsh, bsh))

    return SupervisedAgent


RetrievalAgent = make_supervised_agent("nce")
QAMCAgent = make_supervised_agent("ce")
QAMCGenAgent = make_supervised_agent("mlm")
QAOEAgent = make_supervised_agent("ce")
QAOEMLMAgent = make_supervised_agent("mlm")
