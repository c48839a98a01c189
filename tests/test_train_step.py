"""Integration tests: pretrain train step on an 8-device CPU mesh.

Exercises the full stack — vectorized masking inside the jitted step, VIOLET
forward with in-batch VTM negatives, all-loss backward, 4-group AdamW with
warmup-linear — the TPU-native replacement for ref agent.py:161-201.
"""

import numpy as np
import pytest

import tests.conftest  # noqa: F401

import jax
import jax.numpy as jnp

from empirical_mvm_tpu.core.config import BertConfig, ModelConfig, SwinConfig
from empirical_mvm_tpu.models.pretrain import VioletPretrain
from empirical_mvm_tpu.parallel.mesh import make_mesh, shard_batch
from empirical_mvm_tpu.train.optimizer import (
    build_optimizer, default_group_fn, warmup_linear_schedule)
from empirical_mvm_tpu.train.train_step import (
    create_train_state, make_pretrain_train_step)

TINY_BERT = BertConfig(vocab_size=200, hidden_size=32, num_hidden_layers=2,
                       num_attention_heads=4, intermediate_size=64)
TINY_SWIN = SwinConfig(embed_dim=8, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8),
                       drop_path_rate=0.1)


def _cfg():
    return ModelConfig(size_img=64, size_frame=2, size_txt=8,
                       fusion=TINY_BERT, text=TINY_BERT, swin_custom=TINY_SWIN)


def _batch(b=8):
    rs = np.random.RandomState(0)
    h = w = 2
    lv = 2 * (1 + h * w)
    vq = rs.randint(0, 8192, (b, lv)).astype(np.int32)
    vq[:, ::1 + h * w] = -1
    return {
        "img": rs.rand(b, 2, 64, 64, 3).astype(np.float32),
        "txt": rs.randint(5, 200, (b, 8)).astype(np.int32),
        "mask": np.ones((b, 8), np.int32),
        "vq": vq,
        "hog": rs.rand(b, 2, 64, 64).astype(np.float32),
    }


def test_warmup_linear_schedule_matches_reference():
    # (ref: agent.py:13-32) 10% warmup then linear decay
    s = warmup_linear_schedule(1.0, 100, warmup_ratio=0.1, min_lr=1e-8)
    assert float(s(0)) == pytest.approx(0.0, abs=1e-7)
    assert float(s(5)) == pytest.approx(0.5)
    assert float(s(10)) == pytest.approx(1.0)
    assert float(s(55)) == pytest.approx(0.5)
    assert float(s(100)) == pytest.approx(1e-8)
    assert float(s(200)) == pytest.approx(1e-8)


def test_group_fn_matches_reference_rules():
    # (ref: agent.py:86-95) substring 'bias' / LayerNorm -> no decay
    assert default_group_fn(("enc_img", "swin", "layers_0", "blocks_0",
                             "attn", "qkv", "kernel")) == "swin_decay"
    assert default_group_fn(("enc_img", "swin", "norm", "scale")) == "swin_nodecay"
    assert default_group_fn(("enc_img", "swin", "layers_0", "blocks_0", "attn",
                             "relative_position_bias_table")) == "swin_nodecay"
    assert default_group_fn(("trsfr", "layer_0", "output", "bias")) == "other_nodecay"
    assert default_group_fn(("fc", "fc1", "kernel")) == "other_decay"
    assert default_group_fn(("enc_img", "emb_cls")) == "other_decay"


@pytest.mark.parametrize("mvm_target", [("pixel",), ("pixel", "hog", "vq")])
def test_pretrain_step_runs_and_learns(mvm_target):
    cfg = _cfg()
    model = VioletPretrain(config=cfg, mvm_target=mvm_target,
                           pretrain_masks=("bm", "rm"))
    batch = _batch()
    init_rng = jax.random.PRNGKey(0)
    # jit the init: eager flax init dispatches thousands of tiny CPU ops
    params = jax.jit(lambda: model.init(
        {"params": init_rng, "dropout": init_rng, "mask": init_rng},
        jnp.asarray(batch["img"]), jnp.asarray(batch["txt"]),
        jnp.asarray(batch["mask"]), vq=jnp.asarray(batch["vq"]),
        hog=jnp.asarray(batch["hog"]), method=model.losses)["params"])()

    mesh = make_mesh(8)
    tx = build_optimizer(params, lr=1e-3, max_iter=50, max_grad_norm=1.0)
    step = make_pretrain_train_step(model, tx, mesh=mesh, donate=False)
    state = create_train_state(params, tx)
    sharded = shard_batch(mesh, batch)

    losses = []
    rng = jax.random.PRNGKey(1)
    for i in range(6):
        state, ls = step(state, sharded, rng)
        losses.append(float(ls["total"]))
        for k, v in ls.items():
            assert np.isfinite(float(v)), f"{k} not finite at step {i}"
    assert int(state.step) == 6
    # training signal: loss decreases from a random init. Compare the mean
    # of the last two steps against the max of the first two — robust to a
    # single noisy step under any PRNG stream (rbg vs threefry).
    assert np.mean(losses[-2:]) < max(losses[:2]), losses
    if "vq" in mvm_target:
        assert any(np.isfinite(l) for l in losses)


def test_pretrain_losses_have_expected_keys():
    cfg = _cfg()
    model = VioletPretrain(config=cfg, mvm_target=("pixel", "hog", "vq"),
                           pretrain_tasks=("mtm", "vtm", "mvm", "smtm"))
    batch = _batch(b=4)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1), "mask": jax.random.PRNGKey(2)}
    variables = jax.jit(lambda: model.init(
        rngs, jnp.asarray(batch["img"]), jnp.asarray(batch["txt"]),
        jnp.asarray(batch["mask"]), vq=jnp.asarray(batch["vq"]),
        hog=jnp.asarray(batch["hog"]), method=model.losses))()
    ls = jax.jit(lambda v: model.apply(
        v, jnp.asarray(batch["img"]), jnp.asarray(batch["txt"]),
        jnp.asarray(batch["mask"]), vq=jnp.asarray(batch["vq"]),
        hog=jnp.asarray(batch["hog"]), method=model.losses,
        rngs={"dropout": jax.random.PRNGKey(3),
              "mask": jax.random.PRNGKey(4)}))(variables)
    assert set(ls) == {"mtm", "vtm", "smtm", "mvm_pixel", "mvm_hog", "mvm_vq",
                       "total"}


def test_pretrain_on_the_fly_teachers():
    """vq-on-the-fly (dVAE submodule) + on-device HOG + 3d_feature targets
    all produce finite losses without any precomputed teacher inputs."""
    cfg = _cfg()
    model = VioletPretrain(config=cfg, mvm_target=("hog", "vq"),
                           vq_on_the_fly=True, pretrain_masks=("rm",))
    batch = _batch(b=4)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1), "mask": jax.random.PRNGKey(2)}
    ls = jax.jit(lambda: model.apply(
        jax.jit(lambda: model.init(
            rngs, jnp.asarray(batch["img"]), jnp.asarray(batch["txt"]),
            jnp.asarray(batch["mask"]), method=model.losses))(),
        jnp.asarray(batch["img"]), jnp.asarray(batch["txt"]),
        jnp.asarray(batch["mask"]), method=model.losses,
        rngs={"dropout": jax.random.PRNGKey(3),
              "mask": jax.random.PRNGKey(4)}))()
    assert {"mvm_hog", "mvm_vq"} <= set(ls)
    for k, v in ls.items():
        assert np.isfinite(float(v)), k


def test_pretrain_optical_flow_target():
    """RAFT teacher wired into the pretrain loss (ref main_pretrain.py:386-419).
    Needs a 128^2 clip so every corr-pyramid level is >= 2x2."""
    cfg = ModelConfig(size_img=128, size_frame=2, size_txt=8,
                      fusion=TINY_BERT, text=TINY_BERT, swin_custom=TINY_SWIN)
    model = VioletPretrain(config=cfg, mvm_target=("optical_flow",),
                           pretrain_masks=("rm",))
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(2, 2, 128, 128, 3).astype(np.float32))
    txt = jnp.asarray(rs.randint(5, 200, (2, 8)).astype(np.int32))
    mask = jnp.ones((2, 8), jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1), "mask": jax.random.PRNGKey(2)}
    variables = jax.jit(lambda: model.init(rngs, img, txt, mask,
                                           method=model.losses))()
    ls = jax.jit(lambda v: model.apply(
        v, img, txt, mask, method=model.losses,
        rngs={"dropout": jax.random.PRNGKey(3),
              "mask": jax.random.PRNGKey(4)}))(variables)
    assert "mvm_flow" in ls
    for k, v in ls.items():
        assert np.isfinite(float(v)), k


@pytest.mark.slow
def test_pretrain_depth_target():
    """DPT teacher wired into the pretrain loss (ref main_pretrain.py:433-452).
    Full DPT-Large on CPU => slow-marked."""
    cfg = _cfg()
    model = VioletPretrain(config=cfg, mvm_target=("depth",),
                           pretrain_masks=("rm",))
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(2, 2, 64, 64, 3).astype(np.float32))
    txt = jnp.asarray(rs.randint(5, 200, (2, 8)).astype(np.int32))
    mask = jnp.ones((2, 8), jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1), "mask": jax.random.PRNGKey(2)}
    variables = jax.jit(lambda: model.init(rngs, img, txt, mask,
                                           method=model.losses))()
    ls = jax.jit(lambda v: model.apply(
        v, img, txt, mask, method=model.losses,
        rngs={"dropout": jax.random.PRNGKey(3),
              "mask": jax.random.PRNGKey(4)}))(variables)
    assert "mvm_depth" in ls
    for k, v in ls.items():
        assert np.isfinite(float(v)), k


def test_save_and_resume_train_state(tmp_path):
    """Double-buffered full-state resume (params+opt+step survive, corrupt
    primary falls back to backup)."""
    from empirical_mvm_tpu.train.checkpoint import (load_train_state,
                                                    save_train_state)
    cfg = _cfg()
    model = VioletPretrain(config=cfg, mvm_target=("pixel",),
                           pretrain_masks=("rm",))
    batch = _batch(b=4)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(lambda: model.init(
        {"params": rng, "dropout": rng, "mask": rng},
        jnp.asarray(batch["img"]), jnp.asarray(batch["txt"]),
        jnp.asarray(batch["mask"]), method=model.losses)["params"])()
    tx = build_optimizer(params, lr=1e-3, max_iter=10)
    step = make_pretrain_train_step(model, tx, mesh=None, donate=False)
    state = create_train_state(params, tx)
    db = {k: jnp.asarray(v) for k, v in batch.items()}
    state, _ = step(state, db, rng)
    state, _ = step(state, db, rng)

    path = str(tmp_path / "restore.state")
    save_train_state(state, path, meta={"step": 2})
    save_train_state(state, path)              # rotates first into .backup
    import os
    assert os.path.exists(path) and os.path.exists(path + ".backup")

    template = create_train_state(params, tx)
    restored = load_train_state(path, template)
    assert int(restored.step) == 2
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # corrupt primary -> backup used
    with open(path, "wb") as f:
        f.write(b"garbage" if isinstance(b"garbage", bytes) else b"x")
    restored2 = load_train_state(path, template)
    assert int(restored2.step) == 2


def test_pretrain_am_masking_end_to_end():
    """'am' masking runs the extra attention forward inside the step
    (ref main_pretrain.py:320-343)."""
    cfg = _cfg()
    model = VioletPretrain(config=cfg, mvm_target=("pixel",),
                           pretrain_masks=("am", "rm"))
    batch = _batch(b=4)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1), "mask": jax.random.PRNGKey(2)}
    variables = jax.jit(lambda: model.init(
        rngs, jnp.asarray(batch["img"]), jnp.asarray(batch["txt"]),
        jnp.asarray(batch["mask"]), vq=jnp.asarray(batch["vq"]),
        method=model.losses))()
    ls = jax.jit(lambda v: model.apply(
        v, jnp.asarray(batch["img"]), jnp.asarray(batch["txt"]),
        jnp.asarray(batch["mask"]), vq=jnp.asarray(batch["vq"]),
        method=model.losses,
        rngs={"dropout": jax.random.PRNGKey(3),
              "mask": jax.random.PRNGKey(4)}))(variables)
    for k, v in ls.items():
        assert np.isfinite(float(v)), k


def test_pretrain_accepts_uint8_clips():
    """Raw uint8 clips normalize on device (ops/preprocess.py) and give the
    same losses as host-normalized fp32 input."""
    from empirical_mvm_tpu.ops.preprocess import IMAGENET_MEAN, IMAGENET_STD
    cfg = _cfg()
    model = VioletPretrain(config=cfg, mvm_target=("pixel",),
                           pretrain_masks=("rm",))
    rs = np.random.RandomState(0)
    u8 = rs.randint(0, 256, (2, 2, 64, 64, 3)).astype(np.uint8)
    f32 = ((u8.astype(np.float32) / 255.0) - IMAGENET_MEAN) / IMAGENET_STD
    txt = jnp.asarray(rs.randint(5, 200, (2, 8)).astype(np.int32))
    mask = jnp.ones((2, 8), jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1), "mask": jax.random.PRNGKey(2)}
    variables = jax.jit(lambda: model.init(
        rngs, jnp.asarray(f32), txt, mask, method=model.losses))()
    run = lambda im: jax.jit(lambda v: model.apply(
        v, im, txt, mask, method=model.losses,
        rngs={"dropout": jax.random.PRNGKey(3),
              "mask": jax.random.PRNGKey(4)}))(variables)
    ls_f = run(jnp.asarray(f32))
    ls_u = run(jnp.asarray(u8))
    for k in ls_f:
        assert float(ls_f[k]) == pytest.approx(float(ls_u[k]), rel=1e-4), k


def test_device_batch_keeps_bool_corrupt_flag():
    """The corrupt flag (B,) bool must survive AgentBase._device_batch —
    it drives on-device zeroing of corrupt clips after normalization."""
    import numpy as np

    from empirical_mvm_tpu.train.agent import AgentBase

    batch = {"img": np.zeros((2, 1, 8, 8, 3), np.uint8),
             "txt": np.zeros((2, 4), np.int32),
             "corrupt": np.array([True, False]),
             "vid": ["a", "b"]}
    out = AgentBase._device_batch(None, batch)
    assert "corrupt" in out and out["corrupt"].dtype == np.bool_
    assert "vid" not in out


def test_frozen_teacher_params_skipped_by_optimizer():
    """MVM teacher modules must be excluded from AdamW entirely — the
    reference runs them under eval() + torch.no_grad() (ref:
    main_pretrain.py:515-545), so torch's AdamW sees grad=None and skips
    them: no moment state and, crucially, no decoupled weight decay. A
    labeling miss here silently DECAYS the frozen teacher every step (zero
    grads don't protect against optax.adamw's weight_decay term) and was
    worth ~11 ms/step of moment updates for the 88M-param 2d_feature
    teacher (round-3 profile)."""
    import optax

    from empirical_mvm_tpu.train.optimizer import build_optimizer

    rs = np.random.RandomState(0)
    params = {
        "feature_model": {"layers_0": {"kernel": rs.randn(4, 4).astype(np.float32)}},
        "dpt": {"proj": {"kernel": rs.randn(4, 4).astype(np.float32)}},
        "fc_mvm": {"kernel": rs.randn(4, 4).astype(np.float32),
                   "bias": np.zeros(4, np.float32)},
    }
    params = jax.tree.map(jnp.asarray, params)
    # zero grads everywhere: exactly what stop_gradient produces for the
    # teachers; any param motion can only come from weight decay
    grads = jax.tree.map(jnp.zeros_like, params)

    for build in (build_optimizer,):
        tx = build(params, lr=1e-2, max_iter=10, weight_decay=0.5,
                   warmup_ratio=0.0)
        state = tx.init(params)
        new_params = params
        for _ in range(3):
            updates, state = tx.update(grads, state, new_params)
            new_params = optax.apply_updates(new_params, updates)
        name = build.__name__
        np.testing.assert_array_equal(
            np.asarray(new_params["feature_model"]["layers_0"]["kernel"]),
            np.asarray(params["feature_model"]["layers_0"]["kernel"]),
            err_msg=f"{name}: frozen teacher decayed")
        np.testing.assert_array_equal(
            np.asarray(new_params["dpt"]["proj"]["kernel"]),
            np.asarray(params["dpt"]["proj"]["kernel"]),
            err_msg=f"{name}: frozen teacher decayed")
        # the TRAINED head must still feel weight decay
        assert not np.allclose(
            np.asarray(new_params["fc_mvm"]["kernel"]),
            np.asarray(params["fc_mvm"]["kernel"])), name

    # multi_transform must hold NO adam moments for the frozen teachers
    tx = build_optimizer(params, lr=1e-2, max_iter=10)
    state = tx.init(params)
    leaves = jax.tree.leaves(state)
    n_param_elems = sum(np.size(l) for l in jax.tree.leaves(params))
    n_state_elems = sum(np.size(l) for l in leaves)
    n_trained = sum(np.size(l) for k in ("fc_mvm",)
                    for l in jax.tree.leaves(params[k]))
    # mu + nu for trained params only, plus scalar counts
    assert n_state_elems <= 2 * n_trained + 64, (
        f"optimizer holds state for frozen params: {n_state_elems} elems "
        f"vs {n_param_elems} params, {n_trained} trained")


def test_pretrain_2d_clip_target():
    """Frozen CLIP teacher wired into the pretrain loss — the paper's 8th
    MVM target family (README-advertised upstream, no reference code
    branch). Checks the loss exists, is finite, the CLIP teacher is
    excluded from the optimizer, and the student head still gets grads."""
    from empirical_mvm_tpu.train.optimizer import build_optimizer

    cfg = _cfg()
    model = VioletPretrain(config=cfg, mvm_target=("2d_clip",),
                           pretrain_masks=("rm",),
                           clip_arch=(48, 2, 4, 96))  # tiny teacher for CPU
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(2, 2, 64, 64, 3).astype(np.float32))
    txt = jnp.asarray(rs.randint(5, 200, (2, 8)).astype(np.int32))
    mask = jnp.ones((2, 8), jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1), "mask": jax.random.PRNGKey(2)}
    variables = jax.jit(lambda: model.init(rngs, img, txt, mask,
                                           method=model.losses))()
    assert "clip_model" in variables["params"]
    ls = jax.jit(lambda v: model.apply(
        v, img, txt, mask, method=model.losses,
        rngs={"dropout": jax.random.PRNGKey(3),
              "mask": jax.random.PRNGKey(4)}))(variables)
    assert "mvm_2d_clip" in ls
    for k, v in ls.items():
        assert np.isfinite(float(v)), k

    # frozen-teacher exclusion (same policy as feature_model/dpt/raft/dvae)
    import optax
    tx = build_optimizer(variables["params"], lr=1e-3, max_iter=10)
    state = tx.init(variables["params"])

    def loss_fn(p):
        out = model.apply({"params": p}, img, txt, mask, method=model.losses,
                          rngs={"dropout": jax.random.PRNGKey(3),
                                "mask": jax.random.PRNGKey(4)})
        return out["total"]

    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    updates, _ = tx.update(grads, state, variables["params"])
    teacher_upd = jax.tree.leaves(updates["clip_model"])
    assert all(float(jnp.max(jnp.abs(u))) == 0.0 for u in teacher_upd), \
        "frozen CLIP teacher must receive zero optimizer updates"
    head_upd = jax.tree.leaves(updates["fc_mvm_clip"])
    assert any(float(jnp.max(jnp.abs(u))) > 0.0 for u in head_upd), \
        "the 2d_clip regressor head must train"
