"""Tests for the alternate visual encoders (2D swin / r50 / merlot)."""

import numpy as np
import pytest

import tests.conftest  # noqa: F401

import jax
import jax.numpy as jnp

from empirical_mvm_tpu.core.config import BertConfig, ModelConfig, SwinConfig
from empirical_mvm_tpu.models.violet import VioletBase

TINY_BERT = BertConfig(vocab_size=100, hidden_size=32, num_hidden_layers=1,
                       num_attention_heads=4, intermediate_size=64)
TINY_SWIN = SwinConfig(embed_dim=8, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8),
                       patch_size=(1, 4, 4), window_size=(1, 7, 7),
                       drop_path_rate=0.0)


def _run(vb, tf, expect_t):
    cfg = ModelConfig(vis_backbone=vb, temporal_fusion=tf, size_img=64,
                      size_frame=2, size_txt=6, fusion=TINY_BERT,
                      text=TINY_BERT, swin_custom=TINY_SWIN)
    model = VioletBase(config=cfg)
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(2, 2, 64, 64, 3).astype(np.float32))
    txt = jnp.asarray(rs.randint(5, 100, (2, 6)).astype(np.int32))
    mask = jnp.ones((2, 6), jnp.int32)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), img, txt,
                                        mask)["params"])()
    out = jax.jit(lambda p: model.apply({"params": p}, img, txt, mask))(params)
    lv = expect_t * (1 + 2 * 2)
    assert out.shape == (2, lv + 6, 32), out.shape
    assert np.isfinite(np.asarray(out)).all()


def test_swin2d_concat():
    _run("swin", "concat", expect_t=2)


def test_swin2d_mean():
    _run("swin", "mean", expect_t=1)


def test_r50_concat():
    _run("r50", "concat", expect_t=2)


def test_r50_mean():
    _run("r50", "mean", expect_t=1)


def test_merlot():
    _run("merlot", "concat", expect_t=2)


def test_swin2d_hf_weight_import_parity():
    """Our swin2d (3D module at T=1) must reproduce HF SwinModel's
    hidden_states[-1] (pre-final-norm) with imported weights."""
    import torch
    import transformers
    from empirical_mvm_tpu.models.torch_import import swin2d_params_from_hf
    from empirical_mvm_tpu.models.video_swin import SwinTransformer3D

    hf_cfg = transformers.SwinConfig(
        image_size=64, patch_size=4, embed_dim=24, depths=[2, 2],
        num_heads=[2, 4], window_size=7, drop_path_rate=0.0,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    hf = transformers.SwinModel(hf_cfg, add_pooling_layer=False)
    hf.eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    cfg = SwinConfig(patch_size=(1, 4, 4), embed_dim=24, depths=(2, 2),
                     num_heads=(2, 4), window_size=(1, 7, 7),
                     drop_path_rate=0.0, final_norm=False)
    params = swin2d_params_from_hf(sd, cfg.depths)
    model = SwinTransformer3D(config=cfg)

    x = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        out = hf(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                 output_hidden_states=True)
        ref = out.hidden_states[-1].numpy()            # (B, L, C) pre-norm
    y = model.apply({"params": params}, jnp.asarray(x[:, None]))  # T=1
    y = np.asarray(y)                                  # (B, 1, h, w, C)
    y = y.reshape(y.shape[0], -1, y.shape[-1])
    assert y.shape == ref.shape
    np.testing.assert_allclose(y, ref, atol=3e-4, rtol=1e-3)


def _torch_resnet50_trunk():
    """Minimal torch ResNet-50 trunk in torchvision's state-dict layout
    (torchvision itself is not installed in this environment)."""
    import torch
    import torch.nn as tnn

    class Bottleneck(tnn.Module):
        def __init__(self, cin, f, stride=1, project=False):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, f, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(f)
            self.conv2 = tnn.Conv2d(f, f, 3, stride, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(f)
            self.conv3 = tnn.Conv2d(f, 4 * f, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(4 * f)
            self.relu = tnn.ReLU()
            self.downsample = (tnn.Sequential(
                tnn.Conv2d(cin, 4 * f, 1, stride, bias=False),
                tnn.BatchNorm2d(4 * f)) if project else None)

        def forward(self, x):
            idn = x if self.downsample is None else self.downsample(x)
            y = self.relu(self.bn1(self.conv1(x)))
            y = self.relu(self.bn2(self.conv2(y)))
            y = self.bn3(self.conv3(y))
            return self.relu(idn + y)

    class Trunk(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU()
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            cin = 64
            for li, (f, n, s) in enumerate(((64, 3, 1), (128, 4, 2),
                                            (256, 6, 2), (512, 3, 2)),
                                           start=1):
                blocks = []
                for bi in range(n):
                    blocks.append(Bottleneck(cin, f, s if bi == 0 else 1,
                                             project=(bi == 0)))
                    cin = 4 * f
                setattr(self, f"layer{li}", tnn.Sequential(*blocks))

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            for li in (1, 2, 3, 4):
                x = getattr(self, f"layer{li}")(x)
            return x

    return Trunk()


def test_resnet50_torch_parity():
    """Our ResNet50 trunk vs a torch oracle in torchvision layout with
    imported weights (+ randomized BN stats to exercise FrozenBatchNorm)."""
    import torch
    from empirical_mvm_tpu.models.encoders2d import ResNet50
    from empirical_mvm_tpu.models.torch_import import resnet50_params_from_torch

    torch.manual_seed(0)
    ref = _torch_resnet50_trunk()
    with torch.no_grad():   # non-trivial running stats
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = resnet50_params_from_torch(sd)

    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        feat = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    feat = feat.numpy().transpose(0, 2, 3, 1)

    model = ResNet50()
    y = np.asarray(jax.jit(lambda p: model.apply({"params": p},
                                                 jnp.asarray(x)))(params))
    assert y.shape == feat.shape == (1, 2, 2, 2048)
    np.testing.assert_allclose(y, feat, atol=2e-3, rtol=1e-2)


def test_vit_encoder_hf_parity():
    """ViTBlock stack vs HF ViTModel.encoder with imported weights."""
    import torch
    import transformers
    from empirical_mvm_tpu.teachers.dpt import ViTBlock
    from empirical_mvm_tpu.models.torch_import import vit_encoder_params_from_hf

    hf_cfg = transformers.ViTConfig(hidden_size=32, num_hidden_layers=2,
                                    num_attention_heads=4,
                                    intermediate_size=128,
                                    hidden_dropout_prob=0.0,
                                    attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    hf = transformers.ViTModel(hf_cfg, add_pooling_layer=False)
    hf.eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = vit_encoder_params_from_hf(sd, "encoder.", 2)

    x = np.random.RandomState(0).randn(2, 9, 32).astype(np.float32)
    with torch.no_grad():
        ref = hf.encoder(torch.from_numpy(x)).last_hidden_state.numpy()

    y = jnp.asarray(x)
    for i in range(2):
        blk = ViTBlock(32, 4)
        y = blk.apply({"params": params[f"vit_{i}"]}, y)
    np.testing.assert_allclose(np.asarray(y), ref, atol=2e-5, rtol=1e-4)


def test_resnet50_train_mode_bn_torch_parity():
    """VERDICT r2 item 8: train-mode BN (batch statistics) must match the
    torch trunk in .train() mode — the reference fine-tunes its R50 with BNs
    in train mode (ref resnet50.py:18-21). Batch of 3 so batch stats differ
    materially from the (randomized) running stats."""
    import torch
    from empirical_mvm_tpu.models.encoders2d import ResNet50
    from empirical_mvm_tpu.models.torch_import import resnet50_params_from_torch

    torch.manual_seed(1)
    ref = _torch_resnet50_trunk()
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)        # far from batch stats
                m.running_var.uniform_(0.5, 2.0)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = resnet50_params_from_torch(sd)

    x = np.random.RandomState(1).rand(3, 64, 64, 3).astype(np.float32)
    ref.train()
    with torch.no_grad():                 # updates running stats, output
        feat = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))   # uses batch
    feat = feat.numpy().transpose(0, 2, 3, 1)

    model = ResNet50()
    y = np.asarray(jax.jit(lambda p: model.apply(
        {"params": p}, jnp.asarray(x), use_batch_stats=True))(params))
    np.testing.assert_allclose(y, feat, atol=2e-3, rtol=1e-2)

    # and the default (frozen) path must NOT match train-mode output
    y_eval = np.asarray(jax.jit(lambda p: model.apply(
        {"params": p}, jnp.asarray(x)))(params))
    assert np.abs(y_eval - feat).max() > 1e-2


def test_resnet50_bn_running_stat_update_torch_parity():
    """VERDICT r3 item 6: the torch train forward momentum-updates every
    BN's running mean/var (running = 0.9*running + 0.1*batch, unbiased var);
    our train step folds the sown ``bn_stats`` into the mean/var params via
    fold_bn_stats. After one train-mode forward each, the full drifted
    running-stat trees must match torch's."""
    import torch
    from empirical_mvm_tpu.models.encoders2d import ResNet50, fold_bn_stats
    from empirical_mvm_tpu.models.torch_import import resnet50_params_from_torch

    torch.manual_seed(2)
    ref = _torch_resnet50_trunk()
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
    # .copy(): state_dict numpy views alias the live tensors, which the
    # in-place torch running-stat update below would silently mutate
    sd = {k: v.detach().numpy().copy() for k, v in ref.state_dict().items()}
    params = resnet50_params_from_torch(sd)

    x = np.random.RandomState(2).rand(3, 64, 64, 3).astype(np.float32)
    ref.train()
    with torch.no_grad():
        ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))   # updates stats
    sd_after = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    want = resnet50_params_from_torch(sd_after)

    model = ResNet50()
    _, mut = jax.jit(lambda p: model.apply(
        {"params": p}, jnp.asarray(x), use_batch_stats=True,
        mutable=["bn_stats"]))(params)
    got = fold_bn_stats(params, mut["bn_stats"])

    flat_want = jax.tree_util.tree_flatten_with_path(want)[0]
    flat_got = dict(jax.tree_util.tree_flatten_with_path(got)[0])
    n_stats = 0
    for path, w in flat_want:
        leaf = str(path[-1])
        g = np.asarray(flat_got[path])
        if "mean" in leaf or "var" in leaf:
            n_stats += 1
            np.testing.assert_allclose(g, np.asarray(w), atol=1e-4,
                                       rtol=1e-4, err_msg=str(path))
        else:   # weights unchanged by a no-grad forward
            np.testing.assert_array_equal(g, np.asarray(w))
    assert n_stats == 53 * 2   # 53 BNs in a torchvision R50 trunk


def test_agent_train_step_updates_bn_running_stats(tmp_path):
    """Production wiring (VERDICT r3 item 6): a supervised-agent train step
    with r50_train_bn must momentum-update the BN running mean/var params;
    with r50_train_bn=False they stay frozen."""
    from empirical_mvm_tpu.core.config import RunConfig, TrainConfig
    from empirical_mvm_tpu.models.tasks import VioletRetrieval
    from empirical_mvm_tpu.parallel.mesh import shard_batch
    from empirical_mvm_tpu.train.agent import RetrievalAgent

    rs = np.random.RandomState(0)
    batch = {"img": rs.rand(8, 2, 64, 64, 3).astype(np.float32),
             "txt": rs.randint(5, 100, (8, 6)).astype(np.int32),
             "mask": np.ones((8, 6), np.int32)}

    def bn_mean(params):
        return np.asarray(params["enc_img"]["res"]["bn1"]["mean"])

    for train_bn, expect_change in ((True, True), (False, False)):
        cfg = ModelConfig(vis_backbone="r50", temporal_fusion="concat",
                          size_img=64, size_frame=2, size_txt=6,
                          fusion=TINY_BERT, text=TINY_BERT,
                          r50_train_bn=train_bn)
        model = VioletRetrieval(config=cfg)
        params = jax.jit(lambda m=model: m.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            jnp.asarray(batch["img"]), jnp.asarray(batch["txt"]),
            jnp.asarray(batch["mask"]), deterministic=False)["params"])()
        run = RunConfig(path_output=str(tmp_path / f"bn{train_bn}"),
                        train=TrainConfig(size_batch=8, lr=0.0,
                                          logging_steps=100))
        ag = RetrievalAgent(run, model, params, max_iter=4)
        before = bn_mean(ag.state.params)
        sb = shard_batch(ag.mesh, batch)
        ag.state, _ = ag.train_step(ag.state, sb, ag.rng)
        after = bn_mean(ag.state.params)
        # lr=0 so only the BN running-stat fold can move params
        changed = np.abs(after - before).max() > 1e-6
        assert changed == expect_change, (train_bn, changed)
