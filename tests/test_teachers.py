"""Tests for MVM teachers: dVAE VQ extraction (parity vs the reference
encoder) and the on-device HOG target."""

import importlib.util
import sys
import types

import numpy as np
import pytest

import tests.conftest  # noqa: F401
from tests.conftest import requires_reference

import jax
import jax.numpy as jnp

from empirical_mvm_tpu.ops.hog import _line_templates, hog_image
from empirical_mvm_tpu.teachers.dvae import (DvaeEncoder, DvaeTeacher,
                                             dvae_params_from_torch,
                                             map_pixels)


def _load_ref_dalle_encoder():
    name = "_ref_dalle"
    pkg = types.ModuleType(name)
    pkg.__path__ = ["/root/reference/visbackbone/dalle"]
    sys.modules[name] = pkg
    utils_spec = importlib.util.spec_from_file_location(
        f"{name}.utils", "/root/reference/visbackbone/dalle/utils.py")
    utils_mod = importlib.util.module_from_spec(utils_spec)
    sys.modules[f"{name}.utils"] = utils_mod
    utils_spec.loader.exec_module(utils_mod)
    spec = importlib.util.spec_from_file_location(
        f"{name}.encoder", "/root/reference/visbackbone/dalle/encoder.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"{name}.encoder"] = mod
    spec.loader.exec_module(mod)
    return mod


@requires_reference
def test_dvae_encoder_parity():
    import torch
    ref_mod = _load_ref_dalle_encoder()
    torch.manual_seed(0)
    # tiny config: n_hid=64 (min), vocab=512 (min)
    ref = ref_mod.Encoder(n_hid=64, n_blk_per_group=1, vocab_size=512,
                          use_mixed_precision=False)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = dvae_params_from_torch(sd, n_blk_per_group=1)
    model = DvaeEncoder(n_hid=64, n_blk_per_group=1, vocab_size=512)

    x = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
    xm = np.asarray(map_pixels(jnp.asarray(x)))
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(xm.transpose(0, 3, 1, 2))).numpy()
    y = np.asarray(model.apply({"params": params}, jnp.asarray(xm)))
    y = y.transpose(0, 3, 1, 2)
    assert y.shape == y_ref.shape == (2, 512, 4, 4)
    np.testing.assert_allclose(y, y_ref, atol=2e-4, rtol=1e-3)
    # argmax tokens agree
    assert (y.argmax(1) == y_ref.argmax(1)).mean() > 0.99


@requires_reference
def test_dvae_teacher_tokens():
    import torch
    ref_mod = _load_ref_dalle_encoder()
    torch.manual_seed(1)
    ref = ref_mod.Encoder(n_hid=64, n_blk_per_group=1, vocab_size=512,
                          use_mixed_precision=False)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = dvae_params_from_torch(sd, n_blk_per_group=1)
    teacher = DvaeTeacher(params, n_hid=64, vocab_size=512,
                          n_blk_per_group=1, dtype=jnp.float32)
    img = np.random.RandomState(2).randn(2, 32, 32, 3).astype(np.float32) * 0.5
    toks = np.asarray(jax.jit(teacher.extract_vq_tokens)(jnp.asarray(img)))
    assert toks.shape == (2, 4, 4)
    assert toks.dtype == np.int32 and toks.min() >= 0 and toks.max() < 512


def test_hog_templates_draw_lines():
    t = _line_templates(8, 9)
    assert t.shape == (9, 8, 8)
    # every orientation draws a non-empty line of reasonable length
    npix = t.sum(axis=(1, 2))
    assert (npix >= 3).all() and (npix <= 9).all()


def test_hog_image_properties():
    rs = np.random.RandomState(0)
    img = rs.rand(2, 64, 64, 3).astype(np.float32)
    out = np.asarray(jax.jit(hog_image)(jnp.asarray(img)))
    assert out.shape == (2, 64, 64)
    assert np.isfinite(out).all() and out.min() >= 0
    # constant image -> zero gradients -> zero HOG
    flat = np.asarray(hog_image(jnp.ones((1, 64, 64, 3))))
    assert np.allclose(flat, 0)
    # vertical edges produce energy concentrated in few orientations
    stripes = np.zeros((1, 64, 64, 3), np.float32)
    stripes[:, :, ::8, :] = 1.0
    hs = np.asarray(hog_image(jnp.asarray(stripes)))
    assert hs.max() > 0


def test_hog_batched_video_shape():
    img = jnp.zeros((2, 3, 64, 64, 3))  # (B, T, H, W, C)
    out = hog_image(img)
    assert out.shape == (2, 3, 64, 64)


def _load_ref_raft():
    name = "_ref_raft"
    if f"{name}.raft" in sys.modules:
        return sys.modules[f"{name}.raft"]
    pkg = types.ModuleType(name)
    pkg.__path__ = ["/root/reference/visbackbone/optical_flow"]
    sys.modules[name] = pkg
    for sub in ("_utils", "_internally_replaced_utils", "ops", "raft"):
        spec = importlib.util.spec_from_file_location(
            f"{name}.{sub}", f"/root/reference/visbackbone/optical_flow/{sub}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"{name}.{sub}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules[f"{name}.raft"]


@requires_reference
def test_raft_parity():
    import torch
    from empirical_mvm_tpu.teachers.raft import RAFT, raft_params_from_torch
    ref_mod = _load_ref_raft()
    torch.manual_seed(0)
    ref = ref_mod.raft_large(pretrained=False)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = raft_params_from_torch(sd)

    # 128^2 keeps every corr-pyramid level >= 2x2: at 64^2 the coarsest
    # level is 1x1 and torch grid_sample's (w-1) normalization divides by 0.
    rs = np.random.RandomState(0)
    i1 = rs.rand(1, 128, 128, 3).astype(np.float32) * 2 - 1
    i2 = rs.rand(1, 128, 128, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        flows = ref(torch.from_numpy(i1.transpose(0, 3, 1, 2)),
                    torch.from_numpy(i2.transpose(0, 3, 1, 2)),
                    num_flow_updates=4)
    flow_ref = flows[-1].numpy().transpose(0, 2, 3, 1)

    model = RAFT()
    flow = np.asarray(jax.jit(
        lambda p: model.apply({"params": p}, jnp.asarray(i1), jnp.asarray(i2),
                              num_updates=4))(params))
    assert flow.shape == flow_ref.shape == (1, 128, 128, 2)
    np.testing.assert_allclose(flow, flow_ref, atol=5e-3, rtol=1e-2)


def _timm_stub():
    """Minimal timm with a ViT-L/16-384 in timm's module layout, enough for
    the reference's _make_pretrained_vitl16_384 (the real timm is absent)."""
    import torch
    import torch.nn as torch_nn

    class Block(torch_nn.Module):
        def __init__(self, d, heads):
            super().__init__()
            self.norm1 = torch_nn.LayerNorm(d, eps=1e-6)
            self.attn = torch_nn.Module()
            self.attn.qkv = torch_nn.Linear(d, 3 * d)
            self.attn.proj = torch_nn.Linear(d, d)
            self.attn.num_heads = heads
            self.norm2 = torch_nn.LayerNorm(d, eps=1e-6)
            self.mlp = torch_nn.Module()
            self.mlp.fc1 = torch_nn.Linear(d, 4 * d)
            self.mlp.fc2 = torch_nn.Linear(4 * d, d)

        def forward(self, x):
            b, l, d = x.shape
            h = self.attn.num_heads
            y = self.norm1(x)
            qkv = self.attn.qkv(y).reshape(b, l, 3, h, d // h).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            a = (q @ k.transpose(-2, -1)) * ((d // h) ** -0.5)
            a = a.softmax(dim=-1)
            y = (a @ v).transpose(1, 2).reshape(b, l, d)
            x = x + self.attn.proj(y)
            y = self.norm2(x)
            y = self.mlp.fc2(torch_nn.functional.gelu(self.mlp.fc1(y)))
            return x + y

    class ViT(torch_nn.Module):
        def __init__(self, d=1024, depth=24, heads=16, grid=24):
            super().__init__()
            self.patch_embed = torch_nn.Module()
            self.patch_embed.proj = torch_nn.Conv2d(3, d, 16, 16)
            self.cls_token = torch_nn.Parameter(torch.zeros(1, 1, d))
            self.pos_embed = torch_nn.Parameter(
                torch.randn(1, 1 + grid * grid, d) * 0.02)
            self.pos_drop = torch_nn.Dropout(0.0)
            self.blocks = torch_nn.ModuleList(
                [Block(d, heads) for _ in range(depth)])
            self.norm = torch_nn.LayerNorm(d, eps=1e-6)

    stub = types.ModuleType("timm")
    stub.create_model = lambda name, pretrained=False: ViT()
    return stub


@requires_reference
@pytest.mark.slow
def test_dpt_parity():
    import torch
    sys.modules.setdefault("timm", _timm_stub())
    name = "_ref_midas"
    pkg = types.ModuleType(name)
    pkg.__path__ = ["/root/reference/visbackbone/midas"]
    sys.modules[name] = pkg
    for sub in ("vit", "base_model", "blocks", "dpt_depth"):
        spec = importlib.util.spec_from_file_location(
            f"{name}.{sub}", f"/root/reference/visbackbone/midas/{sub}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"{name}.{sub}"] = mod
        spec.loader.exec_module(mod)
    dpt_mod = sys.modules[f"{name}.dpt_depth"]

    torch.manual_seed(0)
    ref = dpt_mod.DPTDepthModel(path=None, backbone="vitl16_384",
                                non_negative=True)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    from empirical_mvm_tpu.teachers.dpt import DPTDepth, dpt_params_from_torch
    params = dpt_params_from_torch(sd)
    model = DPTDepth()

    x = np.random.RandomState(0).rand(1, 224, 224, 3).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    y = np.asarray(jax.jit(lambda p: model.apply(
        {"params": p}, jnp.asarray(x)))(params))
    assert y.shape == y_ref.shape == (1, 224, 224)
    np.testing.assert_allclose(y, y_ref, atol=1e-2, rtol=1e-2)


def test_separable_corr_lookup_matches_bilinear_oracle():
    """The separable tent-weight corr-pyramid lookup must equal the direct
    per-point bilinear gather (the torch-equivalent oracle) at fractional,
    integer, and out-of-range coordinates."""
    import jax.numpy as jnp
    import numpy as np

    from empirical_mvm_tpu.teachers.raft import (bilinear_sample,
                                                 build_corr_pyramid,
                                                 index_corr_pyramid)

    rs = np.random.RandomState(0)
    b, h, w, c = 2, 16, 16, 8
    f1 = jnp.asarray(rs.randn(b, h, w, c).astype(np.float32))
    f2 = jnp.asarray(rs.randn(b, h, w, c).astype(np.float32))
    pyramid = build_corr_pyramid(f1, f2, num_levels=3)

    coords = rs.rand(b, h, w, 2).astype(np.float32) * (w + 4) - 2  # incl. OOB
    coords[0, 0, 0] = [3.0, 5.0]                                   # integer
    coords = jnp.asarray(coords)
    out = index_corr_pyramid(pyramid, coords, radius=2)

    side = 5
    offs = np.arange(-2, 3, dtype=np.float32)
    d = np.stack(np.meshgrid(offs, offs, indexing="ij"), -1)  # (S,S,2) di,dj
    delta = jnp.asarray(d.reshape(1, side * side, 2))
    cen = coords.reshape(b * h * w, 1, 2)
    refs = []
    for vol in pyramid:
        refs.append(bilinear_sample(vol, cen + delta)[..., 0])
        cen = cen / 2
    ref = jnp.concatenate(refs, axis=-1).reshape(b, h, w, -1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_dpt_importer_consumes_real_checkpoint_layout():
    """Drive dpt_params_from_torch over a state_dict with the EXACT key
    inventory and shapes of the released MiDaS ``dpt_large-midas-2f21e586.pt``
    (DPTDepthModel(backbone="vitl16_384"), ref: main_pretrain.py:190) —
    including the keys the importer must IGNORE (timm's final ViT norm, the
    flex-style act_postprocess Identity slots don't emit params). The
    parity test above builds its state_dict through a timm STUB, so stub/
    real naming drift would slip past it; this pins the canonical layout.
    Zero-filled arrays: this checks key coverage + shape mapping, not math.
    """
    import numpy as np

    d, depth, mlp, grid = 1024, 24, 4096, 24
    feats = [256, 512, 1024, 1024]      # act_postprocess out channels
    sd = {}

    def add(k, *shape):
        sd[k] = np.zeros(shape, np.float32)

    p = "pretrained.model"
    add(f"{p}.cls_token", 1, 1, d)
    add(f"{p}.pos_embed", 1, 1 + grid * grid, d)
    add(f"{p}.patch_embed.proj.weight", d, 3, 16, 16)
    add(f"{p}.patch_embed.proj.bias", d)
    for i in range(depth):
        b = f"{p}.blocks.{i}"
        add(f"{b}.norm1.weight", d); add(f"{b}.norm1.bias", d)
        add(f"{b}.attn.qkv.weight", 3 * d, d); add(f"{b}.attn.qkv.bias", 3 * d)
        add(f"{b}.attn.proj.weight", d, d); add(f"{b}.attn.proj.bias", d)
        add(f"{b}.norm2.weight", d); add(f"{b}.norm2.bias", d)
        add(f"{b}.mlp.fc1.weight", mlp, d); add(f"{b}.mlp.fc1.bias", mlp)
        add(f"{b}.mlp.fc2.weight", d, mlp); add(f"{b}.mlp.fc2.bias", d)
    # timm's final norm: present in the checkpoint, unused by DPT's hooks
    add(f"{p}.norm.weight", d); add(f"{p}.norm.bias", d)
    for li, f in zip(range(1, 5), feats):
        ap = f"pretrained.act_postprocess{li}"
        add(f"{ap}.0.project.0.weight", d, 2 * d)
        add(f"{ap}.0.project.0.bias", d)
        add(f"{ap}.3.weight", f, d, 1, 1); add(f"{ap}.3.bias", f)
        if li == 1:   # ConvTranspose2d(256, 256, 4, 4): (in, out, kh, kw)
            add(f"{ap}.4.weight", f, f, 4, 4); add(f"{ap}.4.bias", f)
        elif li == 2:  # ConvTranspose2d(512, 512, 2, 2)
            add(f"{ap}.4.weight", f, f, 2, 2); add(f"{ap}.4.bias", f)
        elif li == 4:  # Conv2d stride-2 downsample
            add(f"{ap}.4.weight", f, f, 3, 3); add(f"{ap}.4.bias", f)
        add(f"scratch.layer{li}_rn.weight", 256, f, 3, 3)
    for ri in range(1, 5):
        rp = f"scratch.refinenet{ri}"
        for unit in ("resConfUnit1", "resConfUnit2"):
            add(f"{rp}.{unit}.conv1.weight", 256, 256, 3, 3)
            add(f"{rp}.{unit}.conv1.bias", 256)
            add(f"{rp}.{unit}.conv2.weight", 256, 256, 3, 3)
            add(f"{rp}.{unit}.conv2.bias", 256)
        add(f"{rp}.out_conv.weight", 256, 256, 1, 1)
        add(f"{rp}.out_conv.bias", 256)
    add("scratch.output_conv.0.weight", 128, 256, 3, 3)
    add("scratch.output_conv.0.bias", 128)
    add("scratch.output_conv.2.weight", 32, 128, 3, 3)
    add("scratch.output_conv.2.bias", 32)
    add("scratch.output_conv.4.weight", 1, 32, 1, 1)
    add("scratch.output_conv.4.bias", 1)

    from empirical_mvm_tpu.teachers.dpt import DPTDepth, dpt_params_from_torch

    class _Tracking(dict):
        def __init__(self, base):
            super().__init__(base)
            self.read = set()

        def __getitem__(self, k):
            self.read.add(k)
            return super().__getitem__(k)

    tsd = _Tracking(sd)
    params = dpt_params_from_torch(tsd)

    # every checkpoint key is consumed except the documented-unused set:
    # timm's final ViT norm (hooks capture pre-norm block outputs,
    # ref vit.py:65-77) and refinenet4.resConfUnit1 (refinenet4 is called
    # with a single input, ref dpt_depth.py:79)
    expected_unused = {f"{p}.norm.weight", f"{p}.norm.bias"} | {
        f"scratch.refinenet4.resConfUnit1.{c}.{wb}"
        for c in ("conv1", "conv2") for wb in ("weight", "bias")}
    assert set(sd) - tsd.read == expected_unused, \
        sorted((set(sd) - tsd.read) ^ expected_unused)

    # every imported leaf must land on the flax tree with a matching shape
    model = DPTDepth()
    ref_shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 224, 224, 3)))["params"])
    flat_got = {".".join(map(str, k)): v.shape for k, v in
                jax.tree_util.tree_flatten_with_path(params)[0]
                for k in [tuple(p.key for p in k)]}
    flat_ref = {".".join(map(str, k)): v.shape for k, v in
                jax.tree_util.tree_flatten_with_path(ref_shapes)[0]
                for k in [tuple(p.key for p in k)]}
    assert set(flat_got) == set(flat_ref), (
        sorted(set(flat_got) ^ set(flat_ref))[:10])
    for k in flat_ref:
        assert tuple(flat_got[k]) == tuple(flat_ref[k]), (
            k, flat_got[k], flat_ref[k])


def test_clip_visual_parity_vs_hf():
    """CLIPVisual + importer vs a random-init transformers CLIPVisionModel —
    the oracle for the 2d_clip MVM target (the paper's 8th target family;
    the reference README advertises it but ships no code branch, so HF's
    CLIPVisionModel is the ground truth)."""
    import torch
    from transformers import CLIPVisionConfig, CLIPVisionModel

    torch.manual_seed(0)
    hf_cfg = CLIPVisionConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, image_size=64, patch_size=32,
        hidden_act="quick_gelu")
    ref = CLIPVisionModel(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    from empirical_mvm_tpu.teachers.clip import (CLIPVisual,
                                                 clip_params_from_torch)
    params = clip_params_from_torch(sd, num_layers=2)
    model = CLIPVisual(hidden_size=64, num_layers=2, num_heads=4,
                       mlp_dim=128, patch_size=32)

    x = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        out = ref(pixel_values=torch.from_numpy(x.transpose(0, 3, 1, 2)))
    tok, pooled = jax.jit(lambda p: model.apply(
        {"params": p}, jnp.asarray(x)))(params)
    np.testing.assert_allclose(np.asarray(tok),
                               out.last_hidden_state.numpy(),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(pooled),
                               out.pooler_output.numpy(),
                               atol=2e-5, rtol=2e-5)
    feats = model.apply({"params": params}, jnp.asarray(x),
                        method=model.features)
    assert feats.shape == (2, 2, 2, 64)
    np.testing.assert_allclose(
        np.asarray(feats).reshape(2, 4, 64),
        out.last_hidden_state.numpy()[:, 1:], atol=2e-5, rtol=2e-5)


def test_clip_renormalization_roundtrip():
    """ImageNet-normalized -> CLIP-normalized equals normalizing the raw
    pixels with CLIP stats directly."""
    from empirical_mvm_tpu.teachers.clip import (CLIP_MEAN, CLIP_STD,
                                                 IMAGENET_MEAN, IMAGENET_STD,
                                                 renormalize_imagenet_to_clip)
    rs = np.random.RandomState(1)
    raw = rs.rand(4, 8, 8, 3).astype(np.float32)
    imnet = (raw - np.asarray(IMAGENET_MEAN, np.float32)) \
        / np.asarray(IMAGENET_STD, np.float32)
    want = (raw - np.asarray(CLIP_MEAN, np.float32)) \
        / np.asarray(CLIP_STD, np.float32)
    got = np.asarray(renormalize_imagenet_to_clip(jnp.asarray(imnet)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
