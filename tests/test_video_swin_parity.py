"""Numerical parity of the JAX VideoSwin3D against the torch reference.

These are the golden-value tests SURVEY.md §4/§7 calls for: random-init the
reference ``SwinTransformer3D`` (visbackbone/video_swin.py:410), import its
state_dict via our torch importer, and require the fp32 forward to match.
"""

import numpy as np
import pytest

from tests.conftest import requires_reference
from tests.ref_loader import load_ref_video_swin, torch_state_dict_to_numpy

from empirical_mvm_tpu.core.config import SwinConfig
from empirical_mvm_tpu.models.torch_import import swin3d_params_from_torch
from empirical_mvm_tpu.models.video_swin import (
    SwinTransformer3D, _relative_position_index, _shift_attn_mask,
    get_window_size,
)


def _parity_case(swin_cfg: SwinConfig, shape, atol=2e-4):
    import torch
    ref_mod = load_ref_video_swin()
    torch.manual_seed(0)
    ref = ref_mod.SwinTransformer3D(
        pretrained=None,
        patch_size=swin_cfg.patch_size,
        embed_dim=swin_cfg.embed_dim,
        depths=list(swin_cfg.depths),
        num_heads=list(swin_cfg.num_heads),
        window_size=swin_cfg.window_size,
        drop_path_rate=0.0,
        patch_norm=swin_cfg.patch_norm,
    )
    ref.eval()

    b, t, h, w = shape
    x = np.random.RandomState(1).randn(b, t, h, w, 3).astype(np.float32)
    with torch.no_grad():
        # reference takes (B, C, D, H, W)
        y_ref = ref(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))
    y_ref = y_ref.numpy().transpose(0, 2, 3, 4, 1)  # -> (B, D, H', W', C)

    sd = torch_state_dict_to_numpy(ref)
    params = swin3d_params_from_torch(sd, swin_cfg.depths)
    model = SwinTransformer3D(config=swin_cfg)
    y = model.apply({"params": params}, x, deterministic=True)
    y = np.asarray(y)

    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, atol=atol, rtol=1e-3)


@requires_reference
def test_small_two_stage_parity():
    cfg = SwinConfig(embed_dim=32, depths=(2, 2), num_heads=(2, 4),
                     drop_path_rate=0.0)
    _parity_case(cfg, (2, 4, 64, 64))


@requires_reference
def test_shifted_window_and_temporal_clamp_parity():
    # T=5 < window_d=8 exercises window clamping; 56x56 exercises shift masks.
    cfg = SwinConfig(embed_dim=16, depths=(2,), num_heads=(2,),
                     drop_path_rate=0.0)
    _parity_case(cfg, (1, 5, 56, 56))


@requires_reference
@pytest.mark.slow
def test_violet_config_parity():
    # the actual violet backbone at reduced depth (full depths are slow on CPU)
    cfg = SwinConfig(embed_dim=96, depths=(2, 2, 2, 2), num_heads=(3, 6, 12, 24),
                     drop_path_rate=0.0)
    _parity_case(cfg, (1, 4, 224, 224), atol=5e-4)


def test_relative_position_index_matches_reference_layout():
    # d-major enumeration: slicing [:N, :N] for a clamped temporal window must
    # equal the index computed natively for the smaller window.
    full = _relative_position_index((8, 7, 7))
    sub = _relative_position_index((4, 7, 7))
    n = 4 * 7 * 7
    # values differ by table offset; check relative structure via differences
    d_full = full[:n, :n] - full[0, 0]
    d_sub = sub - sub[0, 0]
    assert (d_full == d_sub).all()


def test_window_size_clamping():
    assert get_window_size((4, 56, 56), (8, 7, 7)) == (4, 7, 7)
    # at input (4,7,7) every dim is <= the window: all shifts zero out,
    # which is how the reference disables shifting at the last stage
    ws, ss = get_window_size((4, 7, 7), (8, 7, 7), (4, 3, 3))
    assert ws == (4, 7, 7) and ss == (0, 0, 0)
    # only the temporal dim clamps at stage 0 (56x56 spatial)
    ws, ss = get_window_size((4, 56, 56), (8, 7, 7), (4, 3, 3))
    assert ws == (4, 7, 7) and ss == (0, 3, 3)


def test_shift_mask_is_block_diagonal_free():
    m = _shift_attn_mask((8, 14, 14), (8, 7, 7), (4, 3, 3))
    assert m.shape == (1 * 2 * 2, 8 * 7 * 7, 8 * 7 * 7)
    assert set(np.unique(m)) <= {0.0, -100.0}
    # zero shift in one dim must not blow up (slice(-0) == full slice)
    m2 = _shift_attn_mask((4, 14, 14), (4, 7, 7), (0, 3, 3))
    assert m2.shape[1] == 4 * 7 * 7


@requires_reference
def test_swin_tiny_5frame_224_cpu_parity():
    """BASELINE.json tracked config 1: Swin-Tiny forward of one 5-frame 224^2
    clip on CPU vs the torch reference."""
    cfg = SwinConfig.tiny()
    cfg = SwinConfig(embed_dim=cfg.embed_dim, depths=cfg.depths,
                     num_heads=cfg.num_heads, drop_path_rate=0.0)
    _parity_case(cfg, (1, 5, 224, 224), atol=5e-4)


def test_inflate_swin2d_to_3d():
    """Functional checks of the 2D->3D inflation transforms
    (ref: visbackbone/video_swin.py:484-536)."""
    import numpy as np
    from empirical_mvm_tpu.models.torch_import import inflate_swin2d_to_3d

    rs = np.random.RandomState(0)
    nh = 3
    sd2d = {
        "patch_embed.proj.weight": rs.randn(8, 3, 4, 4).astype(np.float32),
        "patch_embed.proj.bias": rs.randn(8).astype(np.float32),
        # 2D 7x7 window: (2*7-1)^2 = 169 offsets
        "layers.0.blocks.0.attn.relative_position_bias_table":
            rs.randn(169, nh).astype(np.float32),
        "layers.0.blocks.0.attn.relative_position_index":
            np.zeros((49, 49), np.int64),
        "layers.0.blocks.0.attn_mask": np.zeros((1, 49, 49), np.float32),
    }
    out = inflate_swin2d_to_3d(sd2d, window_size=(8, 7, 7), patch_t=2)

    # buffers dropped
    assert not any("relative_position_index" in k or "attn_mask" in k
                   for k in out)
    # temporal inflation: kd=2 axis, sum over kd equals the 2D kernel
    w = out["patch_embed.proj.weight"]
    assert w.shape == (8, 3, 2, 4, 4)
    np.testing.assert_allclose(w.sum(axis=2),
                               sd2d["patch_embed.proj.weight"], rtol=1e-6)
    # bias table tiled (2*8-1)=15 times along temporal offsets, no resize
    t = out["layers.0.blocks.0.attn.relative_position_bias_table"]
    assert t.shape == (15 * 169, nh)
    np.testing.assert_array_equal(
        t[:169], sd2d["layers.0.blocks.0.attn.relative_position_bias_table"])
    np.testing.assert_array_equal(t[169:338], t[:169])

    # spatial resize path: a 5x5-window table (81 offsets) resizes to 169
    sd_small = {"layers.0.blocks.0.attn.relative_position_bias_table":
                rs.randn(81, nh).astype(np.float32)}
    out2 = inflate_swin2d_to_3d(sd_small, window_size=(8, 7, 7))
    assert out2["layers.0.blocks.0.attn.relative_position_bias_table"
                ].shape == (15 * 169, nh)


def test_swin_stage_scan_equivalence():
    """SwinConfig.scan=True (block-pair nn.scan) matches the unrolled stage
    numerically (deterministic) given converted params."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from empirical_mvm_tpu.core.config import SwinConfig
    from empirical_mvm_tpu.models.video_swin import (
        SwinTransformer3D, swin_stack_stage_blocks, swin_unstack_stage_blocks)

    cfg = SwinConfig(embed_dim=8, depths=(2, 4, 2, 2), num_heads=(1, 2, 4, 8),
                     drop_path_rate=0.1)
    model = SwinTransformer3D(config=cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 2, 64, 64, 3)
                    .astype(np.float32))
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x)["params"])()
    ref = jax.jit(lambda p: model.apply({"params": p}, x))(params)

    cfg_s = dataclasses.replace(cfg, scan=True)
    model_s = SwinTransformer3D(config=cfg_s)
    params_s = dict(params)
    # only even-depth stages >= 4 scan (stage 1 here, depth 4)
    params_s["layers_1"] = swin_stack_stage_blocks(params["layers_1"], 4)
    out = jax.jit(lambda p: model_s.apply({"params": p}, x))(params_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    # round trip
    back = swin_unstack_stage_blocks(params_s["layers_1"])
    for i in range(4):
        for a, b in zip(jax.tree.leaves(back[f"blocks_{i}"]),
                        jax.tree.leaves(params["layers_1"][f"blocks_{i}"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # init in scanned layout has the stacked shapes
    p2 = jax.jit(lambda: model_s.init(jax.random.PRNGKey(0), x)["params"])()
    assert "pairs" in p2["layers_1"]
    q = p2["layers_1"]["pairs"]["blk0"]["attn"]["qkv"]["kernel"]
    assert q.shape[0] == 2  # 4 blocks -> 2 scan steps


def test_rel_pos_bias_grad_matches_scatter():
    """The separable table-grad (custom VJP) must equal autodiff of the
    gather (scatter-add), including clamped leading window dims."""
    import jax
    import jax.numpy as jnp

    from empirical_mvm_tpu.models.video_swin import (
        _relative_position_index, rel_pos_bias)

    rs = np.random.RandomState(0)
    for full, eff in [((8, 7, 7), (4, 7, 7)), ((2, 7, 7), (2, 7, 7)),
                      ((8, 7, 7), (1, 7, 7))]:
        r = (2 * full[0] - 1) * (2 * full[1] - 1) * (2 * full[2] - 1)
        nh = 3
        table = jnp.asarray(rs.randn(r, nh).astype(np.float32))
        n = int(np.prod(eff))
        tgt = jnp.asarray(rs.randn(nh, n, n).astype(np.float32))

        def loss_custom(t):
            return jnp.sum(rel_pos_bias(t, full, eff) * tgt)

        def loss_ref(t):
            idx = _relative_position_index(full)[:n, :n]
            b = t[idx.reshape(-1)].reshape(n, n, nh).transpose(2, 0, 1)
            return jnp.sum(b.astype(jnp.float32) * tgt)

        g_c = jax.grad(loss_custom)(table)
        g_r = jax.grad(loss_ref)(table)
        np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_r),
                                   atol=1e-4, rtol=1e-4,
                                   err_msg=f"{full} {eff}")
