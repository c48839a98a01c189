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
