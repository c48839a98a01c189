"""On-device HOG target extraction for MVM-HOG.

The reference computes HOG with scikit-image **on CPU inside dataloader
workers** and regresses the *visualization image* (ref: dataset.py:197-206:
``_, single_hog = hog(..., visualize=True)`` — the second return value is the
rendered H x W HOG image, which becomes the (B, T, H, W) regression target at
main_pretrain.py:453-468).

Here the whole computation is jitted device code (the "on-device
preprocessing" north star from BASELINE.json), replicating skimage's
semantics: 9 unsigned-orientation bins, 8x8 cells, central-difference
gradients, per-pixel dominant-channel selection, per-cell mean magnitude per
bin, and the line-segment rendering (Bresenham lines through each cell
center, one per orientation, precomputed as a static (9, 8, 8) stencil).

skimage itself is not installed in this environment, so parity is
structural (same algorithm) rather than bit-exact-tested; the MVM objective
only requires a consistent dense target.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _line_templates(cell: int = 8, orientations: int = 9) -> np.ndarray:
    """(O, cell, cell) float templates: the rendered line for each
    orientation bin, as drawn by skimage's hog visualization (a Bresenham
    line of radius cell//2 - 1 through the cell center, angle at the bin
    midpoint)."""
    radius = cell // 2 - 1
    centre = (cell // 2, cell // 2)
    out = np.zeros((orientations, cell, cell), np.float32)
    for o in range(orientations):
        angle = (o + 0.5) * np.pi / orientations
        dr = np.sin(angle) * radius
        dc = np.cos(angle) * radius
        r0, c0 = int(centre[0] - dc), int(centre[1] + dr)
        r1, c1 = int(centre[0] + dc), int(centre[1] - dr)
        # Bresenham (skimage.draw.line semantics): iterate over the major axis
        steep = abs(r1 - r0) > abs(c1 - c0)
        x0, y0, x1, y1 = ((r0, c0, r1, c1) if steep else (c0, r0, c1, r1))
        if x0 > x1:
            x0, x1, y0, y1 = x1, x0, y1, y0
        dx, dy = x1 - x0, abs(y1 - y0)
        err = dx / 2.0
        ystep = 1 if y0 < y1 else -1
        y = y0
        for x in range(x0, x1 + 1):
            rr, cc = (x, y) if steep else (y, x)
            if 0 <= rr < cell and 0 <= cc < cell:
                out[o, rr, cc] = 1.0
            err -= dy
            if err < 0:
                y += ystep
                err += dx
    return out


def hog_image(img: jax.Array, *, cell: int = 8,
              orientations: int = 9) -> jax.Array:
    """Dense HOG visualization target.

    Args:
      img: (..., H, W, C) float image (any channel count; the dominant
        channel per pixel is used, like skimage's channel_axis handling).
    Returns:
      (..., H, W) float32 HOG image.
    """
    h, w = img.shape[-3], img.shape[-2]
    assert h % cell == 0 and w % cell == 0, (h, w, cell)

    x = img.astype(jnp.float32)
    # central differences, zero at borders (skimage _hog_channel_gradient)
    g_row = jnp.zeros_like(x)
    g_row = g_row.at[..., 1:-1, :, :].set(x[..., 2:, :, :] - x[..., :-2, :, :])
    g_col = jnp.zeros_like(x)
    g_col = g_col.at[..., :, 1:-1, :].set(x[..., :, 2:, :] - x[..., :, :-2, :])

    mag = jnp.hypot(g_row, g_col)                       # (..., H, W, C)
    # dominant channel via one-hot select — per-pixel take_along_axis
    # gathers cost ~200ms/step on TPU for the same result
    best = jnp.argmax(mag, axis=-1)                     # (..., H, W)
    sel = jax.nn.one_hot(best, img.shape[-1], dtype=jnp.float32)
    g_row = jnp.sum(g_row * sel, axis=-1)
    g_col = jnp.sum(g_col * sel, axis=-1)
    mag = jnp.sum(mag * sel, axis=-1)

    # unsigned orientation in [0, pi): skimage uses atan2(g_row, g_col) % pi
    ang = jnp.arctan2(g_row, g_col) % jnp.pi
    bin_width = jnp.pi / orientations
    bin_idx = jnp.clip((ang / bin_width).astype(jnp.int32), 0,
                       orientations - 1)

    # per-cell mean magnitude per orientation bin (skimage cell histogram)
    onehot = jax.nn.one_hot(bin_idx, orientations, dtype=jnp.float32)
    weighted = onehot * mag[..., None]                  # (..., H, W, O)
    ch, cw = h // cell, w // cell
    lead = weighted.shape[:-3]
    weighted = weighted.reshape(*lead, ch, cell, cw, cell, orientations)
    hist = weighted.sum(axis=(-4, -2)) / (cell * cell)  # (..., ch, cw, O)

    # render: hist (..., ch, cw, O) x template (O, cell, cell)
    templ = jnp.asarray(_line_templates(cell, orientations))
    img_cells = jnp.einsum("...rco,oij->...rcij", hist, templ)
    img_out = img_cells.transpose(
        *range(len(lead)), -4, -2, -3, -1)              # (..., ch, i, cw, j)
    return img_out.reshape(*lead, h, w)
