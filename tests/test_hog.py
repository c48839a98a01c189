"""Cross-check of the on-device HOG target (ops/hog.py) against an
INDEPENDENT loop-based numpy oracle transcribing skimage.feature.hog's
visualize=True algorithm (the reference's MVM-HOG target source,
ref: dataset.py:197-206). skimage itself is not installed here; the oracle
below follows its published semantics step by step — per-channel central
differences with zeroed borders, dominant-channel selection, unsigned
orientation bins, per-cell mean-magnitude histograms, and the Bresenham
line rendering of the (unnormalized) histogram."""

import numpy as np

import tests.conftest  # noqa: F401

from empirical_mvm_tpu.ops.hog import hog_image


def _bresenham(r0, c0, r1, c1):
    """skimage.draw.line semantics."""
    steep = abs(r1 - r0) > abs(c1 - c0)
    x0, y0, x1, y1 = (r0, c0, r1, c1) if steep else (c0, r0, c1, r1)
    if x0 > x1:
        x0, x1, y0, y1 = x1, x0, y1, y0
    dx, dy = x1 - x0, abs(y1 - y0)
    err = dx / 2.0
    ystep = 1 if y0 < y1 else -1
    y = y0
    pts = []
    for x in range(x0, x1 + 1):
        pts.append((x, y) if steep else (y, x))
        err -= dy
        if err < 0:
            y += ystep
            err += dx
    return pts


def _hog_visualize_oracle(img, cell=8, orientations=9):
    """Loop transcription of skimage.feature.hog(..., visualize=True)[1]."""
    h, w, nc = img.shape
    img = img.astype(np.float64)

    # _hog_channel_gradient per channel, zeroed borders
    g_row = np.zeros_like(img)
    g_col = np.zeros_like(img)
    g_row[1:-1, :, :] = img[2:, :, :] - img[:-2, :, :]
    g_col[:, 1:-1, :] = img[:, 2:, :] - img[:, :-2, :]
    mag = np.hypot(g_row, g_col)
    best = mag.argmax(axis=2)
    rr, cc = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    g_row = g_row[rr, cc, best]
    g_col = g_col[rr, cc, best]
    mag = mag[rr, cc, best]

    orientation = np.rad2deg(np.arctan2(g_row, g_col)) % 180.0

    n_cr, n_cc = h // cell, w // cell
    hist = np.zeros((n_cr, n_cc, orientations))
    for r in range(n_cr):
        for c in range(n_cc):
            for o in range(orientations):
                lo = 180.0 / orientations * o
                hi = 180.0 / orientations * (o + 1)
                total = 0.0
                for i in range(cell):
                    for j in range(cell):
                        ang = orientation[r * cell + i, c * cell + j]
                        if lo <= ang < hi:
                            total += mag[r * cell + i, c * cell + j]
                hist[r, c, o] = total / (cell * cell)

    # rendering (skimage hog visualize branch)
    radius = cell // 2 - 1
    out = np.zeros((h, w))
    mids = np.pi * (np.arange(orientations) + 0.5) / orientations
    for r in range(n_cr):
        for c in range(n_cc):
            centre = (r * cell + cell // 2, c * cell + cell // 2)
            for o in range(orientations):
                dr = radius * np.sin(mids[o])
                dc = radius * np.cos(mids[o])
                for pr, pc in _bresenham(int(centre[0] - dc),
                                         int(centre[1] + dr),
                                         int(centre[0] + dc),
                                         int(centre[1] - dr)):
                    if 0 <= pr < h and 0 <= pc < w:
                        out[pr, pc] += hist[r, c, o]
    return out


def test_hog_image_matches_loop_oracle():
    rs = np.random.RandomState(0)
    img = rs.rand(16, 24, 3).astype(np.float32)
    got = np.asarray(hog_image(img))
    want = _hog_visualize_oracle(img)
    assert got.shape == want.shape == (16, 24)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_hog_image_batched_consistency():
    rs = np.random.RandomState(1)
    clip = rs.rand(2, 3, 16, 16, 3).astype(np.float32)
    batched = np.asarray(hog_image(clip))
    singles = np.stack([
        np.stack([np.asarray(hog_image(clip[b, t])) for t in range(3)])
        for b in range(2)])
    np.testing.assert_allclose(batched, singles, atol=1e-5)


def test_hog_grayscale_like_uniform_channels():
    """All-equal channels must reduce to the single-channel result."""
    rs = np.random.RandomState(2)
    g = rs.rand(16, 16, 1).astype(np.float32)
    rgb = np.repeat(g, 3, axis=2)
    np.testing.assert_allclose(np.asarray(hog_image(rgb)),
                               np.asarray(hog_image(g)), atol=1e-5)
