"""Video Swin Transformer 3D, TPU-native (flax.linen, channel-last, static shapes).

Behavioral parity target: the reference backbone at
``visbackbone/video_swin.py`` (SwinTransformer3D :410, WindowAttention3D :111,
SwinTransformerBlock3D :175, PatchEmbed3D :373, PatchMerging :266,
BasicLayer :310), including its VIOLET-specific quirks:

* patch-embed conv kernel ``patch_size=(2,4,4)`` but stride ``(1,4,4)`` with a
  +1 temporal pad, so there is NO temporal downsampling
  (ref: visbackbone/video_swin.py:384,398).
* window size is clamped per stage to the input extent; clamped dims get zero
  shift (ref: visbackbone/video_swin.py:95-108).
* the relative-position-bias index is built once for the FULL window and
  sliced ``[:N, :N]`` when the effective window is smaller
  (ref: visbackbone/video_swin.py:155).
* shift masks depend only on static shapes, so here they are computed with
  numpy at trace time and baked into the program as constants — the lru_cache
  at visbackbone/video_swin.py:292 becomes a compile-time constant fold.

TPU-first design choices (NOT mirrored from the reference):
* channel-last ``(B, T, H, W, C)`` layout end to end — matmul-friendly, no
  NCDHW permutes;
* the patch-embed conv is lowered to a reshape+matmul so it lands on the MXU
  as a single GEMM (see ops/patch_embed.py);
* attention runs in bf16 on the MXU with fp32 softmax accumulation;
* all shapes static ⇒ one XLA compilation per (T, H, W) config.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from empirical_mvm_tpu.core.config import SwinConfig
from empirical_mvm_tpu.ops.layernorm import layer_norm
from empirical_mvm_tpu.ops.patch_embed import patch_embed_3d


def get_window_size(
    x_size: Sequence[int],
    window_size: Sequence[int],
    shift_size: Sequence[int] | None = None,
):
    """Clamp window/shift to the input extent (ref: visbackbone/video_swin.py:95-108)."""
    use_window = list(window_size)
    use_shift = list(shift_size) if shift_size is not None else None
    for i, xs in enumerate(x_size):
        if xs <= window_size[i]:
            use_window[i] = xs
            if use_shift is not None:
                use_shift[i] = 0
    if use_shift is None:
        return tuple(use_window)
    return tuple(use_window), tuple(use_shift)


def window_partition(x: jax.Array, window_size: Sequence[int],
                     t_split: int = 1) -> jax.Array:
    """(B, D, H, W, C) -> (B*nW, wd*wh*ww, C) (ref: visbackbone/video_swin.py:84-88).

    ``t_split=f > 1`` regroups the window rows as an explicit leading
    temporal axis — (B*nW, f, (wd/f)*wh*ww, C) — at identical cost (the
    window's row order is (t, i, j), so this is a pure row-major reshape of
    the same transposed array). The t-sliced lane kernel consumes this 4D
    form directly: Mosaic block shapes need the second-minor dim to equal
    the array dim, which (…, 49, C) satisfies and a 49-row slice of a
    196-row array does not."""
    b, d, h, w, c = x.shape
    wd, wh, ww = window_size
    x = x.reshape(b, d // wd, wd, h // wh, wh, w // ww, ww, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    if t_split > 1:
        return x.reshape(-1, t_split, (wd // t_split) * wh * ww, c)
    return x.reshape(-1, wd * wh * ww, c)


def window_reverse(windows: jax.Array, window_size: Sequence[int],
                   b: int, d: int, h: int, w: int) -> jax.Array:
    """Inverse of window_partition (ref: visbackbone/video_swin.py:90-93)."""
    wd, wh, ww = window_size
    x = windows.reshape(b, d // wd, h // wh, w // ww, wd, wh, ww, -1)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, d, h, w, -1)


@functools.lru_cache(maxsize=None)
def _relative_position_index(window_size: tuple[int, int, int]) -> np.ndarray:
    """Static (N, N) int32 index into the rel-pos-bias table for the FULL
    window (ref: visbackbone/video_swin.py:123-137)."""
    wd, wh, ww = window_size
    coords = np.stack(np.meshgrid(np.arange(wd), np.arange(wh), np.arange(ww),
                                  indexing="ij"))                      # (3, wd, wh, ww)
    coords = coords.reshape(3, -1)                                     # (3, N)
    rel = coords[:, :, None] - coords[:, None, :]                      # (3, N, N)
    rel = rel.transpose(1, 2, 0)                                       # (N, N, 3)
    rel[:, :, 0] += wd - 1
    rel[:, :, 1] += wh - 1
    rel[:, :, 2] += ww - 1
    rel[:, :, 0] *= (2 * wh - 1) * (2 * ww - 1)
    rel[:, :, 1] *= 2 * ww - 1
    return rel.sum(-1).astype(np.int32)                                # (N, N)


@functools.lru_cache(maxsize=None)
def _axis_onehots(window_size: tuple[int, int, int],
                  eff: tuple[int, int, int]) -> tuple[np.ndarray, ...]:
    """Per-axis one-hot factors of the relative-position index: the 3D index
    is rd*stride_d + rh*stride_h + rw with r_ax = n_ax - m_ax + (w_ax - 1),
    so the scatter-add of the bias-table gradient factorizes into three tiny
    dense contractions (see rel_pos_bias)."""
    outs = []
    for w_full, w_eff in zip(window_size, eff):
        r = 2 * w_full - 1
        a = np.zeros((w_eff, w_eff, r), np.float32)
        for i in range(w_eff):
            for j in range(w_eff):
                a[i, j, i - j + w_full - 1] = 1.0
        outs.append(a)
    return tuple(outs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def rel_pos_bias(table: jax.Array, window_size: tuple[int, int, int],
                 eff: tuple[int, int, int]) -> jax.Array:
    """table (R, nH) -> (nH, N, N) fp32 bias for the effective window.

    Forward is the reference's gather + slice (visbackbone/video_swin.py:155;
    clamping only ever shrinks LEADING window dims, so the [:n] slice is the
    restriction to the effective leading extent). The custom backward
    replaces XLA's scatter-add (~5ms/step across the swin stages) with three
    per-axis one-hot contractions — the relative index is separable.
    """
    n = int(np.prod(eff))
    rel_index = _relative_position_index(tuple(window_size))[:n, :n]
    bias = table[rel_index.reshape(-1)].reshape(n, n, -1)
    return bias.transpose(2, 0, 1).astype(jnp.float32)


def _rpb_fwd(table, window_size, eff):
    return rel_pos_bias(table, window_size, eff), None


def _rpb_bwd(window_size, eff, _res, dbias):
    wd, wh, ww = eff
    fd, fh, fw = window_size
    nh = dbias.shape[0]
    ad, ah, aw = (jnp.asarray(a) for a in _axis_onehots(tuple(window_size),
                                                        tuple(eff)))
    d = dbias.transpose(1, 2, 0).reshape(wd, wh, ww, wd, wh, ww, nh)
    t = jnp.einsum("abcdefh,adr->rbcefh", d, ad)
    t = jnp.einsum("rbcefh,bes->rscfh", t, ah)
    t = jnp.einsum("rscfh,cfu->rsuh", t, aw)
    dtable = t.reshape((2 * fd - 1) * (2 * fh - 1) * (2 * fw - 1), nh)
    return (dtable,)


rel_pos_bias.defvjp(_rpb_fwd, _rpb_bwd)


@functools.lru_cache(maxsize=None)
def _shift_attn_mask(dims: tuple[int, int, int],
                     window_size: tuple[int, int, int],
                     shift_size: tuple[int, int, int]) -> np.ndarray:
    """Static (nW, N, N) additive mask for shifted windows
    (ref: visbackbone/video_swin.py:292-307). Pure numpy — becomes an XLA
    constant, replacing the reference's device-side lru-cached tensor."""
    dp, hp, wp = dims
    img_mask = np.zeros((1, dp, hp, wp, 1), dtype=np.float32)
    cnt = 0
    for d in (slice(-window_size[0]), slice(-window_size[0], -shift_size[0]),
              slice(-shift_size[0], None)):
        for h in (slice(-window_size[1]), slice(-window_size[1], -shift_size[1]),
                  slice(-shift_size[1], None)):
            for w in (slice(-window_size[2]), slice(-window_size[2], -shift_size[2]),
                      slice(-shift_size[2], None)):
                img_mask[:, d, h, w, :] = cnt
                cnt += 1
    wd, wh, ww = window_size
    n = wd * wh * ww
    m = img_mask.reshape(1, dp // wd, wd, hp // wh, wh, wp // ww, ww, 1)
    m = m.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(-1, n)             # (nW, N)
    attn_mask = m[:, None, :] - m[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)    # (nW, N, N)


def _flat_dense(dense: nn.Dense, x: jax.Array) -> jax.Array:
    """Apply ``dense`` through a flattened (M, C) view of a >2D input.

    A/B probe (EMVM_FLAT_DENSE=1): XLA lowers position-wise Dense layers on
    5D swin feature maps to 1x1x1 convolutions, whose weight-grad GEMMs
    (tiny (C_in, C_out) outputs with ~2e5-deep contractions) profile ~8x off
    roofline (e.g. 1.63 ms for the 26-GFLOP stage-0 MLP wgrad, round-3e
    trace). Collapsing the leading dims first (layout-free on a contiguous
    channel-last array) makes XLA emit plain 2D dots instead. Params and
    numerics are identical either way.

    VERDICT: measured NET LOSS — pixel flagship 67.4 -> 61.4 clips/s. The
    conv form's slow wgrads are more than paid for by the fusions XLA builds
    around convs on the 5D layout; the reshape boundaries break them. Kept
    opt-in for experiments, default off."""
    import os as _os
    if x.ndim <= 2 or not _os.environ.get("EMVM_FLAT_DENSE"):
        return dense(x)
    shp = x.shape
    return dense(x.reshape(-1, shp[-1])).reshape(*shp[:-1], -1)


class Mlp(nn.Module):
    """Transformer MLP (ref: visbackbone/video_swin.py:65-81)."""

    hidden_features: int
    out_features: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = _flat_dense(nn.Dense(self.hidden_features, dtype=self.dtype,
                                 name="fc1"), x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        x = _flat_dense(nn.Dense(self.out_features, dtype=self.dtype,
                                 name="fc2"), x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return x


class WindowAttention3D(nn.Module):
    """3D window attention with relative position bias
    (ref: visbackbone/video_swin.py:111-172).

    The bias table is parameterized for the FULL configured window; the actual
    (possibly clamped) window slices the index ``[:N, :N]`` exactly like the
    reference (visbackbone/video_swin.py:155). Softmax runs in fp32; the two
    GEMMs run in the module dtype (bf16 on TPU) on the MXU.
    """

    dim: int
    window_size: tuple[int, int, int]   # FULL configured window
    num_heads: int
    qkv_bias: bool = True
    qk_scale: float | None = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask: np.ndarray | None = None,
                 deterministic: bool = True,
                 window_eff: tuple[int, int, int] | None = None):
        """``x`` is either pre-windowed (B_, N, C) or the padded/rolled 5D
        feature map (B, Dp, Hp, Wp, C) with ``window_eff`` (the clamped
        window). The 5D form partitions into windows FIRST, then runs the
        position-wise qkv GEMM on the (B_, N, C) windows — a qkv-first 9D
        mega-transpose variant was measured slower (52.2 -> 49.2 clips/s,
        round 2) and reverted; see the inline comment below."""
        import os as _os
        on_tpu = jax.default_backend() == "tpu"
        pallas_ok = on_tpu or bool(_os.environ.get("EMVM_PALLAS_INTERPRET"))
        use_fused = self.use_pallas and self.attn_drop == 0.0 and pallas_ok

        five_d = x.ndim == 5
        t_fold = 1
        tsliced = False
        direct = False
        if five_d:
            assert window_eff is not None
            wd, wh, ww = window_eff
            b5, dp, hp, wp, _ = x.shape
            n = wd * wh * ww
            # Superwindow fold (per-frame 2D swins, e.g. the frozen 2D
            # feature teacher): T=1 windows give N=49 — tiny programs whose
            # partition transposes are slower than the 196-row folded form
            # (measured both ways, rounds 3-4). Fold ``f`` temporal slices
            # into one window LAYOUT; on the lane path the kernel then runs
            # per-slice (N, N) attention via a t grid dimension (round 4 —
            # the earlier block-diagonal -1e9 superwindow computed 4x the
            # score elements, 3/4 filler, and the kernels are compute-bound
            # on exactly that (N, N) work). The packed fallback keeps the
            # -1e9 expansion. The T-shift is always 0 when wd==1 (clamped),
            # so per-window shift masks are t-independent.
            if (use_fused and wd == 1 and dp > 1
                    and not _os.environ.get("EMVM_NO_TFOLD")):
                for f in (4, 2):
                    if dp % f == 0 and f * n <= 196:
                        t_fold = f
                        break
            if t_fold > 1:
                # round 4: the lane kernel runs the fold natively — a t
                # grid dimension over an explicit (B_, f, n, C) temporal
                # axis, per-slice (n, n) scores — instead of the
                # block-diagonal -1e9 superwindow whose (fn, fn) score
                # matrix was 3/4 filler VPU/MXU work. Decide here so the
                # partition can emit the 4D layout (same transpose).
                from empirical_mvm_tpu.ops.window_attention import (
                    lane_attention_fits as _fits)
                b_pred = (b5 * (dp // (wd * t_fold)) * (hp // wh)
                          * (wp // ww))
                nw_pred = mask.shape[0] // dp if mask is not None else 1
                tsliced = (_fits(b_pred, n, self.dim, self.num_heads,
                                 nw_pred)
                           and not _os.environ.get("EMVM_PACKED_ATTN")
                           and not _os.environ.get("EMVM_NO_TSLICE"))
            # 5D-direct path (round 5, DEFAULT since the clean A/B:
            # flagship 61.93 -> 63.52 clips/s): skip the partition entirely
            # — the kernel (fwd AND native bwd) reads the qkv GEMM output
            # in its native 5D layout, one h-strip of windows per program,
            # and scatters outputs back (no window_reverse either).
            # EMVM_NO_DIRECT_ATTN=1 reverts to partition + lane kernel.
            if (use_fused and t_fold == 1 and self.attn_drop == 0.0
                    and not _os.environ.get("EMVM_NO_DIRECT_ATTN")):
                from empirical_mvm_tpu.ops.window_attention import (
                    direct_attention_fits)
                direct = direct_attention_fits(b5, dp, hp, wp, self.dim,
                                               self.num_heads,
                                               (wd, wh, ww))
            if not direct:
                # Partition BEFORE the qkv GEMM. A single 9D
                # qkv-before-partition mega-transpose was measured SLOWER
                # (52.2 -> 49.2 clips/s, round 2): its (…, ww, 3nH, hd)
                # sublane pattern beats two clean transposes only on paper.
                x = window_partition(x, (wd * t_fold, wh, ww),
                                     t_split=t_fold if tsliced else 1)
        b_ = x.shape[0]
        if not five_d:
            n = x.shape[1]
        c = self.dim
        nh = self.num_heads
        head_dim = c // nh
        scale = self.qk_scale or head_dim ** -0.5

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(stddev=0.02),
            ((2 * self.window_size[0] - 1) * (2 * self.window_size[1] - 1)
             * (2 * self.window_size[2] - 1), self.num_heads),
        )
        # position-wise: applies equally to (B_, N, C) and (B, Dp, Hp, Wp, C)
        qkv = _flat_dense(nn.Dense(self.dim * 3, use_bias=self.qkv_bias,
                                   dtype=self.dtype, name="qkv"), x)

        # bias (nH, N, N): the custom-VJP path replaces the table-grad
        # scatter-add with separable per-axis contractions. It requires the
        # [:n] slice to be a clean leading-axis restriction — true whenever
        # only leading window dims clamp (T in practice); otherwise fall
        # back to the gather + autodiff scatter.
        if (five_d and window_eff[1] == self.window_size[1]
                and window_eff[2] == self.window_size[2]):
            bias = rel_pos_bias(table, tuple(self.window_size),
                                tuple(window_eff))
        else:
            rel_index = _relative_position_index(
                tuple(self.window_size))[:n, :n]
            bias = table[rel_index.reshape(-1)].reshape(n, n, -1)
            bias = bias.transpose(2, 0, 1).astype(jnp.float32)  # (nH, N, N)

        if use_fused:
            # fused Pallas path (round 3): the lane-sliced kernel consumes
            # the qkv GEMM output (B_, N, 3C) DIRECTLY — q/k/v are
            # 128-divisible lane segments of the 3C axis, heads split
            # in-kernel — and returns (B_, N, C) for the proj GEMM. No
            # layout transpose on either side (the packed (B_, 3nH, N, hd)
            # relayout cost ~1.8ms x ~10 instances/step incl. remat
            # duplicates in the round-3 trace; see ops/window_attention.py)
            from empirical_mvm_tpu.ops.window_attention import (
                lane_attention_fits, lane_window_attention,
                packed_window_attention)
            n_k = n * t_fold                           # kernel window size
            # has_mask=False skips the kernels' additive-mask VPU pass on
            # UNSHIFTED blocks (half of all blocks), which previously added
            # an all-zeros mask per score element; mask_arr stays as the
            # VJP-signature placeholder
            has_mask = mask is not None
            nw_hw = (mask.shape[0] // dp if (mask is not None and t_fold > 1)
                     else (mask.shape[0] if mask is not None else 1))
            # the lane kernel handles the fold natively (t_slices grid dim,
            # per-slice bias/mask — no score inflation); fit-check at the
            # per-slice window size. ``tsliced`` was decided BEFORE the
            # partition (the 4D window layout depends on it) — this must
            # agree with it.
            lane_ok = (lane_attention_fits(b_, n, c, nh, nw_hw)
                       and not _os.environ.get("EMVM_PACKED_ATTN"))
            assert tsliced == (t_fold > 1 and lane_ok
                               and not _os.environ.get("EMVM_NO_TSLICE"))
            if five_d and direct:
                from empirical_mvm_tpu.ops.window_attention import (
                    direct_window_attention)
                if mask is not None:
                    mask_arr = jnp.asarray(mask, jnp.float32)
                else:
                    mask_arr = jnp.zeros((1, n, n), jnp.float32)
                x = direct_window_attention(
                    qkv, bias, mask_arr, (wd, wh, ww), nh, float(scale),
                    not on_tpu, has_mask).astype(self.dtype)
                # (B, Dp, Hp, Wp, C) — already in feature-map layout
            elif tsliced:
                # per-frame masks are t-independent (t-shift is 0 when the
                # temporal window clamps to 1): slice the first hw periods
                if mask is not None:
                    mask_arr = jnp.asarray(mask[:nw_hw], jnp.float32)
                else:
                    mask_arr = jnp.zeros((1, n, n), jnp.float32)
                x = lane_window_attention(
                    qkv, bias, mask_arr, nw_hw, nh, float(scale),
                    not on_tpu, has_mask,
                    t_slices=t_fold).astype(self.dtype)       # (B_, f, N, C)
            elif t_fold > 1:
                # packed fallback keeps the block-diagonal superwindow
                # expansion: diagonal t-blocks carry the real values,
                # off-blocks are -1e9 (bias) / 0 (mask); where() routes the
                # bias gradient back to the f diagonal blocks, so the
                # rel-pos table grad is exact
                eye = np.kron(np.eye(t_fold, dtype=bool),
                              np.ones((n, n), dtype=bool))      # (Nk, Nk)
                e = jnp.asarray(eye)
                bias = jnp.where(e, jnp.tile(bias, (1, t_fold, t_fold)),
                                 jnp.float32(-1e9))
                if mask is not None:
                    mask_arr = jnp.where(
                        e, jnp.tile(jnp.asarray(mask[:nw_hw], jnp.float32),
                                    (1, t_fold, t_fold)), 0.0)
                    nw = nw_hw
                else:
                    mask_arr = jnp.zeros((1, n_k, n_k), jnp.float32)
                    nw = 1
            elif mask is not None:
                mask_arr = jnp.asarray(mask, jnp.float32)
                nw = mask.shape[0]
            else:
                mask_arr = jnp.zeros((1, n_k, n_k), jnp.float32)
                nw = 1
            if lane_ok and not tsliced and not direct:
                x = lane_window_attention(
                    qkv, bias, mask_arr, nw, nh, float(scale),
                    not on_tpu, has_mask).astype(self.dtype)  # (B_, Nk, C)
            elif not tsliced and not direct:
                # packed fallback (EMVM_PACKED_ATTN=1 or non-128-divisible C)
                qkv = qkv.reshape(b_, n_k, 3 * nh, head_dim)
                qkv = qkv.transpose(0, 2, 1, 3)        # (B_, 3nH, Nk, hd)
                x = packed_window_attention(
                    qkv, bias, mask_arr, nw, nh, float(scale),
                    not on_tpu, has_mask)              # (B_, nH, Nk, hd)
                x = (x.astype(self.dtype).transpose(0, 2, 1, 3)
                     .reshape(b_, n_k, c))
        else:
            qkv = qkv.reshape(b_, n, 3, self.num_heads, head_dim)
            qkv = qkv.transpose(2, 0, 3, 1, 4)             # (3, B_, nH, N, hd)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k,
                              preferred_element_type=jnp.float32)
            attn = attn + bias[None]
            if mask is not None:                                # (nW, N, N)
                nw = mask.shape[0]
                attn = attn.reshape(b_ // nw, nw, self.num_heads, n, n)
                attn = attn + jnp.asarray(mask, jnp.float32)[None, :, None]
                attn = attn.reshape(-1, self.num_heads, n, n)
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            attn = nn.Dropout(self.attn_drop)(attn,
                                              deterministic=deterministic)
            x = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                           preferred_element_type=jnp.float32)
            x = x.astype(self.dtype).transpose(0, 2, 1, 3).reshape(b_, n, c)

        x = _flat_dense(nn.Dense(self.dim, dtype=self.dtype, name="proj"), x)
        x = nn.Dropout(self.proj_drop)(x, deterministic=deterministic)
        if five_d and not direct:
            x = window_reverse(x, (window_eff[0] * t_fold, *window_eff[1:]),
                               b5, dp, hp, wp)
        return x


def drop_path(x: jax.Array, rate, deterministic: bool,
              rng: jax.Array | None) -> jax.Array:
    """Stochastic depth (ref: visbackbone/video_swin.py:46-63).

    ``rate`` may be a traced scalar (the scanned-stage path feeds per-block
    rates as scan inputs)."""
    if deterministic or (isinstance(rate, float) and rate == 0.0):
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class SwinTransformerBlock3D(nn.Module):
    """One Swin block: windowed MSA + MLP with cyclic shift
    (ref: visbackbone/video_swin.py:175-263)."""

    dim: int
    num_heads: int
    window_size: tuple[int, int, int] = (2, 7, 7)
    shift_size: tuple[int, int, int] = (0, 0, 0)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: float | None = None
    drop: float = 0.0
    attn_drop: float = 0.0
    use_pallas: bool = False
    use_pallas_ln: bool | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask: np.ndarray | None,
                 drop_path_rate=0.0, deterministic: bool = True):
        # drop_path_rate is a call arg (python float or traced scalar) so the
        # scanned-stage path can feed per-block rates as scan inputs
        b, d, h, w, c = x.shape
        window_size, shift_size = get_window_size(
            (d, h, w), self.window_size, self.shift_size)

        shortcut = x
        x = layer_norm(1e-5, self.dtype, "norm1", self.use_pallas_ln)(x)

        # pad to window multiples (ref: visbackbone/video_swin.py:213-218)
        pad_d = (window_size[0] - d % window_size[0]) % window_size[0]
        pad_b = (window_size[1] - h % window_size[1]) % window_size[1]
        pad_r = (window_size[2] - w % window_size[2]) % window_size[2]
        x = jnp.pad(x, ((0, 0), (0, pad_d), (0, pad_b), (0, pad_r), (0, 0)))
        _, dp, hp, wp, _ = x.shape

        shifted = any(s > 0 for s in shift_size)
        if shifted:
            x = jnp.roll(x, shift=(-shift_size[0], -shift_size[1], -shift_size[2]),
                         axis=(1, 2, 3))
            mask = attn_mask
        else:
            mask = None

        # the attention module handles window partition/reverse internally:
        # on the fused path they fold into the qkv/output transposes
        x = WindowAttention3D(
            dim=self.dim, window_size=self.window_size, num_heads=self.num_heads,
            qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
            attn_drop=self.attn_drop, proj_drop=self.drop,
            use_pallas=self.use_pallas, dtype=self.dtype,
            name="attn")(x, mask=mask, deterministic=deterministic,
                         window_eff=window_size)

        if shifted:
            x = jnp.roll(x, shift=shift_size, axis=(1, 2, 3))
        if pad_d > 0 or pad_b > 0 or pad_r > 0:
            x = x[:, :d, :h, :w, :]

        has_dp = not (isinstance(drop_path_rate, float)
                      and drop_path_rate == 0.0)
        dp_rng = (self.make_rng("dropout")
                  if (not deterministic and has_dp) else None)
        x = shortcut + drop_path(x, drop_path_rate, deterministic, dp_rng)

        y = layer_norm(1e-5, self.dtype, "norm2", self.use_pallas_ln)(x)
        y = Mlp(hidden_features=int(self.dim * self.mlp_ratio),
                out_features=self.dim, dropout_rate=self.drop,
                dtype=self.dtype, name="mlp")(y, deterministic=deterministic)
        dp_rng2 = (self.make_rng("dropout")
                   if (not deterministic and has_dp) else None)
        return x + drop_path(y, drop_path_rate, deterministic, dp_rng2)


class PatchMerging(nn.Module):
    """2x2 spatial merge between stages (ref: visbackbone/video_swin.py:266-289)."""

    dim: int
    use_pallas_ln: bool | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, d, h, w, c = x.shape
        if h % 2 == 1 or w % 2 == 1:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x0 = x[:, :, 0::2, 0::2, :]
        x1 = x[:, :, 1::2, 0::2, :]
        x2 = x[:, :, 0::2, 1::2, :]
        x3 = x[:, :, 1::2, 1::2, :]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = layer_norm(1e-5, self.dtype, "norm", self.use_pallas_ln)(x)
        x = _flat_dense(nn.Dense(2 * self.dim, use_bias=False,
                                 dtype=self.dtype, name="reduction"), x)
        return x


class SwinBlockPair(nn.Module):
    """A (no-shift, shift) Swin block pair — the nn.scan unit for a stage.

    ``block_common`` is the shared block kwargs as a sorted items tuple
    (flax module fields must be hashable); ``rates`` carries the two
    per-block stochastic-depth rates as a scan input."""

    block_common: tuple
    half_shift: tuple[int, int, int]
    remat: bool = False

    @nn.compact
    def __call__(self, x, attn_mask, rates, deterministic: bool = True):
        common = dict(self.block_common)
        cls = (nn.remat(SwinTransformerBlock3D, static_argnums=(4,))
               if self.remat else SwinTransformerBlock3D)
        x = cls(shift_size=(0, 0, 0), name="blk0", **common)(
            x, attn_mask, rates[0], deterministic)
        x = cls(shift_size=self.half_shift, name="blk1", **common)(
            x, attn_mask, rates[1], deterministic)
        return x


def swin_stack_stage_blocks(stage: dict, depth: int) -> dict:
    """Per-block stage params {'blocks_0'..'blocks_{d-1}', ...} ->
    scanned layout {'pairs': {'blk0': stacked evens, 'blk1': stacked odds},
    ...}. Non-block keys (downsample) pass through."""
    out = {k: v for k, v in stage.items() if not k.startswith("blocks_")}
    evens = [stage[f"blocks_{i}"] for i in range(0, depth, 2)]
    odds = [stage[f"blocks_{i}"] for i in range(1, depth, 2)]
    out["pairs"] = {
        "blk0": jax.tree.map(lambda *xs: np.stack(xs), *evens),
        "blk1": jax.tree.map(lambda *xs: np.stack(xs), *odds),
    }
    return out


def swin_unstack_stage_blocks(stage: dict) -> dict:
    """Inverse of :func:`swin_stack_stage_blocks`."""
    out = {k: v for k, v in stage.items() if k != "pairs"}
    pairs = stage["pairs"]
    n = int(np.shape(jax.tree.leaves(pairs["blk0"])[0])[0])
    for i in range(n):
        out[f"blocks_{2 * i}"] = jax.tree.map(
            lambda x, i=i: np.asarray(x)[i], pairs["blk0"])
        out[f"blocks_{2 * i + 1}"] = jax.tree.map(
            lambda x, i=i: np.asarray(x)[i], pairs["blk1"])
    return out


class BasicLayer(nn.Module):
    """One Swin stage (ref: visbackbone/video_swin.py:310-370)."""

    dim: int
    depth: int
    num_heads: int
    window_size: tuple[int, int, int] = (1, 7, 7)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: float | None = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rates: tuple[float, ...] = ()
    downsample: bool = False
    remat: bool = False
    use_pallas: bool = False
    use_pallas_ln: bool | None = None
    scan: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, d, h, w, c = x.shape
        window_size, shift_size = get_window_size(
            (d, h, w), self.window_size,
            tuple(s // 2 for s in self.window_size))
        dp = int(np.ceil(d / window_size[0])) * window_size[0]
        hp = int(np.ceil(h / window_size[1])) * window_size[1]
        wp = int(np.ceil(w / window_size[2])) * window_size[2]
        attn_mask = _shift_attn_mask((dp, hp, wp), window_size, shift_size)

        # rematerialize per block on demand — the reference's fairscale
        # checkpoint_wrapper / torch.utils.checkpoint equivalent
        # (ref: model.py:149, visbackbone/video_swin.py:252-261)
        # static_argnums counts the bound module as arg 0:
        # (self, x, attn_mask, drop_path_rate, deterministic) -> det is 4
        block_cls = (nn.remat(SwinTransformerBlock3D,
                              static_argnums=(4,))
                     if self.remat else SwinTransformerBlock3D)
        common = dict(dim=self.dim, num_heads=self.num_heads,
                      window_size=self.window_size, mlp_ratio=self.mlp_ratio,
                      qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
                      drop=self.drop, attn_drop=self.attn_drop,
                      use_pallas=self.use_pallas,
                      use_pallas_ln=self.use_pallas_ln, dtype=self.dtype)
        half_shift = tuple(s // 2 for s in self.window_size)
        rates = [self.drop_path_rates[i]
                 if i < len(self.drop_path_rates) else 0.0
                 for i in range(self.depth)]

        if self.scan and self.depth >= 4 and self.depth % 2 == 0:
            # fold (no-shift, shift) block pairs into one nn.scan step:
            # the trace/HLO shrinks depth/2-fold — the compile-time lever
            # for the 18-block stage. Params live under
            # pairs.{blk0,blk1}.<p> with a leading (depth/2, ...) axis;
            # see swin_stack_stage_blocks for per-block conversion.
            rate_pairs = jnp.asarray(rates, jnp.float32).reshape(-1, 2)

            def body(pair, carry, rate2):
                return pair(carry, attn_mask, rate2, deterministic), None

            scan = nn.scan(body,
                           variable_axes={"params": 0},
                           split_rngs={"params": True, "dropout": True},
                           in_axes=(0,), length=self.depth // 2)
            x, _ = scan(
                SwinBlockPair(block_common=tuple(sorted(common.items())),
                              half_shift=half_shift, remat=self.remat,
                              name="pairs"),
                x, rate_pairs)
        else:
            for i in range(self.depth):
                x = block_cls(
                    shift_size=((0, 0, 0) if i % 2 == 0 else half_shift),
                    name=f"blocks_{i}", **common,
                )(x, attn_mask, rates[i], deterministic)

        if self.downsample:
            x = PatchMerging(dim=self.dim, use_pallas_ln=self.use_pallas_ln,
                             dtype=self.dtype, name="downsample")(x)
        return x


class SwinTransformer3D(nn.Module):
    """Full backbone (ref: visbackbone/video_swin.py:410-482).

    Input  ``(B, T, H, W, 3)`` channel-last, ImageNet-normalized.
    Output ``(B, T, H/32, W/32, num_features)`` — the final LayerNorm is
    applied channel-last exactly like the reference's permuted norm
    (visbackbone/video_swin.py:478-480).
    """

    config: SwinConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.config
        x = patch_embed_3d(
            x,
            kernel=self.param("patch_embed_proj_kernel",
                              nn.initializers.lecun_normal(),
                              (*cfg.patch_size, x.shape[-1], cfg.embed_dim)),
            bias=self.param("patch_embed_proj_bias", nn.initializers.zeros,
                            (cfg.embed_dim,)),
            patch_size=cfg.patch_size,
            dtype=self.dtype,
        )
        if cfg.patch_norm:
            x = layer_norm(1e-5, self.dtype, "patch_embed_norm",
                           cfg.use_pallas_layernorm)(x)
        x = nn.Dropout(cfg.drop_rate)(x, deterministic=deterministic)

        dpr = np.linspace(0, cfg.drop_path_rate, sum(cfg.depths)).tolist()
        for i, depth in enumerate(cfg.depths):
            start = sum(cfg.depths[:i])
            x = BasicLayer(
                dim=int(cfg.embed_dim * 2 ** i),
                depth=depth,
                num_heads=cfg.num_heads[i],
                window_size=cfg.window_size,
                mlp_ratio=cfg.mlp_ratio,
                qkv_bias=cfg.qkv_bias,
                qk_scale=cfg.qk_scale,
                drop=cfg.drop_rate,
                attn_drop=cfg.attn_drop_rate,
                drop_path_rates=tuple(dpr[start:start + depth]),
                downsample=(i < len(cfg.depths) - 1),
                remat=cfg.remat,
                use_pallas=cfg.use_pallas_attention,
                use_pallas_ln=cfg.use_pallas_layernorm,
                scan=cfg.scan,
                dtype=self.dtype,
                name=f"layers_{i}",
            )(x, deterministic=deterministic)

        if cfg.final_norm:
            x = layer_norm(1e-5, self.dtype, "norm",
                           cfg.use_pallas_layernorm)(x)
        return x
