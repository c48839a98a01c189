"""Fused window attention Pallas kernel for Video Swin.

The reference computes window attention as separate cuDNN/cuBLAS calls with
the (B_, nH, N, N) attention matrix materialized in HBM
(ref: visbackbone/video_swin.py:147-172). On TPU that N x N intermediate is
the dominant HBM round-trip of the backbone (stage 0: ~B*64 windows x heads x
196^2 floats, written then re-read). This kernel keeps the whole
score -> +bias -> +shift-mask -> softmax -> @v chain in VMEM:

  grid = (head_tiles, B_/G) — G windows x a tile of heads per program.
  Windows are tiny (N=196, hd=32), so per-window programs are dominated by
  grid/DMA overhead: batching G windows into one program amortizes it ~Gx
  (measured: the swin-base fwd+bwd attention cost drops ~2.5x at batch 16).
  All reshapes/broadcasts touch leading dims only — the lane/sublane layout
  (N, hd minor) never changes, which Mosaic handles natively. (A channel-last
  variant that split heads in-kernel crashed the Mosaic compiler; leading-dim
  blocking is the safe axis.)

  q/k/v blocks (G, Hb, N, hd) stream HBM->VMEM with double buffering;
  the relative-position bias tile (Hb, N, N) stays resident in VMEM;
  the shift mask block (G, N, N) rides the same index map (windows within a
  block are consecutive, so its block index is b % (nW/G)).

VMEM: the backward holds ~5 (G*Hb, N, N) fp32 temporaries, the forward ~2;
per-pass unit caps (_FWD_UNITS/_BWD_UNITS) keep them inside v5e's ~16MB
VMEM/core with room for block double-buffering (caps found empirically —
oversubscription crashes the Mosaic compiler with an opaque 500).

Falls back to the pure-XLA einsum path off-TPU (CPU tests run the kernel in
interpreter mode for parity).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Max G*Hb (window, head) units per program, found empirically on v5e
# (~16MB VMEM/core): the forward holds ~2 fp32 (N, N) temporaries per unit,
# the backward ~4 fp32 + 2 bf16 (s/p/dp/ds stay fp32 even with bf16 matmul
# operands), so the backward caps at half the units. 16 bwd units
# oversubscribes VMEM and crashes the Mosaic compiler with an opaque
# remote-compile 500; 12 compiles but is no faster than 8 (kbench sweep,
# round 2). Env overrides are for tuning experiments (tools/kbench.py).
import os as _os
_FWD_UNITS = int(_os.environ.get("EMVM_FWD_UNITS", "16"))
_BWD_UNITS = int(_os.environ.get("EMVM_BWD_UNITS", "8"))


def _compiler_params():
    """Raise Mosaic's scoped-VMEM ceiling above its 16MB default.

    v5e has 128MB of physical VMEM per core; the round-3e "13MB budget
    crashes Mosaic" result was the 16MB DEFAULT scoped limit, not
    hardware. Raising ``vmem_limit_bytes`` lets ``EMVM_LANE_BUDGET_MB``
    grow the window-group size g — the measured kernel cost law is
    ~per-program issue overhead x (B_/g), so bigger g is a direct win.
    """
    mb = int(_os.environ.get("EMVM_VMEM_LIMIT_MB", "96"))
    return pltpu.CompilerParams(vmem_limit_bytes=mb * 2**20)


def _attn_kernel(*refs, scale, has_mask=True):
    # matmuls run in the INPUT dtype (bf16 from the model) with fp32
    # accumulation — the MXU multiplies bf16 natively; fp32 multiplies cost
    # several passes. Softmax and the bias/mask adds stay fp32.
    #
    # VPU-pass economy (round 3e: the kernels are VPU-bound on fp32 (N, N)
    # elementwise work, not MXU-bound — score-element count tracks measured
    # time across stages): the *scale fold rides the (N, hd) q block instead
    # of an (N, N) pass, and has_mask=False skips the additive-mask pass
    # entirely (every UNSHIFTED swin block — half of them — previously added
    # an all-zeros mask).
    if has_mask:
        q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref = refs
    else:
        q_ref, k_ref, v_ref, bias_ref, o_ref = refs
    q = q_ref[...]                             # (G, Hb, N, hd)
    k = k_ref[...]
    v = v_ref[...]
    g, hb, n, hd = q.shape
    q = q * jnp.asarray(scale, q.dtype)            # fold scale into q

    s = jax.lax.dot_general(
        q.reshape(g * hb, n, hd), k.reshape(g * hb, n, hd),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)     # (G*Hb, N, N) fp32
    s = s.reshape(g, hb, n, n)
    s = s + bias_ref[...][None]                 # rel-pos bias (Hb, N, N)
    if has_mask:
        m = mask_ref[...]                       # (G or 1, N, N)
        s = s + jnp.broadcast_to(m[:, None], (m.shape[0], hb, n, n)) \
            if m.shape[0] == g else s + m[0][None, None]

    p = jax.nn.softmax(s.reshape(g * hb, n, n), axis=-1).astype(v.dtype)
    o = jax.lax.dot_general(
        p, v.reshape(g * hb, n, hd),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)     # (G*Hb, N, hd)
    o_ref[...] = o.reshape(g, hb, n, hd).astype(o_ref.dtype)


def _attn_bwd_kernel(*refs, scale, has_mask=True):
    """Recompute-then-differentiate backward (flash-attention style, G
    windows x one head-tile per program). The rel-pos-bias cotangent
    accumulates across the sequential grid into a single block.

    Matmul operands stay in the INPUT dtype (bf16 from the model) with fp32
    accumulation; softmax and the ds reduction run fp32. p/ds are cast back
    to the input dtype for their matmuls — standard mixed-precision flash
    attention. Halving the (N, N) operand bytes also lifts the VMEM unit cap
    8 -> 16.

    Scale handling under the q-side fold: with qs = q*scale, the recompute
    is s = qs k^T and dk = ds^T qs (= scale ds^T q) needs NO extra scale;
    dq = (ds k) * scale keeps its (N, hd)-sized scale pass."""
    if has_mask:
        (q_ref, k_ref, v_ref, bias_ref, mask_ref, do_ref,
         dq_ref, dk_ref, dv_ref, dbias_ref) = refs
    else:
        (q_ref, k_ref, v_ref, bias_ref, do_ref,
         dq_ref, dk_ref, dv_ref, dbias_ref) = refs
    b = pl.program_id(1)

    q = q_ref[...]                              # (G, Hb, N, hd)
    g, hb, n, hd = q.shape
    q = q.reshape(g * hb, n, hd)
    k = k_ref[...].reshape(g * hb, n, hd)
    v = v_ref[...].reshape(g * hb, n, hd)
    do = do_ref[...].reshape(g * hb, n, hd)
    dtype = q.dtype
    qs = q * jnp.asarray(scale, dtype)

    s = jax.lax.dot_general(qs, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    s = s.reshape(g, hb, n, n) + bias_ref[...][None]
    if has_mask:
        m = mask_ref[...]
        s = s + jnp.broadcast_to(m[:, None], (m.shape[0], hb, n, n)) \
            if m.shape[0] == g else s + m[0][None, None]
    p = jax.nn.softmax(s.reshape(g * hb, n, n), axis=-1)   # (G*Hb, N, N) f32
    p_lo = p.astype(dtype)

    # dv = p^T @ do
    dv = jax.lax.dot_general(p_lo, do, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    # dp = do @ v^T
    dp = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))   # f32
    ds_lo = ds.astype(dtype)

    dq = jax.lax.dot_general(ds_lo, k, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(ds_lo, qs, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)

    dq_ref[...] = dq.reshape(g, hb, n, hd).astype(dq_ref.dtype)
    dk_ref[...] = dk.reshape(g, hb, n, hd).astype(dk_ref.dtype)
    dv_ref[...] = dv.reshape(g, hb, n, hd).astype(dv_ref.dtype)

    @pl.when(b == 0)
    def _():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    dbias_ref[...] += jnp.sum(ds.reshape(g, hb, n, n), axis=0)


def _tiles(b_: int, nh: int, n: int, n_windows: int,
           cap: int) -> tuple[int, int]:
    """(head_tile, window_tile) with head_tile*window_tile <= cap; the window
    tile must divide the window count (so a block never crosses a batch
    row's window boundary) and B_.

    The cap budgets VMEM for fp32 (N, N) softmax temporaries at the flagship
    N=196; smaller windows (the 2D teacher's N=49, stage-3's clamped
    windows) have quadratically smaller temporaries, so the cap scales by
    (196/N)^2, clamped to 64 units — 256 units at N=49 oversubscribed VMEM
    and crashed the Mosaic compile helper (round 3). Fewer, fatter programs
    amortize grid/DMA overhead (the N=49 teacher otherwise spends
    ~10ms/step on per-window program overhead)."""
    if n < 196:
        cap = min(cap * ((196 * 196) // (n * n)), 64)
    hb = min(nh, 8, cap)
    while nh % hb:
        hb -= 1
    g_domain = n_windows if n_windows > 1 else b_
    g = max(1, min(g_domain, cap // hb))
    while g_domain % g or b_ % g:
        g -= 1
    return hb, g


def _specs(b_, nh, n, hd, n_windows, cap):
    hb, g = _tiles(b_, nh, n, n_windows, cap)
    n_ht = nh // hb
    n_b = b_ // g
    qkv_spec = pl.BlockSpec((g, hb, n, hd), lambda ht, b: (b, ht, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((hb, n, n), lambda ht, b: (ht, 0, 0),
                             memory_space=pltpu.VMEM)
    if n_windows > 1:
        gm = g
        mask_spec = pl.BlockSpec((g, n, n),
                                 lambda ht, b: (b % (n_windows // g), 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        gm = 1
        mask_spec = pl.BlockSpec((1, n, n), lambda ht, b: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
    del gm
    return qkv_spec, bias_spec, mask_spec, (n_ht, n_b)


def _fwd_pallas(q, k, v, bias, mask, n_windows, scale, interpret,
                has_mask=True):
    b_, nh, n, hd = q.shape
    qkv_spec, bias_spec, mask_spec, grid = _specs(b_, nh, n, hd, n_windows,
                                                   _FWD_UNITS)
    flops = 2 * 2 * b_ * nh * n * n * hd
    in_specs = [qkv_spec, qkv_spec, qkv_spec, bias_spec]
    args = [q, k, v, bias]
    if has_mask:
        in_specs.append(mask_spec)
        args.append(mask)
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, has_mask=has_mask),
        grid=grid,
        in_specs=in_specs,
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=3 * q.size * q.dtype.itemsize + q.size * 2,
            transcendentals=b_ * nh * n * n),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(*args)


def _bwd_pallas(q, k, v, bias, mask, do, n_windows, scale, interpret,
                has_mask=True):
    b_, nh, n, hd = q.shape
    qkv_spec, bias_spec, mask_spec, grid = _specs(b_, nh, n, hd, n_windows,
                                                   _BWD_UNITS)
    in_specs = [qkv_spec, qkv_spec, qkv_spec, bias_spec]
    args = [q, k, v, bias]
    if has_mask:
        in_specs.append(mask_spec)
        args.append(mask)
    in_specs.append(qkv_spec)
    args.append(do)
    dq, dk, dv, dbias = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale, has_mask=has_mask),
        grid=grid,
        in_specs=in_specs,
        out_specs=(qkv_spec, qkv_spec, qkv_spec, bias_spec),
        out_shape=(jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(bias.shape, jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b_ * nh * n * n * hd,
            bytes_accessed=5 * q.size * q.dtype.itemsize,
            transcendentals=b_ * nh * n * n),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(*args)
    return dq, dk, dv, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_window_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                           bias: jax.Array, mask: jax.Array,
                           n_windows: int, scale: float,
                           interpret: bool = False) -> jax.Array:
    """softmax(q k^T * scale + bias + mask) v, fused per window.

    Args:
      q, k, v: (B_, nH, N, hd) where B_ = batch * n_windows.
      bias:    (nH, N, N) fp32 relative-position bias (trainable -> has VJP).
      mask:    (n_windows, N, N) fp32 additive shift mask (constant).
    Returns:
      (B_, nH, N, hd) in q.dtype.
    """
    b_ = q.shape[0]
    assert b_ % n_windows == 0
    return _fwd_pallas(q, k, v, bias, mask, n_windows, scale, interpret)


def _fwa_fwd(q, k, v, bias, mask, n_windows, scale, interpret):
    out = _fwd_pallas(q, k, v, bias, mask, n_windows, scale, interpret)
    return out, (q, k, v, bias, mask)


def _fwa_bwd(n_windows, scale, interpret, res, do):
    q, k, v, bias, mask = res
    dq, dk, dv, dbias = _bwd_pallas(q, k, v, bias, mask, do, n_windows,
                                    scale, interpret)
    return dq, dk, dv, dbias, jnp.zeros_like(mask)


fused_window_attention.defvjp(_fwa_fwd, _fwa_bwd)


# ---------------------------------------------------------------------------
# Packed-layout entry: q/k/v ride ONE (B_, 3*nH, N, hd) array — a single
# transpose of the qkv projection output — and the kernel picks its q/k/v
# head-tiles via BlockSpec index maps on the same array. This replaces the
# unpacked path's (B_, N, 3, nH, hd) bias-add/reshape -> transpose -> slice
# chain (profiled at ~2x the attention math itself per swin layer, round-2
# trace: add_bitcast 2.0ms + layout copies 4.9ms + qkv slice 2.0ms vs attn
# 2.35ms at stage 0) with one clean transpose each way. A true zero-copy
# variant (column blocks straight off the (B_, N, 3*dim) GEMM output) is
# rejected by the Mosaic lowering: block minor dims must be 128-divisible or
# whole, and hd=32 is neither. The kernel bodies are shared with the
# unpacked path.
# ---------------------------------------------------------------------------


def _packed_specs(b_, nh, n, hd, n_windows, cap):
    hb, g = _tiles(b_, nh, n, n_windows, cap)
    n_ht = nh // hb
    # inputs: (B_, 3*nH, N, hd); segment s of {q,k,v} for head-tile ht sits
    # at dim-1 block index s*n_ht + ht
    qkv = lambda seg: pl.BlockSpec(
        (g, hb, n, hd), lambda ht, b, s=seg: (b, s * n_ht + ht, 0, 0),
        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((g, hb, n, hd), lambda ht, b: (b, ht, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((hb, n, n), lambda ht, b: (ht, 0, 0),
                             memory_space=pltpu.VMEM)
    if n_windows > 1:
        mask_spec = pl.BlockSpec((g, n, n),
                                 lambda ht, b: (b % (n_windows // g), 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        mask_spec = pl.BlockSpec((1, n, n), lambda ht, b: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
    return qkv, out_spec, bias_spec, mask_spec, (n_ht, b_ // g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def packed_window_attention(qkv: jax.Array, bias: jax.Array, mask: jax.Array,
                            n_windows: int, n_heads: int, scale: float,
                            interpret: bool = False,
                            has_mask: bool = True) -> jax.Array:
    """Fused window attention over the packed qkv tensor.

    Args:
      qkv:  (B_, 3*nH, N, hd) — the qkv Dense output transposed once; dim 1
            is ordered (3, nH) exactly like the reference's reshape
            (ref: visbackbone/video_swin.py:147-150).
      bias: (nH, N, N) fp32 relative-position bias (trainable).
      mask: (n_windows, N, N) fp32 additive shift mask (constant).
    Returns:
      (B_, nH, N, hd) in qkv.dtype.

    ``has_mask=False`` (static) skips the additive-mask VPU pass; the mask
    argument is then only a VJP-signature placeholder (pass zeros).
    """
    return _packed_fwd(qkv, bias, mask, n_windows, n_heads, scale,
                       interpret, has_mask)[0]


def _packed_fwd(qkv, bias, mask, n_windows, n_heads, scale, interpret,
                has_mask=True):
    b_, three_nh, n, hd = qkv.shape
    assert b_ % n_windows == 0 and three_nh == 3 * n_heads
    qkv_spec, out_spec, bias_spec, mask_spec, grid = _packed_specs(
        b_, n_heads, n, hd, n_windows, _FWD_UNITS)
    in_specs = [qkv_spec(0), qkv_spec(1), qkv_spec(2), bias_spec]
    args = [qkv, qkv, qkv, bias]
    if has_mask:
        in_specs.append(mask_spec)
        args.append(mask)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, has_mask=has_mask),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b_, n_heads, n, hd), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b_ * n_heads * n * n * hd,
            bytes_accessed=4 * b_ * n_heads * n * hd * qkv.dtype.itemsize,
            transcendentals=b_ * n_heads * n * n),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(*args)
    return out, (qkv, bias, mask)


def _packed_bwd(n_windows, n_heads, scale, interpret, has_mask, res, do):
    qkv, bias, mask = res
    b_, three_nh, n, hd = qkv.shape
    qkv_spec, out_spec, bias_spec, mask_spec, grid = _packed_specs(
        b_, n_heads, n, hd, n_windows, _BWD_UNITS)
    in_specs = [qkv_spec(0), qkv_spec(1), qkv_spec(2), bias_spec]
    args = [qkv, qkv, qkv, bias]
    if has_mask:
        in_specs.append(mask_spec)
        args.append(mask)
    in_specs.append(out_spec)
    args.append(do)
    dq, dk, dv, dbias = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale, has_mask=has_mask),
        grid=grid,
        in_specs=in_specs,
        out_specs=(out_spec, out_spec, out_spec, bias_spec),
        out_shape=(jax.ShapeDtypeStruct((b_, n_heads, n, hd), qkv.dtype),
                   jax.ShapeDtypeStruct((b_, n_heads, n, hd), qkv.dtype),
                   jax.ShapeDtypeStruct((b_, n_heads, n, hd), qkv.dtype),
                   jax.ShapeDtypeStruct(bias.shape, jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b_ * n_heads * n * n * hd,
            bytes_accessed=8 * b_ * n_heads * n * hd * qkv.dtype.itemsize,
            transcendentals=b_ * n_heads * n * n),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(*args)
    dqkv = jnp.concatenate([dq, dk, dv], axis=1)
    return dqkv, dbias, jnp.zeros_like(mask)


packed_window_attention.defvjp(_packed_fwd, _packed_bwd)




# ---------------------------------------------------------------------------
# Fused self-attention for the BERT stacks (text/fusion encoders): per-ROW
# additive masks (every sequence has its own padding/seq2seq mask, unlike
# swin's shared per-window shift masks), no relative-position bias, and
# in-kernel dropout on the attention probabilities (HF BertSelfAttention
# semantics, ref model.py:124-131 trsfr). The (B, nH, N, N) probs tensor —
# 62MB/layer/pass at the pretrain VTM shapes — never touches HBM. Dropout
# uses the on-core PRNG seeded per (step, program), and the backward
# recomputes the identical mask from the same seed.
# ---------------------------------------------------------------------------


def _sa_dropout(p, seed_ref, p_drop):
    """Multiplicative inverted-dropout mask drawn from the core PRNG."""
    # Mosaic caps prng_seed at two values: fold the 2D program id into one
    prog = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    pltpu.prng_seed(seed_ref[0], prog)
    bits = pltpu.prng_random_bits(p.shape)            # int32 bits
    thresh = jnp.int32(min(2**31 - 1,
                           int(p_drop * 2.0**32) - 2**31))
    keep = bits >= thresh                             # P(keep) = 1 - p_drop
    return jnp.where(keep, p * (1.0 / (1.0 - p_drop)), 0.0)


def _sa_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale,
               p_drop):
    q = q_ref[...]                                    # (G, Hb, N, hd)
    k = k_ref[...]
    v = v_ref[...]
    g, hb, n, hd = q.shape
    q = q * jnp.asarray(scale, q.dtype)               # fold scale into q
    s = jax.lax.dot_general(
        q.reshape(g * hb, n, hd), k.reshape(g * hb, n, hd),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    s = s.reshape(g, hb, n, n)
    s = s + mask_ref[...][:, None]                    # (G, N, N) per-row mask
    p = jax.nn.softmax(s.reshape(g * hb, n, n), axis=-1)
    if p_drop > 0.0:
        p = _sa_dropout(p, seed_ref, p_drop)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v.reshape(g * hb, n, hd),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[...] = o.reshape(g, hb, n, hd).astype(o_ref.dtype)


def _sa_bwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, do_ref,
                   dq_ref, dk_ref, dv_ref, *, scale, p_drop):
    q = q_ref[...]
    g, hb, n, hd = q.shape
    q = q.reshape(g * hb, n, hd)
    k = k_ref[...].reshape(g * hb, n, hd)
    v = v_ref[...].reshape(g * hb, n, hd)
    do = do_ref[...].reshape(g * hb, n, hd)
    dtype = q.dtype
    qs = q * jnp.asarray(scale, dtype)   # see _attn_bwd_kernel fold algebra

    s = jax.lax.dot_general(qs, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    s = s.reshape(g, hb, n, n) + mask_ref[...][:, None]
    p = jax.nn.softmax(s.reshape(g * hb, n, n), axis=-1)    # pre-dropout
    if p_drop > 0.0:
        pd = _sa_dropout(p, seed_ref, p_drop)         # same seed -> same mask
    else:
        pd = p
    pd_lo = pd.astype(dtype)

    # dv = pd^T @ do   (dropout applies on the prob side)
    dv = jax.lax.dot_general(pd_lo, do, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    # dpd = do @ v^T; back through dropout: dp = dpd * mask/keep
    dpd = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    if p_drop > 0.0:
        dp = jnp.where(pd != 0.0, dpd * (1.0 / (1.0 - p_drop)), 0.0)
    else:
        dp = dpd
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds_lo = ds.astype(dtype)

    dq = jax.lax.dot_general(ds_lo, k, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(ds_lo, qs, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)

    dq_ref[...] = dq.reshape(g, hb, n, hd).astype(dq_ref.dtype)
    dk_ref[...] = dk.reshape(g, hb, n, hd).astype(dk_ref.dtype)
    dv_ref[...] = dv.reshape(g, hb, n, hd).astype(dv_ref.dtype)


def _sa_specs(b, nh, n, hd, cap, packed: bool = False):
    """``packed``: q/k/v live in ONE (B, 3*nH, N, hd) array (the transposed
    single-GEMM qkv projection); the three input specs pick segment
    offsets on it, like the swin packed path."""
    hb, g = _tiles(b, nh, n, b, cap)      # every row has its own mask
    n_ht = nh // hb
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    if packed:
        qkv_spec = lambda seg: pl.BlockSpec(
            (g, hb, n, hd), lambda ht, r, s=seg: (r, s * n_ht + ht, 0, 0),
            memory_space=pltpu.VMEM)
    else:
        qkv_spec = lambda seg: pl.BlockSpec(
            (g, hb, n, hd), lambda ht, r: (r, ht, 0, 0),
            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((g, hb, n, hd), lambda ht, r: (r, ht, 0, 0),
                            memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((g, n, n), lambda ht, r: (r, 0, 0),
                             memory_space=pltpu.VMEM)
    return seed_spec, qkv_spec, out_spec, mask_spec, (n_ht, b // g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_self_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                         mask: jax.Array, seed: jax.Array,
                         scale: float, p_drop: float = 0.0,
                         interpret: bool = False) -> jax.Array:
    """dropout(softmax(q k^T * scale + mask)) v, fused per (row, head-tile).

    Args:
      q, k, v: (B, nH, N, hd).
      mask:    (B, N, N) fp32 additive attention bias (not differentiated).
      seed:    (1,) int32 dropout seed (ignored when p_drop == 0; pass a
               fresh value per training step).
      p_drop:  attention-probs dropout rate (0 disables, e.g. at eval).
    Returns:
      (B, nH, N, hd) in q.dtype.
    """
    return _sa_fwd(q, k, v, mask, seed, scale, p_drop, interpret)[0]


def _sa_call(args, mask, seed, scale, p_drop, interpret, *, backward,
             n_heads=None, do=None):
    """``args`` is (q, k, v) for the split layout or a single packed
    (B, 3*nH, N, hd) array."""
    packed = not isinstance(args, tuple)
    if packed:
        b, three_nh, n, hd = args.shape
        nh = n_heads
        assert three_nh == 3 * nh
        ins = (args, args, args)
        oshape = (b, nh, n, hd)
        dtype = args.dtype
    else:
        b, nh, n, hd = args[0].shape
        ins = args
        oshape = args[0].shape
        dtype = args[0].dtype
    # with dropout, fwd and bwd MUST share one grid/tile shape: the mask is
    # regenerated from (seed, program_id) and the stream layout follows the
    # block shape — different tilings would decorrelate fwd and bwd masks
    cap = _BWD_UNITS if (backward or p_drop > 0.0) else _FWD_UNITS
    seed_spec, qkv_spec, out_spec, mask_spec, grid = _sa_specs(
        b, nh, n, hd, cap, packed)
    size = int(np.prod(oshape))
    if not backward:
        return pl.pallas_call(
            functools.partial(_sa_kernel, scale=scale, p_drop=p_drop),
            grid=grid,
            in_specs=[seed_spec, qkv_spec(0), qkv_spec(1), qkv_spec(2),
                      mask_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct(oshape, dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * 2 * b * nh * n * n * hd,
                bytes_accessed=4 * size * dtype.itemsize,
                transcendentals=b * nh * n * n),
            interpret=interpret,
            compiler_params=None if interpret else _compiler_params(),
        )(seed, *ins, mask)
    return pl.pallas_call(
        functools.partial(_sa_bwd_kernel, scale=scale, p_drop=p_drop),
        grid=grid,
        in_specs=[seed_spec, qkv_spec(0), qkv_spec(1), qkv_spec(2),
                  mask_spec, out_spec],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct(oshape, dtype),) * 3,
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * nh * n * n * hd,
            bytes_accessed=8 * size * dtype.itemsize,
            transcendentals=b * nh * n * n),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(seed, *ins, mask, do)


def _sa_fwd(q, k, v, mask, seed, scale, p_drop, interpret):
    out = _sa_call((q, k, v), mask, seed, scale, p_drop, interpret,
                   backward=False)
    return out, (q, k, v, mask, seed)


def _sa_bwd(scale, p_drop, interpret, res, do):
    q, k, v, mask, seed = res
    dq, dk, dv = _sa_call((q, k, v), mask, seed, scale, p_drop, interpret,
                          backward=True, do=do)
    return dq, dk, dv, jnp.zeros_like(mask), jnp.zeros_like(seed)


fused_self_attention.defvjp(_sa_fwd, _sa_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def packed_self_attention(qkv: jax.Array, mask: jax.Array, seed: jax.Array,
                          n_heads: int, scale: float, p_drop: float = 0.0,
                          interpret: bool = False) -> jax.Array:
    """:func:`fused_self_attention` over the packed (B, 3*nH, N, hd) qkv
    tensor (one transpose of a single qkv GEMM, dim-1 ordered (3, nH)).
    Returns (B, nH, N, hd)."""
    return _psa_fwd(qkv, mask, seed, n_heads, scale, p_drop, interpret)[0]


def _psa_fwd(qkv, mask, seed, n_heads, scale, p_drop, interpret):
    out = _sa_call(qkv, mask, seed, scale, p_drop, interpret,
                   backward=False, n_heads=n_heads)
    return out, (qkv, mask, seed)


def _psa_bwd(n_heads, scale, p_drop, interpret, res, do):
    qkv, mask, seed = res
    dq, dk, dv = _sa_call(qkv, mask, seed, scale, p_drop, interpret,
                          backward=True, n_heads=n_heads, do=do)
    dqkv = jnp.concatenate([dq, dk, dv], axis=1)
    return dqkv, jnp.zeros_like(mask), jnp.zeros_like(seed)


packed_self_attention.defvjp(_psa_fwd, _psa_bwd)


# ---------------------------------------------------------------------------
# Lane-sliced entry (round 3): consume the qkv GEMM output (B_, N, 3C)
# DIRECTLY. The packed path still needs one (B_, N, 3nH, hd) -> (B_, 3nH, N,
# hd) layout transpose each way, and XLA materializes it as a real HBM copy
# (~1.8ms per stage-0 instance, ~10 instances/step incl. remat duplicates —
# round-3 trace). Mosaic's BlockSpec rule that killed the zero-copy variant
# in round 2 ("block minor dims must be 128-divisible or whole") does NOT
# bind here: the q/k/v C-SEGMENTS of the 3C axis are 128-divisible at every
# swin stage (C in {128, 256, 512, 1024}) and in BERT (768), so three
# BlockSpecs index the same array at lane-segment offsets, and the hd=32/64
# head split happens INSIDE the kernel as static lane slices (measured fine:
# stage-0 fwd 2.47ms lane vs 5.02ms transpose+packed, tools/lanebench.py).
# The head loop is a static python unroll; outputs concatenate back to
# (B_, N, C) so the proj GEMM consumes the kernel output with no transpose
# either. VMEM tiles are chosen by an explicit byte estimator (_lane_g).
# ---------------------------------------------------------------------------


def _lane_bytes(g, n, c, nh, backward, with_bias=True, itemsize=2,
                with_mask=True, n_windows=0):
    """Per-program VMEM estimate. Grid-streamed blocks (non-constant index
    maps) are DOUBLE-buffered by the pipeline; the bias (and dbias
    accumulator) have constant indices and stay single. The unrolled head
    loop keeps all nh per-head outputs live until the final lane concat.
    ``with_bias=False`` is the self-attention variant (no rel-pos bias;
    the per-row mask is already counted in ``maskb``). ``itemsize`` is the
    x3/do element size (2 for the bf16 production path; f32 callers — e.g.
    the on-chip parity tests — need 4 or the chosen g overflows scoped
    VMEM, caught live as a 16.19M>16M Mosaic stack OOM on (4,232,2304)).
    ``n_windows``: the shift-mask period; when 1 < n_windows <= g the whole
    mask is RESIDENT (constant index map, single-buffered) and the kernel
    tile-adds it, so its footprint stops growing with g."""
    inb = (4 if backward else 3) * g * n * c * itemsize * 2   # x2 dbuf
    outb = g * n * (3 * c if backward else c) * itemsize * 2  # x2 dbuf
    if not with_mask:
        maskb = 0
    elif 1 < n_windows <= g:
        maskb = n_windows * n * n * 4                     # resident f32
    else:
        maskb = g * n * n * 4 * 2                         # streamed f32, x2
    biasb = (nh * n * n * 4 * (2 if backward else 1)      # resident f32
             if with_bias else 0)
    temps = (4 if backward else 2) * g * n * n * 4        # live f32 (N, N)
    acc = (3 if backward else 1) * g * n * c * itemsize   # per-head outputs
    return inb + outb + maskb + biasb + temps + acc


def _lane_budget():
    return int(_os.environ.get("EMVM_LANE_BUDGET_MB", "10")) * 2**20


def lane_attention_fits(b_, n, c, nh, n_windows) -> bool:
    """Whether the lane FORWARD fits VMEM at g=1. Round-4 change: this used
    to require the backward to fit too, sending swin stage 3 (nh=32: a
    4.9MB resident bias + its dbias twin) to the packed path for BOTH
    passes; now the backward falls back to the packed kernel internally
    (see _lane_bwd) and the forward — the only pass frozen teachers ever
    run — stays lane, transpose-free."""
    return (c % 128 == 0
            and _lane_bytes(1, n, c, nh, backward=False) <= _lane_budget())


def lane_sa_attention_fits(b, n, c, nh) -> bool:
    """Fit check for :func:`lane_self_attention` (no rel-pos bias — the
    per-row mask streams with the grid, so the resident-bias term that
    rules out wide-``nh`` window shapes doesn't apply). Round-3 fix: the
    original check reused the biased estimate and silently kept BERT
    (nh=12, L=232) on the packed path, leaving ~8 ms/step of packing
    transposes alive."""
    return (c % 128 == 0
            and _lane_bytes(1, n, c, nh, backward=True,
                            with_bias=False) <= _lane_budget())


def _lane_g(b_, n, c, nh, n_windows, backward, itemsize=2, with_mask=True):
    """Largest window-group size g whose per-program VMEM footprint fits the
    budget. g must divide B_ and align with the shift-mask period: either
    g divides n_windows (the mask streams per-block) or g is a MULTIPLE of
    n_windows (the whole mask sits resident and the kernel tile-adds it —
    round-4 change: the old g <= n_windows cap froze shifted blocks at tiny
    program groups, e.g. g<=4 at swin stage 2, regardless of budget)."""
    budget = _lane_budget()

    def ok(g):
        if b_ % g:
            return False
        if with_mask and n_windows > 1 and (g % n_windows
                                            and n_windows % g):
            return False
        return _lane_bytes(g, n, c, nh, backward, itemsize=itemsize,
                           with_mask=with_mask,
                           n_windows=n_windows if with_mask else 0) <= budget

    g = b_
    while g > 1 and not ok(g):
        g -= 1
    return max(g, 1)


def _lane_tsliced_specs(b_, n_base, c, n_windows, g, t_slices):
    """Specs for the t-sliced grid (round 4): the input rides the FOLDED
    superwindow layout as an explicit 4D (B_, f, n, 3C) array
    (window_partition(t_split=f) — same transpose, pure-view reshape), and
    the kernel programs see one (g, 1, n, c) temporal slice each — grid
    (B_/g, f). This removes the folded path's 4x score inflation (3/4 of
    the (196, 196) score matrix was -1e9 filler) with the kernel body
    unchanged: bias and mask stay at their true (nH, n, n) / (nW, n, n)
    shapes, no jnp.where tiling. The 4D form exists because Mosaic requires
    a block's second-minor dim to be 8-divisible OR equal to the array dim:
    a 49-row slice of a 196-row axis fails, a (…, 49, C) block on a
    (…, 49, C) array passes. Temporal slices of a 2D swin never attend
    across t (the fold's block-diagonal -1e9 mask was exact), so per-slice
    attention IS the unfolded math."""
    x3_spec = pl.BlockSpec((g, 1, n_base, 3 * c),
                           lambda b, t: (b, t, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((g, 1, n_base, c), lambda b, t: (b, t, 0, 0),
                            memory_space=pltpu.VMEM)
    if n_windows > 1 and g >= n_windows:
        mask_spec = pl.BlockSpec((n_windows, n_base, n_base),
                                 lambda b, t: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
    elif n_windows > 1:
        mask_spec = pl.BlockSpec((g, n_base, n_base),
                                 lambda b, t: (b % (n_windows // g), 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        mask_spec = pl.BlockSpec((1, n_base, n_base), lambda b, t: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
    return x3_spec, out_spec, mask_spec


def _lane_mask_add(s, m):
    """Add the shift mask to per-head scores s (G, N, N). m is (G, N, N)
    (streamed per-block), (1, N, N) (single window), or (nW, N, N) resident
    with G a multiple of nW — windows are consecutive, so a leading-dim
    reshape tiles the periods (vreg broadcast, nothing materializes)."""
    g, n, _ = s.shape
    nw = m.shape[0]
    if nw in (g, 1):
        return s + m
    return (s.reshape(g // nw, nw, n, n) + m[None]).reshape(g, n, n)


def _lane_fwd_kernel(*refs, scale, nh, has_mask=True):
    # VPU-pass economy (round 3e — the kernels are VPU-bound on fp32 (N, N)
    # elementwise work): scale folds into the (N, hd) q slice, and
    # has_mask=False skips the mask add (unshifted blocks previously paid a
    # full (G, N, N) pass adding zeros).
    if has_mask:
        x3_ref, bias_ref, mask_ref, o_ref = refs
    else:
        x3_ref, bias_ref, o_ref = refs
    xa = x3_ref[...]                                  # (G, N, 3C)
    if xa.ndim == 4:          # t-sliced (G, 1, N, 3C) block: leading squeeze
        xa = xa.reshape(xa.shape[0], *xa.shape[2:])
    g, n, c3 = xa.shape
    c = c3 // 3
    hd = c // nh
    # q/k/v are 128-aligned lane segments — free vreg-column views. One
    # x3 ref instead of three c-segment BlockSpecs keeps the HBM reads in
    # n*3C-byte contiguous bursts (the per-segment specs fetched 256-byte
    # strided rows at C=128; measured ~6x off bandwidth, round 4).
    qa = jax.lax.slice_in_dim(xa, 0, c, axis=2)
    ka = jax.lax.slice_in_dim(xa, c, 2 * c, axis=2)
    va = jax.lax.slice_in_dim(xa, 2 * c, 3 * c, axis=2)
    m = mask_ref[...] if has_mask else None           # (G or 1, N, N)
    sc = jnp.asarray(scale, qa.dtype)
    outs = []
    for h in range(nh):
        q = jax.lax.slice_in_dim(qa, h * hd, (h + 1) * hd, axis=2) * sc
        k = jax.lax.slice_in_dim(ka, h * hd, (h + 1) * hd, axis=2)
        v = jax.lax.slice_in_dim(va, h * hd, (h + 1) * hd, axis=2)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # (G, N, N) f32
        s = s + bias_ref[h][None]
        if has_mask:
            s = _lane_mask_add(s, m)
        p = jax.nn.softmax(s, axis=-1).astype(va.dtype)
        o = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        outs.append(o.astype(o_ref.dtype))
    o_ref[...] = jnp.concatenate(outs, axis=-1).reshape(o_ref.shape)


def _lane_bwd_kernel(*refs, scale, nh, has_mask=True, sliced=False):
    # see _attn_bwd_kernel for the qs = q*scale fold algebra: the recompute
    # uses qs, dk = ds^T qs absorbs the scale, dq keeps its (N, hd) pass
    if has_mask:
        x3_ref, bias_ref, mask_ref, do_ref, dx3_ref, dbias_ref = refs
    else:
        x3_ref, bias_ref, do_ref, dx3_ref, dbias_ref = refs
    b = pl.program_id(0)
    if sliced:  # 2D (window, t-slice) grid: init dbias on the first program
        b = b + pl.program_id(1)
    xa = x3_ref[...]
    doa = do_ref[...]
    if xa.ndim == 4:          # t-sliced (G, 1, N, 3C) block: leading squeeze
        xa = xa.reshape(xa.shape[0], *xa.shape[2:])
        doa = doa.reshape(doa.shape[0], *doa.shape[2:])
    g, n, c3 = xa.shape
    c = c3 // 3
    hd = c // nh
    # 128-aligned lane-segment views; see _lane_fwd_kernel for the DMA
    # rationale
    qa = jax.lax.slice_in_dim(xa, 0, c, axis=2)
    ka = jax.lax.slice_in_dim(xa, c, 2 * c, axis=2)
    va = jax.lax.slice_in_dim(xa, 2 * c, 3 * c, axis=2)
    m = mask_ref[...] if has_mask else None
    dtype = qa.dtype
    sc = jnp.asarray(scale, dtype)

    @pl.when(b == 0)
    def _():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    dqs, dks, dvs = [], [], []
    for h in range(nh):
        qs = jax.lax.slice_in_dim(qa, h * hd, (h + 1) * hd, axis=2) * sc
        k = jax.lax.slice_in_dim(ka, h * hd, (h + 1) * hd, axis=2)
        v = jax.lax.slice_in_dim(va, h * hd, (h + 1) * hd, axis=2)
        do = jax.lax.slice_in_dim(doa, h * hd, (h + 1) * hd, axis=2)
        s = jax.lax.dot_general(
            qs, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        s = s + bias_ref[h][None]
        if has_mask:
            s = _lane_mask_add(s, m)
        p = jax.nn.softmax(s, axis=-1)                # (G, N, N) f32
        p_lo = p.astype(dtype)
        dv = jax.lax.dot_general(p_lo, do, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dbias_ref[h] += jnp.sum(ds, axis=0)
        ds_lo = ds.astype(dtype)
        dq = jax.lax.dot_general(ds_lo, k, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(ds_lo, qs, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dqs.append(dq.astype(dtype))
        dks.append(dk.astype(dtype))
        dvs.append(dv.astype(dtype))
    dx3_ref[...] = jnp.concatenate(dqs + dks + dvs,
                                   axis=-1).reshape(dx3_ref.shape)


def _lane_specs(b_, n, c, n_windows, g):
    x3_spec = pl.BlockSpec((g, n, 3 * c), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((g, n, c), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    if n_windows > 1 and g >= n_windows:
        # g spans >=1 full mask periods: the whole (nW, N, N) mask stays
        # resident (constant index) and the kernel tile-adds it
        mask_spec = pl.BlockSpec((n_windows, n, n), lambda b: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
    elif n_windows > 1:
        mask_spec = pl.BlockSpec((g, n, n),
                                 lambda b: (b % (n_windows // g), 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        mask_spec = pl.BlockSpec((1, n, n), lambda b: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
    return x3_spec, out_spec, mask_spec


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def lane_window_attention(x3: jax.Array, bias: jax.Array, mask: jax.Array,
                          n_windows: int, n_heads: int, scale: float,
                          interpret: bool = False,
                          has_mask: bool = True,
                          t_slices: int = 1) -> jax.Array:
    """Fused window attention straight off the qkv GEMM output.

    Args:
      x3:   (B_, N, 3C) — the qkv Dense output, last axis ordered (3, nH,
            hd) exactly like the reference's reshape
            (ref: visbackbone/video_swin.py:147-150). C must be
            128-divisible (all swin stages are).
      bias: (nH, N/t_slices, N/t_slices) fp32 relative-position bias
            (trainable).
      mask: (n_windows, N/t_slices, N/t_slices) fp32 additive shift mask
            (constant).
    Returns:
      (B_, N, C) in x3.dtype — ready for the output projection, no
      transposes on either side.

    ``has_mask=False`` (static) skips the additive-mask VPU pass — the
    unshifted swin blocks have no shift mask; ``mask`` is then only a
    VJP-signature placeholder (pass zeros).

    ``t_slices=f > 1`` (round 4): each window row of ``x3`` is a FOLDED
    superwindow of f temporal slices that never attend across slices
    (per-frame 2D swins; the fold keeps window_partition's transpose at its
    cheap 196-row shape). The kernel grid gains a t dimension and each
    program computes one (N/f)-token slice — same math as the old
    block-diagonal -1e9 bias fold at 1/f^2 of the score elements. Bias and
    mask are per-slice shapes, shared across slices (the t-shift is always
    zero when the temporal window is clamped to 1).
    """
    return _lane_fwd(x3, bias, mask, n_windows, n_heads, scale,
                     interpret, has_mask, t_slices)[0]


def _lane_fwd(x3, bias, mask, n_windows, n_heads, scale, interpret,
              has_mask=True, t_slices=1):
    if t_slices > 1:           # 4D (B_, f, n, 3C), see _lane_tsliced_specs
        b_, f, n, c3 = x3.shape
        assert f == t_slices
    else:
        b_, n, c3 = x3.shape
    c = c3 // 3
    assert c3 == 3 * c and c % n_heads == 0 and b_ % n_windows == 0
    nh = n_heads
    g = _lane_g(b_, n, c, nh, n_windows, backward=False,
                itemsize=x3.dtype.itemsize, with_mask=has_mask)
    if t_slices > 1:
        bias_spec = pl.BlockSpec((nh, n, n), lambda b, t: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
        x3_spec, out_spec, mask_spec = _lane_tsliced_specs(
            b_, n, c, n_windows, g, t_slices)
        grid = (b_ // g, t_slices)
    else:
        bias_spec = pl.BlockSpec((nh, n, n), lambda b: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
        x3_spec, out_spec, mask_spec = _lane_specs(b_, n, c, n_windows, g)
        grid = (b_ // g,)
    in_specs = [x3_spec, bias_spec]
    args = [x3, bias]
    if has_mask:
        in_specs.append(mask_spec)
        args.append(mask)
    out = pl.pallas_call(
        functools.partial(_lane_fwd_kernel, scale=scale, nh=nh,
                          has_mask=has_mask),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(x3.shape[:-1] + (c,), x3.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b_ * t_slices * n * n * c,
            bytes_accessed=4 * b_ * t_slices * n * c * x3.dtype.itemsize,
            transcendentals=b_ * nh * t_slices * n * n),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(*args)
    return out, (x3, bias, mask)


def _lane_bwd(n_windows, n_heads, scale, interpret, has_mask, t_slices,
              res, do):
    x3, bias, mask = res
    if t_slices > 1:           # 4D (B_, f, n, 3C), see _lane_tsliced_specs
        b_, _f, n, c3 = x3.shape
    else:
        b_, n, c3 = x3.shape
    c = c3 // 3
    nh = n_heads
    if _lane_bytes(1, n, c, nh, backward=True, itemsize=x3.dtype.itemsize,
                   with_mask=has_mask, n_windows=n_windows) > _lane_budget():
        # bias-heavy shapes (swin stage 3: the resident dbias accumulator
        # twin blows the budget even at g=1): run only the BACKWARD through
        # the packed kernel on a transposed view — the forward stayed lane
        # (transpose-free), and these shapes are tiny (B_=16 at stage 3).
        # t-sliced shapes always fit (the (nH, N, N) terms shrink f^2-fold),
        # so this reroute never sees t_slices > 1.
        assert t_slices == 1
        hd = c // nh
        qkv = x3.reshape(b_, n, 3 * nh, hd).transpose(0, 2, 1, 3)
        do_p = do.reshape(b_, n, nh, hd).transpose(0, 2, 1, 3)
        dqkv, dbias, _ = _packed_bwd(n_windows, nh, scale, interpret,
                                     has_mask, (qkv, bias, mask), do_p)
        dx3 = dqkv.transpose(0, 2, 1, 3).reshape(b_, n, c3)
        return dx3, dbias, jnp.zeros_like(mask)
    g = _lane_g(b_, n, c, nh, n_windows, backward=True,
                itemsize=x3.dtype.itemsize, with_mask=has_mask)
    if t_slices > 1:
        bias_spec = pl.BlockSpec((nh, n, n), lambda b, t: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
        x3_spec, out_spec, mask_spec = _lane_tsliced_specs(
            b_, n, c, n_windows, g, t_slices)
        dx3_spec = pl.BlockSpec((g, 1, n, c3), lambda b, t: (b, t, 0, 0),
                                memory_space=pltpu.VMEM)
        grid = (b_ // g, t_slices)
    else:
        bias_spec = pl.BlockSpec((nh, n, n), lambda b: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
        x3_spec, out_spec, mask_spec = _lane_specs(b_, n, c, n_windows, g)
        dx3_spec = pl.BlockSpec((g, n, c3), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)
        grid = (b_ // g,)
    in_specs = [x3_spec, bias_spec]
    args = [x3, bias]
    if has_mask:
        in_specs.append(mask_spec)
        args.append(mask)
    in_specs.append(out_spec)
    args.append(do)
    dx3, dbias = pl.pallas_call(
        functools.partial(_lane_bwd_kernel, scale=scale, nh=nh,
                          has_mask=has_mask, sliced=t_slices > 1),
        grid=grid,
        in_specs=in_specs,
        out_specs=(dx3_spec, bias_spec),
        out_shape=(jax.ShapeDtypeStruct(x3.shape, x3.dtype),
                   jax.ShapeDtypeStruct(bias.shape, jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b_ * t_slices * n * n * c,
            bytes_accessed=8 * b_ * t_slices * n * c * x3.dtype.itemsize,
            transcendentals=b_ * nh * t_slices * n * n),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(*args)
    return dx3, dbias, jnp.zeros_like(mask)


lane_window_attention.defvjp(_lane_fwd, _lane_bwd)


def _lane_sa_fwd_kernel(seed_ref, x3_ref, mask_ref, o_ref, *,
                        scale, nh, p_drop):
    xa = x3_ref[...]                                  # (G, N, 3C)
    g, n, c3 = xa.shape
    c = c3 // 3
    hd = c // nh
    # single contiguous x3 ref + free 128-aligned lane-segment views (see
    # _lane_fwd_kernel for the DMA burst rationale)
    qa = jax.lax.slice_in_dim(xa, 0, c, axis=2)
    ka = jax.lax.slice_in_dim(xa, c, 2 * c, axis=2)
    va = jax.lax.slice_in_dim(xa, 2 * c, 3 * c, axis=2)
    m = mask_ref[...]                                 # (G, N, N) per-row
    if p_drop > 0.0:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    sc = jnp.asarray(scale, qa.dtype)
    outs = []
    for h in range(nh):
        q = jax.lax.slice_in_dim(qa, h * hd, (h + 1) * hd, axis=2) * sc
        k = jax.lax.slice_in_dim(ka, h * hd, (h + 1) * hd, axis=2)
        v = jax.lax.slice_in_dim(va, h * hd, (h + 1) * hd, axis=2)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        s = s + m
        p = jax.nn.softmax(s, axis=-1)
        if p_drop > 0.0:
            # sequential draws per head: the on-core PRNG stream advances
            # deterministically, and the bwd kernel replays the identical
            # (seed, program, head-order) sequence
            bits = pltpu.prng_random_bits(p.shape)
            thresh = jnp.int32(min(2**31 - 1,
                                   int(p_drop * 2.0**32) - 2**31))
            p = jnp.where(bits >= thresh, p * (1.0 / (1.0 - p_drop)), 0.0)
        o = jax.lax.dot_general(
            p.astype(va.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        outs.append(o.astype(o_ref.dtype))
    o_ref[...] = jnp.concatenate(outs, axis=-1)


def _lane_sa_bwd_kernel(seed_ref, x3_ref, mask_ref, do_ref,
                        dx3_ref, *, scale, nh, p_drop):
    xa = x3_ref[...]
    doa = do_ref[...]
    g, n, c3 = xa.shape
    c = c3 // 3
    hd = c // nh
    qa = jax.lax.slice_in_dim(xa, 0, c, axis=2)
    ka = jax.lax.slice_in_dim(xa, c, 2 * c, axis=2)
    va = jax.lax.slice_in_dim(xa, 2 * c, 3 * c, axis=2)
    m = mask_ref[...]
    dtype = qa.dtype
    if p_drop > 0.0:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    sc = jnp.asarray(scale, dtype)
    dqs, dks, dvs = [], [], []
    for h in range(nh):
        qs = jax.lax.slice_in_dim(qa, h * hd, (h + 1) * hd, axis=2) * sc
        k = jax.lax.slice_in_dim(ka, h * hd, (h + 1) * hd, axis=2)
        v = jax.lax.slice_in_dim(va, h * hd, (h + 1) * hd, axis=2)
        do = jax.lax.slice_in_dim(doa, h * hd, (h + 1) * hd, axis=2)
        s = jax.lax.dot_general(
            qs, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        s = s + m
        p = jax.nn.softmax(s, axis=-1)                # pre-dropout
        if p_drop > 0.0:
            bits = pltpu.prng_random_bits(p.shape)
            thresh = jnp.int32(min(2**31 - 1,
                                   int(p_drop * 2.0**32) - 2**31))
            keep = bits >= thresh
            pd = jnp.where(keep, p * (1.0 / (1.0 - p_drop)), 0.0)
        else:
            pd = p
        pd_lo = pd.astype(dtype)
        dv = jax.lax.dot_general(pd_lo, do, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dpd = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
        if p_drop > 0.0:
            dp = jnp.where(keep, dpd * (1.0 / (1.0 - p_drop)), 0.0)
        else:
            dp = dpd
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds_lo = ds.astype(dtype)
        dq = jax.lax.dot_general(ds_lo, k, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(ds_lo, qs, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dqs.append(dq.astype(dtype))
        dks.append(dk.astype(dtype))
        dvs.append(dv.astype(dtype))
    dx3_ref[...] = jnp.concatenate(dqs + dks + dvs, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def lane_self_attention(x3: jax.Array, mask: jax.Array, seed: jax.Array,
                        n_heads: int, scale: float, p_drop: float = 0.0,
                        interpret: bool = False) -> jax.Array:
    """BERT self-attention straight off the qkv GEMM output (per-row masks,
    in-kernel dropout — :func:`packed_self_attention` semantics without the
    packing transposes).

    Args:
      x3:   (B, L, 3D), last axis ordered (3, nH, hd); D 128-divisible.
      mask: (B, L, L) fp32 additive attention bias.
      seed: (1,) int32 dropout seed (ignored when p_drop == 0).
    Returns:
      (B, L, D) in x3.dtype.
    """
    return _lane_sa_fwd(x3, mask, seed, n_heads, scale, p_drop,
                        interpret)[0]


def _lane_sa_g(b, n, c, nh, p_drop, backward, itemsize=2):
    # with dropout, fwd and bwd MUST share one block partition: the mask is
    # regenerated from (seed, program, head order), so a different g would
    # decorrelate the fwd and bwd dropout masks
    budget = _lane_budget()

    def best(bwd):
        g = b
        while g > 1 and (b % g or _lane_bytes(
                g, n, c, nh, bwd, with_bias=False,
                itemsize=itemsize) > budget):
            g -= 1
        return max(g, 1)

    if p_drop == 0.0 and not backward:
        return best(False)
    return best(True)


def _lane_sa_call(x3, mask, seed, n_heads, scale, p_drop, interpret, *,
                  backward, do=None):
    b, n, c3 = x3.shape
    c = c3 // 3
    nh = n_heads
    assert c3 == 3 * c and c % nh == 0
    g = _lane_sa_g(b, n, c, nh, p_drop, backward,
                   itemsize=x3.dtype.itemsize)
    x3_spec = pl.BlockSpec((g, n, c3), lambda r: (r, 0, 0),
                           memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((g, n, n), lambda r: (r, 0, 0),
                             memory_space=pltpu.VMEM)
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    if not backward:
        return pl.pallas_call(
            functools.partial(_lane_sa_fwd_kernel, scale=scale, nh=nh,
                              p_drop=p_drop),
            grid=(b // g,),
            in_specs=[seed_spec, x3_spec, mask_spec],
            out_specs=pl.BlockSpec((g, n, c), lambda r: (r, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, n, c), x3.dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * 2 * b * n * n * c,
                bytes_accessed=4 * b * n * c * x3.dtype.itemsize,
                transcendentals=b * nh * n * n),
            interpret=interpret,
            compiler_params=None if interpret else _compiler_params(),
        )(seed, x3, mask)
    do_spec = pl.BlockSpec((g, n, c), lambda r: (r, 0, 0),
                           memory_space=pltpu.VMEM)
    dx3_spec = pl.BlockSpec((g, n, c3), lambda r: (r, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_lane_sa_bwd_kernel, scale=scale, nh=nh,
                          p_drop=p_drop),
        grid=(b // g,),
        in_specs=[seed_spec, x3_spec, mask_spec, do_spec],
        out_specs=dx3_spec,
        out_shape=jax.ShapeDtypeStruct(x3.shape, x3.dtype),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * n * n * c,
            bytes_accessed=8 * b * n * c * x3.dtype.itemsize,
            transcendentals=b * nh * n * n),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(seed, x3, mask, do)


def _lane_sa_fwd(x3, mask, seed, n_heads, scale, p_drop, interpret):
    out = _lane_sa_call(x3, mask, seed, n_heads, scale, p_drop, interpret,
                        backward=False)
    return out, (x3, mask, seed)


def _lane_sa_bwd(n_heads, scale, p_drop, interpret, res, do):
    x3, mask, seed = res
    dx3 = _lane_sa_call(x3, mask, seed, n_heads, scale, p_drop, interpret,
                        backward=True, do=do)
    return dx3, jnp.zeros_like(mask), jnp.zeros_like(seed)


lane_self_attention.defvjp(_lane_sa_fwd, _lane_sa_bwd)


# ---------------------------------------------------------------------------
# 5D-direct entry (round 5, VERDICT r5 task 4): consume the qkv GEMM output
# in its NATIVE 5D layout (B, D, Hp, Wp, 3C) — no window_partition /
# window_reverse HBM round-trips around the forward. Each program reads one
# h-strip of windows via a legal BlockSpec (1, D, wh, Wp, 3C) (last dim
# 128-divisible, second-minor Wp whole — the per-window (…, wh, ww, 3C)
# block Mosaic rejects because ww=7 is neither 8-divisible nor the array
# dim), stacks the strip's nWw windows in VMEM (the partition relayout
# happens on-chip instead of through HBM), runs the lane per-head loop, and
# scatters the outputs back to the 5D layout. Restricted to D == wd (one
# temporal window — true for every trained-backbone stage; the 2D teachers
# take the t-sliced fold instead). The backward is native too: same
# in-VMEM window stack, dbias accumulated across the sequential grid.
# DEFAULT for fitting shapes since the round-5 clean A/B (flagship
# 61.93 -> 63.52 clips/s; per-stage microbench in tools/directbench.py);
# EMVM_NO_DIRECT_ATTN=1 restores the partition + lane path.
# ---------------------------------------------------------------------------


def _direct_fwd_kernel(*refs, scale, nh, n_w, ww, has_mask=True):
    if has_mask:
        x3_ref, bias_ref, mask_ref, o_ref = refs
    else:
        x3_ref, bias_ref, o_ref = refs
    xa = x3_ref[...]                                  # (1, D, wh, Wp, 3C)
    _, d, wh_, wp, c3 = xa.shape
    xa = xa.reshape(d, wh_, wp, c3)
    c = c3 // 3
    n = d * wh_ * ww
    # in-VMEM partition: slice the strip's nWw windows off the second-minor
    # Wp axis and stack them as a leading batch dim — (nWw, N, 3C) with the
    # window-row order (t, i, j) a pure row-major flatten of (d, wh, ww)
    xs = jnp.stack([
        jax.lax.slice_in_dim(xa, w * ww, (w + 1) * ww, axis=2)
        .reshape(n, c3) for w in range(n_w)])         # (nWw, N, 3C)
    qa = jax.lax.slice_in_dim(xs, 0, c, axis=2)
    ka = jax.lax.slice_in_dim(xs, c, 2 * c, axis=2)
    va = jax.lax.slice_in_dim(xs, 2 * c, 3 * c, axis=2)
    m = mask_ref[...] if has_mask else None           # (nWw, N, N)
    sc = jnp.asarray(scale, qa.dtype)
    hd = c // nh
    outs = []
    for h in range(nh):
        q = jax.lax.slice_in_dim(qa, h * hd, (h + 1) * hd, axis=2) * sc
        k = jax.lax.slice_in_dim(ka, h * hd, (h + 1) * hd, axis=2)
        v = jax.lax.slice_in_dim(va, h * hd, (h + 1) * hd, axis=2)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # (nWw, N, N) f32
        s = s + bias_ref[h][None]
        if has_mask:
            s = s + m
        p = jax.nn.softmax(s, axis=-1).astype(va.dtype)
        o = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        outs.append(o.astype(o_ref.dtype))
    ow = jnp.concatenate(outs, axis=-1)               # (nWw, N, C)
    # in-VMEM un-partition back to the strip layout
    o_ref[...] = jnp.concatenate(
        [ow[w].reshape(1, d, wh_, ww, c) for w in range(n_w)],
        axis=3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def direct_window_attention(x3: jax.Array, bias: jax.Array, mask: jax.Array,
                            window_eff: tuple[int, int, int], n_heads: int,
                            scale: float, interpret: bool = False,
                            has_mask: bool = True) -> jax.Array:
    """Fused window attention on the native 5D feature-map layout.

    Args:
      x3:   (B, D, Hp, Wp, 3C) — the qkv Dense output on the padded/rolled
            feature map, last axis ordered (3, nH, hd)
            (ref: visbackbone/video_swin.py:147-150). Requires D ==
            window_eff[0] (one temporal window) and C % 128 == 0.
      bias: (nH, N, N) fp32 relative-position bias (trainable), N = wd*wh*ww.
      mask: (nW, N, N) fp32 additive shift mask, nW = (Hp/wh)*(Wp/ww),
            windows ordered row-major (h-strip, w) like _shift_attn_mask.
    Returns:
      (B, D, Hp, Wp, C) in x3.dtype — the window outputs already scattered
      back to the feature-map layout (no window_reverse needed).
    """
    return _direct_fwd(x3, bias, mask, window_eff, n_heads, scale,
                       interpret, has_mask)[0]


def _direct_budget():
    """The direct kernels run one h-strip per program with no g knob to
    shrink, so they get their own (larger) byte budget; the v5e scoped-VMEM
    ceiling is raised to 96MB by _compiler_params. Found workable on-chip
    at the flagship stage-0 strip (~18MB backward footprint)."""
    return int(_os.environ.get("EMVM_DIRECT_BUDGET_MB", "24")) * 2**20


def direct_attention_fits(b, d, hp, wp, c, nh, window_eff) -> bool:
    """Whether the direct BACKWARD (the larger pass) fits the direct VMEM
    budget: one h-strip (nWw windows) per program plus the resident
    (nH, N, N) bias (+ its dbias twin) and strip mask."""
    wd, wh, ww = window_eff
    if d != wd or c % 128 or hp % wh or wp % ww:
        return False
    n = wd * wh * ww
    n_w = wp // ww
    strip = d * wh * wp
    inb = strip * 3 * c * 2 * 2          # bf16 x3 in, x2 dbuf
    dob = strip * c * 2 * 2              # do in, x2 dbuf
    dxb = strip * 3 * c * 2 * 2          # dx3 out, x2 dbuf
    xsb = n_w * n * 4 * c * 2            # stacked windows + do stack
    temps = 4 * n_w * n * n * 4          # live f32 (N, N) per head
    acc = 3 * n_w * n * c * 2            # per-head dq/dk/dv until concat
    biasb = 2 * nh * n * n * 4           # bias + dbias accumulator
    maskb = n_w * n * n * 4
    return (inb + dob + dxb + xsb + temps + acc + biasb + maskb
            <= _direct_budget())


def _direct_fwd(x3, bias, mask, window_eff, n_heads, scale, interpret,
                has_mask=True):
    b, d, hp, wp, c3 = x3.shape
    wd, wh, ww = window_eff
    c = c3 // 3
    n = wd * wh * ww
    assert d == wd and c3 == 3 * c and c % n_heads == 0
    n_w = wp // ww
    n_h = hp // wh
    x3_spec = pl.BlockSpec((1, d, wh, wp, c3), lambda b_, i: (b_, 0, i, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, d, wh, wp, c), lambda b_, i: (b_, 0, i, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((n_heads, n, n), lambda b_, i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((n_w, n, n), lambda b_, i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [x3_spec, bias_spec]
    args = [x3, bias]
    if has_mask:
        in_specs.append(mask_spec)
        args.append(mask)
    out = pl.pallas_call(
        functools.partial(_direct_fwd_kernel, scale=scale, nh=n_heads,
                          n_w=n_w, ww=ww, has_mask=has_mask),
        grid=(b, n_h),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, d, hp, wp, c), x3.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * n_h * n_w * n * n * c,
            bytes_accessed=4 * b * d * hp * wp * c * x3.dtype.itemsize,
            transcendentals=b * n_heads * n_h * n_w * n * n),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(*args)
    return out, (x3, bias, mask)


def _direct_bwd_kernel(*refs, scale, nh, n_w, ww, has_mask=True):
    # recompute-then-differentiate on the same in-VMEM window stack as the
    # forward; see _attn_bwd_kernel for the qs = q*scale fold algebra.
    # dq/dk/dv write straight into the dx3 block's lane columns per head
    # (no full-width concat held live), bounding VMEM at the stage-0 strip.
    if has_mask:
        x3_ref, bias_ref, mask_ref, do_ref, dx3_ref, dbias_ref = refs
    else:
        x3_ref, bias_ref, do_ref, dx3_ref, dbias_ref = refs
    b = pl.program_id(0) + pl.program_id(1)

    xa = x3_ref[...]                                  # (1, D, wh, Wp, 3C)
    doa = do_ref[...]
    _, d, wh_, wp, c3 = xa.shape
    xa = xa.reshape(d, wh_, wp, c3)
    doa = doa.reshape(d, wh_, wp, c3 // 3)
    c = c3 // 3
    n = d * wh_ * ww
    hd = c // nh
    xs = jnp.stack([
        jax.lax.slice_in_dim(xa, w * ww, (w + 1) * ww, axis=2)
        .reshape(n, c3) for w in range(n_w)])         # (nWw, N, 3C)
    dos = jnp.stack([
        jax.lax.slice_in_dim(doa, w * ww, (w + 1) * ww, axis=2)
        .reshape(n, c) for w in range(n_w)])          # (nWw, N, C)
    qa = jax.lax.slice_in_dim(xs, 0, c, axis=2)
    ka = jax.lax.slice_in_dim(xs, c, 2 * c, axis=2)
    va = jax.lax.slice_in_dim(xs, 2 * c, 3 * c, axis=2)
    m = mask_ref[...] if has_mask else None
    dtype = qa.dtype
    sc = jnp.asarray(scale, dtype)

    @pl.when(b == 0)
    def _():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    dqs, dks, dvs = [], [], []
    for h in range(nh):
        qs = jax.lax.slice_in_dim(qa, h * hd, (h + 1) * hd, axis=2) * sc
        k = jax.lax.slice_in_dim(ka, h * hd, (h + 1) * hd, axis=2)
        v = jax.lax.slice_in_dim(va, h * hd, (h + 1) * hd, axis=2)
        do_h = jax.lax.slice_in_dim(dos, h * hd, (h + 1) * hd, axis=2)
        s = jax.lax.dot_general(
            qs, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        s = s + bias_ref[h][None]
        if has_mask:
            s = s + m
        p = jax.nn.softmax(s, axis=-1)                # (nWw, N, N) f32
        p_lo = p.astype(dtype)
        dv = jax.lax.dot_general(p_lo, do_h, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do_h, v, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dbias_ref[h] += jnp.sum(ds, axis=0)
        ds_lo = ds.astype(dtype)
        dq = jax.lax.dot_general(ds_lo, k, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(ds_lo, qs, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dqs.append(dq.astype(dtype))
        dks.append(dk.astype(dtype))
        dvs.append(dv.astype(dtype))
    dxs = jnp.concatenate(dqs + dks + dvs, axis=-1)   # (nWw, N, 3C)
    dx3_ref[...] = jnp.concatenate(
        [dxs[w].reshape(1, d, wh_, ww, c3) for w in range(n_w)],
        axis=3).reshape(dx3_ref.shape)


def _direct_bwd(window_eff, n_heads, scale, interpret, has_mask, res, do):
    x3, bias, mask = res
    b, d, hp, wp, c3 = x3.shape
    wd, wh, ww = window_eff
    c = c3 // 3
    n = wd * wh * ww
    n_w = wp // ww
    n_h = hp // wh
    x3_spec = pl.BlockSpec((1, d, wh, wp, c3), lambda b_, i: (b_, 0, i, 0, 0),
                           memory_space=pltpu.VMEM)
    do_spec = pl.BlockSpec((1, d, wh, wp, c), lambda b_, i: (b_, 0, i, 0, 0),
                           memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((n_heads, n, n), lambda b_, i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((n_w, n, n), lambda b_, i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [x3_spec, bias_spec]
    args = [x3, bias]
    if has_mask:
        in_specs.append(mask_spec)
        args.append(mask)
    in_specs.append(do_spec)
    args.append(do)
    dx3, dbias = pl.pallas_call(
        functools.partial(_direct_bwd_kernel, scale=scale, nh=n_heads,
                          n_w=n_w, ww=ww, has_mask=has_mask),
        grid=(b, n_h),
        in_specs=in_specs,
        out_specs=(x3_spec, bias_spec),
        out_shape=(jax.ShapeDtypeStruct(x3.shape, x3.dtype),
                   jax.ShapeDtypeStruct(bias.shape, jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * n_h * n_w * n * n * c,
            bytes_accessed=8 * b * d * hp * wp * c * x3.dtype.itemsize,
            transcendentals=b * n_heads * n_h * n_w * n * n),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(*args)
    return dx3, dbias, jnp.zeros_like(mask)


direct_window_attention.defvjp(_direct_fwd, _direct_bwd)


def window_attention_reference(q, k, v, bias, mask, n_windows, scale):
    """Pure-XLA path (also the numerical oracle for the kernel)."""
    b_, nh, n, hd = q.shape
    s = jnp.einsum("bhnd,bhmd->bhnm", q.astype(jnp.float32) * scale,
                   k.astype(jnp.float32))
    s = s + bias[None]
    m = jnp.broadcast_to(mask[None], (b_ // n_windows, n_windows, n, n))
    s = s + m.reshape(b_, 1, n, n)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)
