"""Pallas TPU kernel for multi-scale deformable attention.

Replaces the CUDA ``ms_deformable_im2col`` kernel (reference:
models/ops/src/cuda/ms_deform_im2col_cuda.cuh:238-299) with a TPU-shaped
formulation.  A GPU thread-per-output gather does not map onto the TPU's
vector/matrix units, so instead of translating the CUDA loop the op is split
at the natural boundary:

1. index/weight preparation (vectorized VPU-friendly math, plain XLA):
   pixel coords, bilinear corner indices, combined
   ``bilinear x validity x attention`` weights — flattened to
   ``idx/w [N*M, Lq, C]`` with C = L*P*4 corner slots;
2. the Pallas kernel: grid = (N*M,), one program per (batch, head).  That
   head's value slab [S, D] sits in VMEM (S ~= 5100, D = 64 for GRIT's
   384x640 inputs -> ~1.3 MB), and each corner slot contracts a one-hot
   selection matrix [Lq, S] (iota==index compare, built on the VPU) with
   the slab on the MXU, accumulating ``w * value[idx]`` into [Lq, D].

Redundant FLOPs buy perfect regularity — every "gather" is a dense matmul.
This kernel is the DEFAULT on TPU (models/detector.py auto-selects
``impl='pallas'``; measured 21.2 vs 30-39 ms/call for the XLA gather paths
at batch 16, docs/NOTES.md); the XLA fused-gather path (grit_tpu.ops.msda)
remains the CPU default and the parity oracle.

Gradients: the index/weight preparation is plain differentiable XLA, so only
the gather core carries a ``jax.custom_vjp``.  Its backward is a second
Pallas kernel built from the SAME level-local selection matrices:

    dValue_l = selm_l^T @ dOut        (contract over queries — no scatter!)
    dW[:,ci] = rowsum(1[col==idx_ci] * (dOut @ V_l^T))

— the selection-matmul trick transposes cleanly, replacing XLA's scatter-add
lowering of the gather transpose.  dLoc/dAttn then flow through the XLA
prep by ordinary autodiff.  (The CUDA ext needs five hand-written col2im
backward kernels, cuh:302-921.)
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from grit_tpu.ops.msda import _bilinear_corners, _msda_fused_xla, level_start_index

# MXU precision for the one-hot contraction.  None = adaptive: fp32 inputs
# get HIGHEST (fp32-true, bit-close to the oracle — used by parity tests),
# bf16 inputs get DEFAULT (single MXU pass, ~3x faster; rounding is at the
# model's own precision).  Set explicitly to override.
MATMUL_PRECISION = None


def _precision_for(dtype):
    if MATMUL_PRECISION is not None:
        return MATMUL_PRECISION
    return (
        jax.lax.Precision.DEFAULT
        if dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )


def _aligned_spans(spatial_shapes):
    """Per-level (start, size) with every start 8-row aligned.

    The kernel slices the value slab per level along the sublane dimension;
    aligning each level segment to 8 rows keeps those slices layout-friendly.
    The total carries a tail pad of (max W + 2) rows so the v3 kernel's
    statically SHIFTED slices (offset up to W+1) never run off the slab.
    """
    if FWD_VARIANT == "v3":
        # v3's statically SHIFTED slices (offset up to W+1) need head/tail
        # slack; v2 must NOT pay these — they force s_pad != s and a full
        # value-slab re-lay on the production pyramid, whose level sizes
        # are otherwise already 8-aligned (identity layout, no copy)
        pad = max(w for _, w in spatial_shapes) + 2
        lead = -(-pad // 8) * 8
        tail = -(-pad // 8) * 8
    else:
        lead = tail = 0
    starts, sizes = [], []
    off = lead
    for h, w in spatial_shapes:
        starts.append(off)
        sizes.append(h * w)
        off += -(-(h * w) // 8) * 8
    off += tail
    return starts, sizes, off


def _prepare_indices(spatial_shapes, sampling_locations, attention_weights):
    """-> (flat_idx [N, Lq, M, C] int32, weights [N, Lq, M, C]) with C = L*P*4.

    Indices address the LEVEL-ALIGNED value layout of ``_aligned_spans``.
    """
    n, lq, m, L, p, _ = sampling_locations.shape
    hs = np.array([h for h, _ in spatial_shapes], np.float32)
    ws = np.array([w for _, w in spatial_shapes], np.float32)
    st = np.array(_aligned_spans(spatial_shapes)[0], np.int32)

    px = sampling_locations[..., 0] * ws[None, None, None, :, None] - 0.5
    py = sampling_locations[..., 1] * hs[None, None, None, :, None] - 0.5
    ix, iy, wgt, valid = _bilinear_corners(
        px, py, hs[None, None, None, :, None, None], ws[None, None, None, :, None, None]
    )  # [N, Lq, M, L, P, 4]
    ixc = jnp.clip(ix, 0, (ws - 1).astype(np.int32)[None, None, None, :, None, None])
    iyc = jnp.clip(iy, 0, (hs - 1).astype(np.int32)[None, None, None, :, None, None])
    flat = (
        st[None, None, None, :, None, None]
        + iyc * ws.astype(np.int32)[None, None, None, :, None, None]
        + ixc
    )
    w_total = jnp.where(valid, wgt, 0.0) * attention_weights[..., None]
    c = L * p * 4

    # per-POINT base = the UNclipped top-left corner's flat index.  The fwd
    # kernel compares once per point over a left-extended window and derives
    # the other three corners' one-hots by static slices (offsets 0 / 1 /
    # W / W+1 from the corner order TL,TR,BL,BR).  Out-of-bounds corners
    # carry zero weight, so clipping the base into the extended window only
    # needs to be arithmetic-safe, never semantic.
    x0 = ix[..., 0]  # [N, Lq, M, L, P] unclipped floor coords
    y0 = iy[..., 0]
    base = (
        st[None, None, None, :, None]
        + y0 * ws.astype(np.int32)[None, None, None, :, None]
        + x0
    )
    lo = (st - ws.astype(np.int32) - 1)[None, None, None, :, None]
    hi = (st + (hs * ws).astype(np.int32))[None, None, None, :, None]
    base = jnp.clip(base, lo, hi)
    return (
        flat.reshape(n, lq, m, c),
        w_total.reshape(n, lq, m, c),
        base.reshape(n, lq, m, L * p),
    )


def _gather_matmul_kernel(base_ref, w_ref, value_ref, out_ref, *, spans, npts, wdims):
    """One (batch*head) program: out[q, d] = sum_c w[q, c] * value[idx[q, c], d].

    Corner slots are grouped BY LEVEL: each level's points accumulate (VPU
    compare-selects) into ONE selection matrix [Lq, S_l] that contracts once
    with that level's slab slice on the MXU — the dense-contraction trick
    only pays if the contraction stays level-local.

    Per point all four corner one-hots derive from ONE base index: corner
    delta in (0, 1, W, W+1) matches where ``col - delta == base``, so the
    per-corner index slices and compares of the old per-corner layout
    collapse into fused compare-selects against four PRE-SHIFTED column
    tensors shared by every point of the level.
    """
    lq = base_ref.shape[1]
    d = value_ref.shape[2]
    value = value_ref[0]
    base = base_ref[0]  # [Lq, L*P] unclipped top-left corner indices
    wts = w_ref[0]      # [Lq, L*P*4] corner weights (TL, TR, BL, BR)

    acc = jnp.zeros((lq, d), jnp.float32)
    # statically unrolled (Mosaic cannot dynamically slice the lane dim, and
    # static slices let it pipeline the per-level contractions back-to-back)
    for lvl, (st, sl) in enumerate(spans):
        wl = wdims[lvl]
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (lq, sl), 1) + st
        shifted = [col_ids - delta for delta in (0, 1, wl, wl + 1)]
        selm = jnp.zeros((lq, sl), jnp.float32)
        for pt in range(lvl * npts, (lvl + 1) * npts):
            b = jax.lax.slice_in_dim(base, pt, pt + 1, axis=1)   # [Lq, 1]
            for ci in range(4):
                ww = jax.lax.slice_in_dim(wts, pt * 4 + ci, pt * 4 + ci + 1, axis=1)
                selm = selm + jnp.where(
                    shifted[ci] == b, ww.astype(jnp.float32), 0.0)
        vsl = jax.lax.slice_in_dim(value, st, st + sl, axis=0)   # [S_l, D]
        # HIGHEST precision: fp32-true accumulation (the selection contraction
        # — default bf16 MXU passes would round the values)
        acc = acc + jax.lax.dot_general(
            selm.astype(value.dtype), vsl, (((1,), (0,)), ((), ())),
            precision=_precision_for(value.dtype),
            preferred_element_type=jnp.float32,
        )
    out_ref[0] = acc.astype(out_ref.dtype)


def _gather_bwd_kernel(
    idx_ref, w_ref, value_ref, dout_ref, dw_ref, dval_ref, *, spans, spl
):
    """Backward program for one (batch*head): dW and dValue from dOut.

    Rebuilds each level's selection matrix and transposes the contraction:
    dValue_l = selm_l^T @ dOut (queries contract away — no scatter), and
    dW[:, ci] picks its column out of dOut @ V_l^T with the same iota
    compare used to build selm.
    """
    lq, c = idx_ref.shape[1], idx_ref.shape[2]
    value = value_ref[0]
    idx = idx_ref[0]
    dout = dout_ref[0]                     # [Lq, D]
    wts = w_ref[0]

    dval_ref[0] = jnp.zeros(dval_ref.shape[1:], dval_ref.dtype)  # pad rows stay 0
    dw_lane = jax.lax.broadcasted_iota(jnp.int32, (lq, c), 1)
    dw = jnp.zeros((lq, c), jnp.float32)
    for lvl, (st, sl) in enumerate(spans):
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (lq, sl), 1) + st
        selm = jnp.zeros((lq, sl), jnp.float32)
        for ci in range(lvl * spl, (lvl + 1) * spl):
            sel = jax.lax.slice_in_dim(idx, ci, ci + 1, axis=1)
            ww = jax.lax.slice_in_dim(wts, ci, ci + 1, axis=1)
            selm = selm + jnp.where(col_ids == sel, ww.astype(jnp.float32), 0.0)
        vsl = jax.lax.slice_in_dim(value, st, st + sl, axis=0)  # [S_l, D]
        dval_ref[0, st:st + sl] = jax.lax.dot_general(
            selm.astype(dout.dtype), dout, (((0,), (0,)), ((), ())),
            precision=_precision_for(value.dtype),
            preferred_element_type=jnp.float32,
        ).astype(dval_ref.dtype)                                # [S_l, D]
        dov = jax.lax.dot_general(
            dout, vsl, (((1,), (1,)), ((), ())),
            precision=_precision_for(value.dtype),
            preferred_element_type=jnp.float32,
        )                                                       # [Lq, S_l]
        for ci in range(lvl * spl, (lvl + 1) * spl):
            sel = jax.lax.slice_in_dim(idx, ci, ci + 1, axis=1)
            dw_ci = jnp.sum(
                jnp.where(col_ids == sel, dov, 0.0), axis=1, keepdims=True
            )                                                   # [Lq, 1]
            dw = dw + jnp.where(dw_lane == ci, dw_ci, 0.0)
    dw_ref[0] = dw.astype(dw_ref.dtype)


def _gather_matmul_kernel_v3(base_ref, w_ref, value_ref, out_ref, *, spans, npts, wdims):
    """v3: ONE unweighted compare per point, shared by all four corners.

    The v2 kernel's wall is the VPU: 4 corner slots x (compare + select +
    add) over [Lq, S_l] per point.  v3 compares ``col == base`` once per
    point (the unclipped top-left corner), accumulates the four corner
    weights into four per-corner selection matrices off that one hit mask,
    and contracts each with a STATICALLY SHIFTED slice of the value slab
    (V[s + delta], delta in {0, 1, W, W+1} — the slab carries a tail pad so
    the shifted slices stay in-bounds; out-of-range corners carry zero
    weight so reading a neighbor level contributes nothing).  4x the MXU
    contractions, but the MXU was ~5% utilized while the VPU saturated —
    the compare/select traffic drops ~40%.
    """
    lq = base_ref.shape[1]
    d = value_ref.shape[2]
    value = value_ref[0]
    base = base_ref[0]
    wts = w_ref[0]
    acc = jnp.zeros((lq, d), jnp.float32)
    for lvl, (st, sl) in enumerate(spans):
        wl = wdims[lvl]
        # the compare window extends W+1 columns LEFT of the level start:
        # a point just outside the top/left image edge has base = st - W - 1
        # .. st - 1 while its bottom/right corners are valid in-level cells
        ext = wl + 1
        sle = sl + ext
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (lq, sle), 1) + (st - ext)
        selms = [jnp.zeros((lq, sle), jnp.float32) for _ in range(4)]
        for pt in range(lvl * npts, (lvl + 1) * npts):
            b = jax.lax.slice_in_dim(base, pt, pt + 1, axis=1)   # [Lq, 1]
            hit = col_ids == b
            for ci in range(4):
                ww = jax.lax.slice_in_dim(wts, pt * 4 + ci, pt * 4 + ci + 1, axis=1)
                selms[ci] = selms[ci] + jnp.where(hit, ww.astype(jnp.float32), 0.0)
        for ci, delta in enumerate((0, 1, wl, wl + 1)):
            vsl = jax.lax.slice_in_dim(
                value, st - ext + delta, st - ext + delta + sle, axis=0)
            acc = acc + jax.lax.dot_general(
                selms[ci].astype(value.dtype), vsl, (((1,), (0,)), ((), ())),
                precision=_precision_for(value.dtype),
                preferred_element_type=jnp.float32,
            )
    out_ref[0] = acc.astype(out_ref.dtype)


# forward kernel variant: "v2" = per-corner shifted-column compares into one
# selection matrix per level; "v3" = one compare per point + four shifted-
# slab contractions (see _gather_matmul_kernel_v3).  Measured e2e on v5e at
# b128: v3 172.9 vs v2 173.6 img/s — the ~25% VPU compare/select savings are
# cancelled by the 4x contraction count and the unaligned shifted-slice
# copies, so v2 stays the default and v3 remains a parity-tested experiment
# (docs/NOTES.md round-3 ladder).
FWD_VARIANT = "v2"


def _gather_call(base_g, w_g, value_g, spans, spl, wdims):
    g, lq, c = w_g.shape
    s_pad, d = value_g.shape[1], value_g.shape[2]
    s = sum(sz for _, sz in spans)
    kern = (_gather_matmul_kernel_v3 if FWD_VARIANT == "v3"
            else _gather_matmul_kernel)
    kernel = functools.partial(kern, spans=spans, npts=spl // 4, wdims=wdims)
    cp = base_g.shape[2]
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, lq, cp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lq, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, lq, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, lq, d), value_g.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * g * lq * s * d,
            bytes_accessed=4 * (value_g.size + base_g.size + w_g.size + g * lq * d),
            transcendentals=0,
        ),
    )(base_g, w_g, value_g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _gather_op(idx_g, base_g, w_g, value_g, spans, spl, wdims):
    return _gather_call(base_g, w_g, value_g, spans, spl, wdims)


def _gather_fwd(idx_g, base_g, w_g, value_g, spans, spl, wdims):
    out = _gather_call(base_g, w_g, value_g, spans, spl, wdims)
    return out, (idx_g, base_g, w_g, value_g)


def _gather_bwd(spans, spl, wdims, residuals, dout):
    idx_g, base_g, w_g, value_g = residuals
    g, lq, c = idx_g.shape
    s_pad, d = value_g.shape[1], value_g.shape[2]
    kernel = functools.partial(_gather_bwd_kernel, spans=spans, spl=spl)
    dw, dval = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, lq, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lq, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lq, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, lq, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, lq, c), w_g.dtype),
            jax.ShapeDtypeStruct((g, s_pad, d), value_g.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * g * lq * sum(sz for _, sz in spans) * d,
            bytes_accessed=8 * (value_g.size + idx_g.size + w_g.size),
            transcendentals=0,
        ),
    )(idx_g, w_g, value_g, dout)
    didx = np.zeros(idx_g.shape, jax.dtypes.float0)
    dbase = np.zeros(base_g.shape, jax.dtypes.float0)
    return didx, dbase, dw, dval


_gather_op.defvjp(_gather_fwd, _gather_bwd)


def _pallas_forward(value, spatial_shapes, sampling_locations, attention_weights):
    n, s, m, d = value.shape
    _, lq, _, L, p, _ = sampling_locations.shape
    c = L * p * 4

    flat, w_total, base = _prepare_indices(
        spatial_shapes, sampling_locations, attention_weights
    )
    g = n * m
    idx_g = flat.transpose(0, 2, 1, 3).reshape(g, lq, c)
    w_g = w_total.transpose(0, 2, 1, 3).reshape(g, lq, c)
    base_g = base.transpose(0, 2, 1, 3).reshape(g, lq, L * p)
    value_g = value.transpose(0, 2, 1, 3).reshape(g, s, d)

    starts, sizes, s_pad = _aligned_spans(spatial_shapes)
    if s_pad != s:
        # re-lay the slab so every level segment starts 8-row aligned, plus
        # the tail pad that keeps the v3 kernel's shifted slices in-bounds
        orig = level_start_index(spatial_shapes)
        segs = [jnp.zeros((g, starts[0], d), value_g.dtype)]  # lead pad
        covered = starts[0]
        for st_o, sz in zip(orig, sizes):
            seg = jax.lax.slice_in_dim(value_g, st_o, st_o + sz, axis=1)
            pad = -(-sz // 8) * 8 - sz
            if pad:
                seg = jnp.pad(seg, ((0, 0), (0, pad), (0, 0)))
            segs.append(seg)
            covered += sz + pad
        if s_pad > covered:  # tail pad, folded into the ONE concat (a
            # second jnp.pad pass would materialize another full slab copy
            # in HBM — ~700 MB at b128 — which OOM'd the chip)
            segs.append(jnp.zeros((g, s_pad - covered, d), value_g.dtype))
        value_g = jnp.concatenate(segs, axis=1)

    wdims = tuple(int(w_) for _, w_ in spatial_shapes)
    out = _gather_op(
        idx_g, base_g, w_g, value_g, tuple(zip(starts, sizes)), p * 4, wdims
    )
    return out.reshape(n, m, lq, d).transpose(0, 2, 1, 3).reshape(n, lq, m * d)


def ms_deform_attn_pallas(value, spatial_shapes, sampling_locations, attention_weights):
    """Pallas forward; backward = Pallas selector-transpose kernels (dW/dValue)
    chained with XLA autodiff of the index/weight prep (dLoc/dAttn)."""
    return _pallas_forward(value, spatial_shapes, sampling_locations, attention_weights)


# ---------------------------------------------------------------------------
# v4: the relaid-slab kernel — one program per IMAGE, all heads inside.
#
# The v2 kernel's per-(image, head) grid needs value in a [N*M, S, D]
# head-major layout, which costs a [N, M, S, D] transpose copy plus the
# aligned-spans slice/pad/concat re-lay PER LAYER (the trace at b128 charged
# ~95 ms of the 737 ms eval step to exactly these: 6x 3.9 ms transpose
# copies, 6x 4 ms slices, 24 ms of pad/concat fusions, 6x 2 ms where-mask
# layout copies — docs/NOTES.md round-3).  v4 removes ALL of it:
#
# - value stays in its NATURAL post-projection layout [N, S_pad, C] (the
#   value_proj matmul output); levels are sliced along sublanes in-kernel.
#   When every level size is a multiple of 8 (the production 384x640 grid:
#   starts 0/3840/4800/5040) S_pad == S and no re-lay exists at all; other
#   shapes re-lay the SOURCE once per forward (relay_value below), hoisted
#   out of the 6 decoder layers.
# - heads are processed in PAIRS sharing one 128-lane slab slice
#   value[st:st+sl, 2j*d:(2j+2)*d]: each head's selection matrix contracts
#   against the full pair slab (the MXU pads N=64 lanes to 128 anyway, so
#   the dot count is unchanged), and a single lane-select merges the two
#   [Lq, 2d] partials — no sub-tile (64-lane) slices anywhere.
# - the output lands directly in the final [N, Lq, M*D] layout (the v2 path
#   paid a second transpose after the kernel).
#
# VPU/MXU work is otherwise identical to v2 (same per-level selection
# matrices, same per-head contractions); the shifted column tensors are now
# built once per level and shared by all heads.
# ---------------------------------------------------------------------------


def _spans_v4(spatial_shapes):
    """Per-level (start, size) with 8-aligned starts and no lead/tail pads.

    Returns (starts, sizes, s_pad); s_pad == sum(sizes) iff every level size
    is already a multiple of 8 (then the relaid layout IS the natural one).
    """
    starts, sizes = [], []
    off = 0
    for h, w in spatial_shapes:
        starts.append(off)
        sizes.append(h * w)
        off += -(-(h * w) // 8) * 8
    return starts, sizes, off


def needs_relay(spatial_shapes) -> bool:
    if v5_enabled():
        _, _, s_pad = _spans_v5(spatial_shapes)
        return s_pad != sum(h * w for h, w in spatial_shapes)
    starts, sizes, s_pad = _spans_v4(spatial_shapes)
    return s_pad != sum(sizes)


def relay_value(x, spatial_shapes):
    """[N, S, ...] -> [N, S_pad, ...] with every level start 8-aligned.

    Identity when the natural layout already conforms.  Done ONCE on the
    decoder memory (det_module hoists it out of the per-layer MSDA calls).
    With GRIT_MSDA_V5=1 the target layout is the v5 row-padded slab instead
    (W padded to a sublane multiple per level, see relay_value_v5).
    """
    if v5_enabled():
        return relay_value_v5(x, spatial_shapes)
    starts, sizes, s_pad = _spans_v4(spatial_shapes)
    if s_pad == sum(sizes):
        return x
    orig = level_start_index(spatial_shapes)
    segs = []
    for st_o, sz in zip(orig, sizes):
        seg = jax.lax.slice_in_dim(x, st_o, st_o + sz, axis=1)
        pad = -(-sz // 8) * 8 - sz
        if pad:
            widths = [(0, 0)] * x.ndim
            widths[1] = (0, pad)
            seg = jnp.pad(seg, widths)
        segs.append(seg)
    return jnp.concatenate(segs, axis=1) if len(segs) > 1 else segs[0]


def relay_mask(mask, spatial_shapes):
    """[N, S] bool pad mask -> [N, S_pad]; relay pad slots are True (padded)."""
    if v5_enabled():
        return relay_mask_v5(mask, spatial_shapes)
    starts, sizes, s_pad = _spans_v4(spatial_shapes)
    if s_pad == sum(sizes):
        return mask
    orig = level_start_index(spatial_shapes)
    segs = []
    for st_o, sz in zip(orig, sizes):
        seg = jax.lax.slice_in_dim(mask, st_o, st_o + sz, axis=1)
        pad = -(-sz // 8) * 8 - sz
        if pad:
            seg = jnp.pad(seg, [(0, 0), (0, pad)], constant_values=True)
        segs.append(seg)
    return jnp.concatenate(segs, axis=1) if len(segs) > 1 else segs[0]


def unrelay_value(x, spatial_shapes):
    """Inverse of relay_value (for the non-pallas fallback paths)."""
    if v5_enabled():
        return unrelay_value_v5(x, spatial_shapes)
    starts, sizes, s_pad = _spans_v4(spatial_shapes)
    if s_pad == sum(sizes):
        return x
    segs = [
        jax.lax.slice_in_dim(x, st, st + sz, axis=1)
        for st, sz in zip(starts, sizes)
    ]
    return jnp.concatenate(segs, axis=1) if len(segs) > 1 else segs[0]


def _prepare_indices_v4(spatial_shapes, sampling_locations, attention_weights,
                        real_hw=None):
    """Corner data in head-major [N, M, Lq, .] layout against the v4 spans.

    ``real_hw`` ([N, L, 2] int (h, w), optional): per-image REAL level dims.
    Corners landing in a level's bottom/right pad rectangle get their weight
    zeroed here — exactly equivalent to the reference's zeroing of the
    padded value positions (w*0 == 0*v), but on the tiny [N, Lq, M, L, P, 4]
    weight tensor instead of an [N, S_pad, C] elementwise pass over the
    value slab (~15 ms/step at b128 eval across the 6 decoder layers)."""
    n, lq, m, L, p, _ = sampling_locations.shape
    hs = np.array([h for h, _ in spatial_shapes], np.float32)
    ws = np.array([w for _, w in spatial_shapes], np.float32)
    st = np.array(_spans_v4(spatial_shapes)[0], np.int32)

    px = sampling_locations[..., 0] * ws[None, None, None, :, None] - 0.5
    py = sampling_locations[..., 1] * hs[None, None, None, :, None] - 0.5
    ix, iy, wgt, valid = _bilinear_corners(
        px, py, hs[None, None, None, :, None, None], ws[None, None, None, :, None, None]
    )  # [N, Lq, M, L, P, 4]
    ixc = jnp.clip(ix, 0, (ws - 1).astype(np.int32)[None, None, None, :, None, None])
    iyc = jnp.clip(iy, 0, (hs - 1).astype(np.int32)[None, None, None, :, None, None])
    flat = (
        st[None, None, None, :, None, None]
        + iyc * ws.astype(np.int32)[None, None, None, :, None, None]
        + ixc
    )
    w_total = jnp.where(valid, wgt, 0.0) * attention_weights[..., None]
    if real_hw is not None:
        rh = real_hw[..., 0].astype(ix.dtype)[:, None, None, :, None, None]
        rw = real_hw[..., 1].astype(ix.dtype)[:, None, None, :, None, None]
        w_total = jnp.where((ixc < rw) & (iyc < rh), w_total, 0.0)

    x0 = ix[..., 0]
    y0 = iy[..., 0]
    base = (
        st[None, None, None, :, None]
        + y0 * ws.astype(np.int32)[None, None, None, :, None]
        + x0
    )
    lo = (st - ws.astype(np.int32) - 1)[None, None, None, :, None]
    hi = (st + (hs * ws).astype(np.int32))[None, None, None, :, None]
    base = jnp.clip(base, lo, hi)

    c = L * p * 4
    idx_h = flat.reshape(n, lq, m, c).transpose(0, 2, 1, 3)      # [N, M, Lq, C]
    w_h = w_total.reshape(n, lq, m, c).transpose(0, 2, 1, 3)
    base_h = base.reshape(n, lq, m, L * p).transpose(0, 2, 1, 3)
    return idx_h, w_h, base_h


def _head_pairs(m: int):
    """(lane_start, heads) groups: pairs when the head count is even."""
    if m % 2 == 0:
        return [(2 * j, (2 * j, 2 * j + 1)) for j in range(m // 2)]
    return [(h, (h,)) for h in range(m)]


def _gather_matmul_kernel_v4(
    base_ref, w_ref, value_ref, out_ref, *, spans, npts, wdims, dhead
):
    """One program per IMAGE: all heads, natural [S_pad, C] value layout.

    Per level the shifted column tensors are built once and shared across
    heads; each head's per-level selection matrix contracts against the
    128-lane head-PAIR slab slice, and a lane select merges the pair.
    """
    lq = base_ref.shape[2]
    m = base_ref.shape[1]
    value = value_ref[0]                      # [S_pad, C]
    pairs = _head_pairs(m)
    accs = [
        [jnp.zeros((lq, dhead * len(hh)), jnp.float32) for hh in (heads,)][0]
        for _, heads in pairs
    ]
    for lvl, (st, sl) in enumerate(spans):
        wl = wdims[lvl]
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (lq, sl), 1) + st
        shifted = [col_ids - delta for delta in (0, 1, wl, wl + 1)]
        for gi, (lane0, heads) in enumerate(pairs):
            gw = dhead * len(heads)
            vsl = jax.lax.slice_in_dim(value, st, st + sl, axis=0)
            vsl = jax.lax.slice_in_dim(vsl, lane0 * dhead, lane0 * dhead + gw, axis=1)
            parts = []
            for h in heads:
                base = base_ref[0, h]          # [Lq, L*P]
                wts = w_ref[0, h]              # [Lq, L*P*4]
                selm = jnp.zeros((lq, sl), jnp.float32)
                for pt in range(lvl * npts, (lvl + 1) * npts):
                    b = jax.lax.slice_in_dim(base, pt, pt + 1, axis=1)
                    for ci in range(4):
                        ww = jax.lax.slice_in_dim(
                            wts, pt * 4 + ci, pt * 4 + ci + 1, axis=1)
                        selm = selm + jnp.where(
                            shifted[ci] == b, ww.astype(jnp.float32), 0.0)
                parts.append(jax.lax.dot_general(
                    selm.astype(value.dtype), vsl, (((1,), (0,)), ((), ())),
                    precision=_precision_for(value.dtype),
                    preferred_element_type=jnp.float32,
                ))                             # [Lq, gw]; head h valid only in
            if len(parts) == 2:                # its own d-lane block
                lane = jax.lax.broadcasted_iota(jnp.int32, (lq, gw), 1)
                part = jnp.where(lane < dhead, parts[0], parts[1])
            else:
                part = parts[0]
            accs[gi] = accs[gi] + part
    for gi, (lane0, heads) in enumerate(pairs):
        gw = dhead * len(heads)
        out_ref[0, :, lane0 * dhead:lane0 * dhead + gw] = accs[gi].astype(
            out_ref.dtype)


def _gather_bwd_kernel_v4(
    idx_ref, w_ref, value_ref, dout_ref, dw_ref, dval_ref,
    *, spans, spl, dhead
):
    """v4 backward: dW and dValue in the same natural layouts.

    dValue_l = selm^T @ dOut_pair, pair-merged by lane select (no scatter);
    dW picks its per-corner column out of dOut_head @ V_pair^T with the
    head's half of dOut masked so the 128-lane contraction stays aligned.
    """
    lq = idx_ref.shape[2]
    m = idx_ref.shape[1]
    value = value_ref[0]                      # [S_pad, C]
    dout = dout_ref[0]                        # [Lq, C]
    pairs = _head_pairs(m)

    dval_ref[0] = jnp.zeros(dval_ref.shape[1:], dval_ref.dtype)
    for lvl, (st, sl) in enumerate(spans):
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (lq, sl), 1) + st
        for lane0, heads in pairs:
            gw = dhead * len(heads)
            vsl = jax.lax.slice_in_dim(value, st, st + sl, axis=0)
            vsl = jax.lax.slice_in_dim(vsl, lane0 * dhead, lane0 * dhead + gw, axis=1)
            do_pair = jax.lax.slice_in_dim(
                dout, lane0 * dhead, lane0 * dhead + gw, axis=1)  # [Lq, gw]
            lane = jax.lax.broadcasted_iota(jnp.int32, (lq, gw), 1)
            dv_parts = []
            for hi_, h in enumerate(heads):
                idx = idx_ref[0, h]
                wts = w_ref[0, h]
                selm = jnp.zeros((lq, sl), jnp.float32)
                for ci in range(lvl * spl, (lvl + 1) * spl):
                    sel = jax.lax.slice_in_dim(idx, ci, ci + 1, axis=1)
                    ww = jax.lax.slice_in_dim(wts, ci, ci + 1, axis=1)
                    selm = selm + jnp.where(
                        col_ids == sel, ww.astype(jnp.float32), 0.0)
                dv_parts.append(jax.lax.dot_general(
                    selm.astype(do_pair.dtype), do_pair, (((0,), (0,)), ((), ())),
                    precision=_precision_for(value.dtype),
                    preferred_element_type=jnp.float32,
                ))                             # [S_l, gw]
                if len(heads) == 2:
                    half = lane < dhead if hi_ == 0 else lane >= dhead
                    do_h = jnp.where(half, do_pair, jnp.zeros((), do_pair.dtype))
                else:
                    do_h = do_pair
                dov = jax.lax.dot_general(     # [Lq, S_l]
                    do_h, vsl, (((1,), (1,)), ((), ())),
                    precision=_precision_for(value.dtype),
                    preferred_element_type=jnp.float32,
                )
                dw_lane = jax.lax.broadcasted_iota(
                    jnp.int32, (lq, idx_ref.shape[3]), 1)
                dw = jnp.zeros((lq, idx_ref.shape[3]), jnp.float32)
                for ci in range(lvl * spl, (lvl + 1) * spl):
                    sel = jax.lax.slice_in_dim(idx, ci, ci + 1, axis=1)
                    dw_ci = jnp.sum(
                        jnp.where(col_ids == sel, dov, 0.0), axis=1, keepdims=True)
                    dw = dw + jnp.where(dw_lane == ci, dw_ci, 0.0)
                if lvl == 0:
                    dw_ref[0, h] = dw.astype(dw_ref.dtype)
                else:
                    dw_ref[0, h] = dw_ref[0, h] + dw.astype(dw_ref.dtype)
            if len(dv_parts) == 2:
                slane = jax.lax.broadcasted_iota(jnp.int32, dv_parts[0].shape, 1)
                dv = jnp.where(slane < dhead, dv_parts[0], dv_parts[1])
            else:
                dv = dv_parts[0]
            dval_ref[0, st:st + sl, lane0 * dhead:lane0 * dhead + gw] = dv.astype(
                dval_ref.dtype)


def _gather_call_v4(base_h, w_h, value, spans, npts, wdims, dhead):
    n, m, lq, _ = w_h.shape
    s_pad, c = value.shape[1], value.shape[2]
    kernel = functools.partial(
        _gather_matmul_kernel_v4, spans=spans, npts=npts, wdims=wdims, dhead=dhead
    )
    cp = base_h.shape[3]
    cw = w_h.shape[3]
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, m, lq, cp), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, lq, cw), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, lq, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, lq, c), value.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * m * lq * sum(sz for _, sz in spans) * 2 * dhead,
            bytes_accessed=4 * (value.size + base_h.size + w_h.size + n * lq * c),
            transcendentals=0,
        ),
        # the whole-image working set (double-buffered [S_pad, C] slab +
        # per-level selection matrices and shifted column tensors) exceeds
        # the 16 MB default scoped-vmem budget; v5e has 128 MB physical
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
    )(base_h, w_h, value)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _gather_op_v4(idx_h, base_h, w_h, value, spans, npts, wdims, dhead):
    return _gather_call_v4(base_h, w_h, value, spans, npts, wdims, dhead)


def _gather_fwd_v4(idx_h, base_h, w_h, value, spans, npts, wdims, dhead):
    out = _gather_call_v4(base_h, w_h, value, spans, npts, wdims, dhead)
    return out, (idx_h, w_h, value)


def _gather_bwd_v4(spans, npts, wdims, dhead, residuals, dout):
    idx_h, w_h, value = residuals
    n, m, lq, c = idx_h.shape
    s_pad, cc = value.shape[1], value.shape[2]
    kernel = functools.partial(
        _gather_bwd_kernel_v4, spans=spans, spl=npts * 4, dhead=dhead
    )
    dw, dval = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, m, lq, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, lq, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, cc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lq, cc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, m, lq, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, cc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, m, lq, c), w_h.dtype),
            jax.ShapeDtypeStruct((n, s_pad, cc), value.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * n * m * lq * sum(sz for _, sz in spans) * 2 * dhead,
            bytes_accessed=8 * (value.size + idx_h.size + w_h.size),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
    )(idx_h, w_h, value, dout)
    didx = np.zeros(idx_h.shape, jax.dtypes.float0)
    dbase = np.zeros(idx_h.shape[:3] + (idx_h.shape[3] // 4,), jax.dtypes.float0)
    return didx, dbase, dw, dval


_gather_op_v4.defvjp(_gather_fwd_v4, _gather_bwd_v4)


def ms_deform_attn_pallas_relaid(
    value, spatial_shapes, sampling_locations, attention_weights, real_hw=None
):
    """MSDA on a RELAID [N, S_pad, C] value slab (see relay_value) -> [N, Lq, C].

    The hot-path entry: value stays in its natural post-projection layout
    (no [N, M, S, D] transpose, no per-call re-lay), heads are handled
    in-kernel.  C = num_heads * head_dim with head h at lanes [h*d, (h+1)*d).
    With ``real_hw`` ([N, L, 2] int), pad-rectangle masking is applied to
    the corner weights instead of requiring a pre-masked value slab.
    """
    n, s_pad, c = value.shape
    _, lq, m, L, p, _ = sampling_locations.shape
    dhead = c // m
    if v5_enabled():
        return ms_deform_attn_pallas_v5(
            value, spatial_shapes, sampling_locations, attention_weights,
            real_hw=real_hw,
        )
    starts, sizes, s_pad_want = _spans_v4(spatial_shapes)
    if s_pad != s_pad_want:
        raise ValueError(
            f"value slab has {s_pad} rows; spans want {s_pad_want} "
            "(pass it through relay_value first)"
        )
    idx_h, w_h, base_h = _prepare_indices_v4(
        spatial_shapes, sampling_locations, attention_weights, real_hw=real_hw
    )
    wdims = tuple(int(w_) for _, w_ in spatial_shapes)
    return _gather_op_v4(
        idx_h, base_h, w_h, value,
        tuple(zip(starts, sizes)), p, wdims, dhead,
    )


# ---------------------------------------------------------------------------
# v5: separable selection matrices — the VPU-cost rewrite of v4.
#
# v4's wall is the VPU: per (head, level, point) it spends 4 corner slots x
# (compare + select + add) over a full [Lq, S_l] tile (~308M element-passes
# per image at the production pyramid; the b128 trace charges each decoder
# layer's MSDA ~9.4 ms, VPU-bound, while the MXU idles at ~5%).
#
# v5 exploits that a bilinear stencil is SEPARABLE: the four corner weights
# of a point are the outer product of a 2-tap row vector and a 2-tap column
# vector,
#
#   w_TL,TR,BL,BR = (1-fy, fy) x ((1-fx)*a, fx*a).
#
# So the per-point selection MATRIX over a level grid is rank-1:
#
#   selm_pt = rowsel_pt (x) colsel_pt,   rowsel in R^[H], colsel in R^[Wp]
#
# and the per-level selection matrix is a sum of P rank-1 updates.  The
# kernel builds rowsel/colsel with compares over TINY [H, Lq] / [Wp, Lq]
# tiles and accumulates each point with ONE fused broadcast-multiply-add
# over [H, Wp, Lq] — ~8 element-passes per (head, level) instead of v4's
# ~48.  Everything is laid out TRANSPOSED ([rows, Lq] with queries on
# lanes): merging (H, Wp) -> H*Wp on the sublane side is layout-free when
# Wp % 8 == 0, which is why the slab carries its rows padded to Wp =
# ceil(W/8)*8 (relay_value_v5; +7.5% slab rows at 384x640 vs v4's zero-pad).
# Pad columns are NEVER selected — invalid corner indices are set to -1 in
# prep (out-of-level, out-of-real-rectangle, or the x0+1==W edge), so the
# pad content is irrelevant and the hoisted src relay can run BEFORE the
# per-layer value projections (pad rows hold the projection bias, harmless).
#
# The backward reuses the v4 selector-transpose kernel on corner-form
# indices/weights computed against the v5 strides: the corner-form gradient
# path is complete by itself (it is exactly the production v4 gradient), so
# the separable forward inputs receive zero cotangents.
#
# (Replaces the same CUDA col2im family as v2/v4 — reference
# models/ops/src/cuda/ms_deform_im2col_cuda.cuh:238-299.)
# ---------------------------------------------------------------------------


def v5_enabled() -> bool:
    """GRIT_MSDA_V5 selects the pallas MSDA path (and the relay layout that
    det_module applies to the decoder memory): the separable-selection v5
    kernel (default — chip A/B 2026-08-19, b128 beam5 eval: 324.9 vs 295.1
    img/s, 9.4 -> ~2 ms per decoder layer) vs the v4 corner-compare kernel
    (``GRIT_MSDA_V5=0``).  Read lazily (trace time) so tests can flip it."""
    return os.environ.get("GRIT_MSDA_V5", "1") == "1"


def _spans_v5(spatial_shapes):
    """Per-level (start, H, Wp) for the row-padded v5 slab layout.

    Wp = ceil(W/8)*8: each level is stored as an [H, Wp] grid flattened
    row-major, so a [H, Wp, Lq] selection tensor reshapes to [H*Wp, Lq]
    with no data movement (sublane-dim merge).  Starts are 8-aligned by
    construction.  Returns (starts, dims, s_pad) with dims = ((H, Wp), ...).
    """
    starts, dims = [], []
    off = 0
    for h, w in spatial_shapes:
        wp = -(-w // 8) * 8
        starts.append(off)
        dims.append((h, wp))
        off += h * wp
    return starts, dims, off


def relay_value_v5(x, spatial_shapes):
    """[N, S, ...] natural layout -> [N, S5, ...] with W padded per level."""
    n = x.shape[0]
    orig = level_start_index(spatial_shapes)
    segs = []
    for st_o, (h, w) in zip(orig, spatial_shapes):
        seg = jax.lax.slice_in_dim(x, st_o, st_o + h * w, axis=1)
        wp = -(-w // 8) * 8
        if wp != w:
            seg = seg.reshape((n, h, w) + x.shape[2:])
            widths = [(0, 0)] * seg.ndim
            widths[2] = (0, wp - w)
            seg = jnp.pad(seg, widths).reshape((n, h * wp) + x.shape[2:])
        segs.append(seg)
    return jnp.concatenate(segs, axis=1) if len(segs) > 1 else segs[0]


def relay_mask_v5(mask, spatial_shapes):
    """[N, S] bool pad mask -> [N, S5]; relay pad slots are True (padded)."""
    n = mask.shape[0]
    orig = level_start_index(spatial_shapes)
    segs = []
    for st_o, (h, w) in zip(orig, spatial_shapes):
        seg = jax.lax.slice_in_dim(mask, st_o, st_o + h * w, axis=1)
        wp = -(-w // 8) * 8
        if wp != w:
            seg = jnp.pad(seg.reshape(n, h, w), [(0, 0), (0, 0), (0, wp - w)],
                          constant_values=True).reshape(n, h * wp)
        segs.append(seg)
    return jnp.concatenate(segs, axis=1) if len(segs) > 1 else segs[0]


def unrelay_value_v5(x, spatial_shapes):
    """Inverse of relay_value_v5 (for the non-pallas fallback paths)."""
    n = x.shape[0]
    starts, dims, _ = _spans_v5(spatial_shapes)
    segs = []
    for st, (h, wp), (h_o, w) in zip(starts, dims, spatial_shapes):
        seg = jax.lax.slice_in_dim(x, st, st + h * wp, axis=1)
        if wp != w:
            seg = seg.reshape((n, h, wp) + x.shape[2:])
            seg = jax.lax.slice_in_dim(seg, 0, w, axis=2)
            seg = seg.reshape((n, h * w) + x.shape[2:])
        segs.append(seg)
    return jnp.concatenate(segs, axis=1) if len(segs) > 1 else segs[0]


def _prepare_sep_v5(spatial_shapes, sampling_locations, attention_weights,
                    real_hw=None):
    """Separable per-point taps in kernel layout [N, M, 2*L*P, Lq].

    Slot 2*pt holds the floor tap (y0 / x0), slot 2*pt+1 the ceil tap.
    Invalid taps (outside the level, outside the per-image real rectangle,
    or the ceil tap falling on the first pad column/row) carry index -1 so
    the kernel's iota compare never matches — identical zeroing to v4's
    corner-weight masking.  Row indices are LEVEL-LOCAL (the kernel slices
    the level first); the attention weight rides the x taps.
    """
    n, lq, m, L, p, _ = sampling_locations.shape
    hs = np.array([h for h, _ in spatial_shapes], np.float32)
    ws = np.array([w for _, w in spatial_shapes], np.float32)

    px = sampling_locations[..., 0] * ws[None, None, None, :, None] - 0.5
    py = sampling_locations[..., 1] * hs[None, None, None, :, None] - 0.5
    x0 = jnp.floor(px).astype(jnp.int32)       # [N, Lq, M, L, P]
    y0 = jnp.floor(py).astype(jnp.int32)
    fx = (px - x0).astype(jnp.float32)
    fy = (py - y0).astype(jnp.float32)

    hmax = hs.astype(np.int32)[None, None, None, :, None]
    wmax = ws.astype(np.int32)[None, None, None, :, None]
    if real_hw is not None:
        hmax = jnp.minimum(hmax, real_hw[..., 0][:, None, None, :, None])
        wmax = jnp.minimum(wmax, real_hw[..., 1][:, None, None, :, None])

    def taps(i0, imax):
        i1 = i0 + 1
        v0 = jnp.where((i0 >= 0) & (i0 < imax), i0, -1)
        v1 = jnp.where((i1 >= 0) & (i1 < imax), i1, -1)
        return v0, v1

    y0v, y1v = taps(y0, hmax)
    x0v, x1v = taps(x0, wmax)
    a = attention_weights.astype(jnp.float32)   # [N, Lq, M, L, P]

    def pack(t0, t1):
        # [N, Lq, M, L, P] x2 -> [N, M, 2*L*P, Lq] (pt-major slot pairs)
        t = jnp.stack([t0, t1], axis=-1).reshape(n, lq, m, L * p * 2)
        return t.transpose(0, 2, 3, 1)

    yy = pack(y0v, y1v)
    xx = pack(x0v, x1v)
    wy = pack(1.0 - fy, fy)
    wxa = pack((1.0 - fx) * a, fx * a)
    return yy, xx, wy, wxa


def _prepare_corner_v5(spatial_shapes, sampling_locations, attention_weights,
                       real_hw=None):
    """Corner-form (idx, weights) against the v5 row-padded strides — the
    backward path's input (reuses the v4 selector-transpose bwd kernel)."""
    n, lq, m, L, p, _ = sampling_locations.shape
    hs = np.array([h for h, _ in spatial_shapes], np.float32)
    ws = np.array([w for _, w in spatial_shapes], np.float32)
    starts, dims, _ = _spans_v5(spatial_shapes)
    st = np.array(starts, np.int32)
    wps = np.array([wp for _, wp in dims], np.int32)

    px = sampling_locations[..., 0] * ws[None, None, None, :, None] - 0.5
    py = sampling_locations[..., 1] * hs[None, None, None, :, None] - 0.5
    ix, iy, wgt, valid = _bilinear_corners(
        px, py, hs[None, None, None, :, None, None], ws[None, None, None, :, None, None]
    )  # [N, Lq, M, L, P, 4]
    ixc = jnp.clip(ix, 0, (ws - 1).astype(np.int32)[None, None, None, :, None, None])
    iyc = jnp.clip(iy, 0, (hs - 1).astype(np.int32)[None, None, None, :, None, None])
    flat = (
        st[None, None, None, :, None, None]
        + iyc * wps[None, None, None, :, None, None]
        + ixc
    )
    w_total = jnp.where(valid, wgt, 0.0) * attention_weights[..., None]
    if real_hw is not None:
        rh = real_hw[..., 0].astype(ix.dtype)[:, None, None, :, None, None]
        rw = real_hw[..., 1].astype(ix.dtype)[:, None, None, :, None, None]
        w_total = jnp.where((ixc < rw) & (iyc < rh), w_total, 0.0)
    c = L * p * 4
    idx_h = flat.reshape(n, lq, m, c).transpose(0, 2, 1, 3)      # [N, M, Lq, C]
    w_h = w_total.reshape(n, lq, m, c).transpose(0, 2, 1, 3)
    return idx_h, w_h


def _gather_matmul_kernel_v5(
    yy_ref, xx_ref, wy_ref, wx_ref, value_ref, out_ref, *, spans5, npts, dhead
):
    """One program per IMAGE, separable rank-1 selection accumulation.

    Per (head, level): P fused multiply-adds of rowsel (x) colsel over a
    TRANSPOSED [H, Wp, Lq] tile (queries on lanes), then one contraction
    [H*Wp, Lq]^T-dot-[H*Wp, gw] against the head-pair slab slice.  The
    compares run over [H, Lq] / [Wp, Lq] only.
    """
    lq = yy_ref.shape[3]
    m = yy_ref.shape[1]
    value = value_ref[0]                        # [S5, C]
    pairs = _head_pairs(m)
    accs = [jnp.zeros((lq, dhead * len(heads)), jnp.float32)
            for _, heads in pairs]
    for lvl, (st, hl, wp) in enumerate(spans5):
        sl = hl * wp
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (hl, 1, lq), 0)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, wp, lq), 1)
        vsl = jax.lax.slice_in_dim(value, st, st + sl, axis=0)
        for gi, (lane0, heads) in enumerate(pairs):
            gw = dhead * len(heads)
            vs = jax.lax.slice_in_dim(vsl, lane0 * dhead, lane0 * dhead + gw,
                                      axis=1)
            parts = []
            for h in heads:
                ya = yy_ref[0, h]               # [2*L*P, Lq]
                xa = xx_ref[0, h]
                wya = wy_ref[0, h]
                wxa = wx_ref[0, h]
                selm3 = jnp.zeros((hl, wp, lq), jnp.float32)
                for pt in range(lvl * npts, (lvl + 1) * npts):
                    def tap(arr, slot):
                        return jax.lax.slice_in_dim(
                            arr, slot, slot + 1, axis=0).reshape(1, 1, lq)
                    rsel = (
                        jnp.where(row_iota == tap(ya, 2 * pt),
                                  tap(wya, 2 * pt), 0.0)
                        + jnp.where(row_iota == tap(ya, 2 * pt + 1),
                                    tap(wya, 2 * pt + 1), 0.0)
                    )                            # [hl, 1, lq]
                    csel = (
                        jnp.where(col_iota == tap(xa, 2 * pt),
                                  tap(wxa, 2 * pt), 0.0)
                        + jnp.where(col_iota == tap(xa, 2 * pt + 1),
                                    tap(wxa, 2 * pt + 1), 0.0)
                    )                            # [1, wp, lq]
                    selm3 = selm3 + rsel * csel
                selm = selm3.reshape(sl, lq)     # layout-free: wp % 8 == 0
                parts.append(jax.lax.dot_general(
                    selm.astype(value.dtype), vs, (((0,), (0,)), ((), ())),
                    precision=_precision_for(value.dtype),
                    preferred_element_type=jnp.float32,
                ))                               # [Lq, gw]
            if len(parts) == 2:                  # head h valid in its d-lanes
                lane = jax.lax.broadcasted_iota(jnp.int32, (lq, gw), 1)
                part = jnp.where(lane < dhead, parts[0], parts[1])
            else:
                part = parts[0]
            accs[gi] = accs[gi] + part
    for gi, (lane0, heads) in enumerate(pairs):
        gw = dhead * len(heads)
        out_ref[0, :, lane0 * dhead:lane0 * dhead + gw] = accs[gi].astype(
            out_ref.dtype)


def _gather_call_v5(yy, xx, wy, wxa, value, spans5, npts, dhead):
    n, m, c2, lq = yy.shape
    s_pad, c = value.shape[1], value.shape[2]
    kernel = functools.partial(
        _gather_matmul_kernel_v5, spans5=spans5, npts=npts, dhead=dhead
    )
    tap_spec = pl.BlockSpec((1, m, c2, lq), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            tap_spec, tap_spec, tap_spec, tap_spec,
            pl.BlockSpec((1, s_pad, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, lq, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, lq, c), value.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * m * lq * sum(h * wp for _, h, wp in spans5) * 2 * dhead,
            bytes_accessed=4 * (value.size + 2 * yy.size + 2 * wy.size
                                + n * lq * c),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
    )(yy, xx, wy, wxa, value)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _gather_op_v5(yy, xx, wy, wxa, idx_h, w_h, value, spans5, npts, dhead):
    return _gather_call_v5(yy, xx, wy, wxa, value, spans5, npts, dhead)


def _gather_fwd_v5(yy, xx, wy, wxa, idx_h, w_h, value, spans5, npts, dhead):
    out = _gather_call_v5(yy, xx, wy, wxa, value, spans5, npts, dhead)
    return out, (idx_h, w_h, value)


def _gather_bwd_v5(spans5, npts, dhead, residuals, dout):
    """Reuses the v4 selector-transpose bwd kernel on v5-stride corner form.

    The corner-form path carries the COMPLETE gradient (it is exactly the
    v4 production gradient of the same function), so the separable forward
    operands get zero cotangents and the chain through _prepare_sep_v5
    contributes nothing — d(loc)/d(attn) flow via _prepare_corner_v5 alone.
    """
    idx_h, w_h, value = residuals
    n, m, lq, c = idx_h.shape
    s_pad, cc = value.shape[1], value.shape[2]
    spans = tuple((st, h * wp) for st, h, wp in spans5)
    kernel = functools.partial(
        _gather_bwd_kernel_v4, spans=spans, spl=npts * 4, dhead=dhead
    )
    dw, dval = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, m, lq, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, lq, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, cc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lq, cc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, m, lq, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, cc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, m, lq, c), w_h.dtype),
            jax.ShapeDtypeStruct((n, s_pad, cc), value.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * n * m * lq * sum(sz for _, sz in spans) * 2 * dhead,
            bytes_accessed=8 * (value.size + idx_h.size + w_h.size),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
    )(idx_h, w_h, value, dout)
    dyy = np.zeros((n, m, c // 2, lq), jax.dtypes.float0)
    dwy = jnp.zeros((n, m, c // 2, lq), jnp.float32)
    return dyy, dyy, dwy, dwy, np.zeros(idx_h.shape, jax.dtypes.float0), dw, dval


_gather_op_v5.defvjp(_gather_fwd_v5, _gather_bwd_v5)


def ms_deform_attn_pallas_v5(
    value, spatial_shapes, sampling_locations, attention_weights, real_hw=None
):
    """MSDA on a v5-relaid [N, S5, C] value slab (relay_value_v5) -> [N, Lq, C].

    Large pyramids (det pre-training 832x1344, S5 ~= 23600) route to the
    S-chunked variant below — the whole-slab kernels' VMEM ask scales with
    S (the round-4 det backward wanted 191 MB of the v5e's 128 MB).
    """
    n, s_pad, c = value.shape
    _, lq, m, L, p, _ = sampling_locations.shape
    dhead = c // m
    starts, dims, s_pad_want = _spans_v5(spatial_shapes)
    if s_pad != s_pad_want:
        raise ValueError(
            f"value slab has {s_pad} rows; v5 spans want {s_pad_want} "
            "(pass it through relay_value_v5 first)"
        )
    yy, xx, wy, wxa = _prepare_sep_v5(
        spatial_shapes, sampling_locations, attention_weights, real_hw=real_hw
    )
    idx_h, w_h = _prepare_corner_v5(
        spatial_shapes, sampling_locations, attention_weights, real_hw=real_hw
    )
    spans5 = tuple((st, h, wp) for st, (h, wp) in zip(starts, dims))
    mode = os.environ.get("GRIT_MSDA_CHUNKED", "1")
    slab_bytes = s_pad * c * value.dtype.itemsize
    if mode == "force" or (mode != "0" and slab_bytes > _slab_limit_bytes()):
        return _gather_op_v5s(yy, xx, wy, wxa, idx_h, w_h, value, spans5, p, dhead)
    return _gather_op_v5(yy, xx, wy, wxa, idx_h, w_h, value, spans5, p, dhead)


# ---------------------------------------------------------------------------
# v5s: S-chunked v5 — the det-pyramid variant (same separable math, bounded
# VMEM).
#
# The whole-slab v5 kernels hold [S5, C] resident and build [Lq, S_l] /
# [H, Wp, Lq] f32 selection temps per head; at the det pre-training pyramid
# (832x1344 -> S5 ~= 23600, level 0 is 104x168) Mosaic's live-range for the
# unrolled head loop wanted 191 MB of the v5e's 128 MB VMEM and the module
# demoted to the XLA 'flat' gather (round 4, docs/FLAGS.md).  This variant
# keeps the kernel on the MXU at ANY pyramid size by two decompositions,
# mirroring what the CUDA ext's ``im2col_step`` batch-chunking does for GPU
# shared memory (reference models/ops/src/cuda/ms_deform_attn_cuda.cu:20-80)
# but along the dimension that matters on TPU — the value slab:
#
# - per LEVEL: one pallas_call per pyramid level (4 calls), each seeing only
#   that level's [H_l * Wp_l, C] slab segment.  Levels are additive in the
#   output, so the f32 partial outputs just sum.
# - per ROW-CHUNK: within a level the grid is (image, row-chunk); each
#   program holds an [hr, Wp] row window of the level.  A bilinear tap either
#   falls in the window (its iota compare matches) or contributes zero, so
#   accumulating into the revisited [Lq, C] f32 output block across the chunk
#   dimension reproduces the unchunked sum exactly; the backward writes each
#   dval chunk once (slab rows partition across chunks) and accumulates dW.
#
# Chunking is FLOP-neutral (the per-chunk selection builds + dots sum to the
# unchunked work) and bounds the f32 temps at [Lq, hr*Wp] — hr is sized from
# a per-program budget (GRIT_MSDA_CHUNK_VMEM_MB, default 8 MB).
# ---------------------------------------------------------------------------


def _slab_limit_bytes() -> int:
    """The pallas whole-slab VMEM feasibility bound (shared with det_module)."""
    return int(float(os.environ.get("GRIT_MSDA_PALLAS_MAX_SLAB_MB", "10")) * (1 << 20))


def chunked_fallback_available() -> bool:
    """True when an over-bound slab can stay on pallas via the S-chunked v5
    kernels instead of demoting to the XLA 'flat' gather (det_module)."""
    return v5_enabled() and os.environ.get("GRIT_MSDA_CHUNKED", "1") != "0"


def _chunk_plan_v5s(hl: int, wp: int, lq: int):
    """(rows-per-chunk, n_chunks) bounding the [Lq, hr*Wp] f32 temps.

    The budget covers the two big per-head temps (selection matrix + dov in
    the backward; the forward's [hr, Wp, Lq] tile is the same footprint).
    Chunks are balanced: nk = ceil(hl / hr_max), hr = ceil(hl / nk).
    """
    budget = int(float(os.environ.get("GRIT_MSDA_CHUNK_VMEM_MB", "8")) * (1 << 20))
    lqp = -(-lq // 128) * 128
    hr_max = max(1, budget // (wp * lqp * 4 * 2))
    nk = -(-hl // hr_max)
    hr = -(-hl // nk)
    return hr, nk


def _gather_matmul_kernel_v5s(
    yy_ref, xx_ref, wy_ref, wx_ref, value_ref, out_ref, *, hr, wp, npts, dhead
):
    """One program per (image, row-chunk) of ONE level — S-chunked v5 forward.

    Identical separable math to ``_gather_matmul_kernel_v5`` restricted to a
    [hr, wp] row window; partial sums accumulate into the revisited f32
    output block across the chunk grid dimension.
    """
    lq = yy_ref.shape[3]
    m = yy_ref.shape[1]
    kc = pl.program_id(1)
    value = value_ref[0]                        # [hr*wp, C] chunk
    pairs = _head_pairs(m)

    @pl.when(kc == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (hr, 1, lq), 0) + kc * hr
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, wp, lq), 1)
    for lane0, heads in pairs:
        gw = dhead * len(heads)
        vs = jax.lax.slice_in_dim(value, lane0 * dhead, lane0 * dhead + gw,
                                  axis=1)
        parts = []
        for h in heads:
            ya = yy_ref[0, h]                   # [2*P, Lq] level-local rows
            xa = xx_ref[0, h]
            wya = wy_ref[0, h]
            wxa_ = wx_ref[0, h]
            selm3 = jnp.zeros((hr, wp, lq), jnp.float32)
            for pt in range(npts):
                def tap(arr, slot):
                    return jax.lax.slice_in_dim(
                        arr, slot, slot + 1, axis=0).reshape(1, 1, lq)
                rsel = (
                    jnp.where(row_iota == tap(ya, 2 * pt),
                              tap(wya, 2 * pt), 0.0)
                    + jnp.where(row_iota == tap(ya, 2 * pt + 1),
                                tap(wya, 2 * pt + 1), 0.0)
                )                                # [hr, 1, Lq]
                csel = (
                    jnp.where(col_iota == tap(xa, 2 * pt),
                              tap(wxa_, 2 * pt), 0.0)
                    + jnp.where(col_iota == tap(xa, 2 * pt + 1),
                                tap(wxa_, 2 * pt + 1), 0.0)
                )                                # [1, wp, Lq]
                selm3 = selm3 + rsel * csel
            selm = selm3.reshape(hr * wp, lq)    # layout-free: wp % 8 == 0
            parts.append(jax.lax.dot_general(
                selm.astype(value.dtype), vs, (((0,), (0,)), ((), ())),
                precision=_precision_for(value.dtype),
                preferred_element_type=jnp.float32,
            ))                                   # [Lq, gw]
        if len(parts) == 2:
            lane = jax.lax.broadcasted_iota(jnp.int32, (lq, gw), 1)
            part = jnp.where(lane < dhead, parts[0], parts[1])
        else:
            part = parts[0]
        out_ref[0, :, lane0 * dhead:lane0 * dhead + gw] = (
            out_ref[0, :, lane0 * dhead:lane0 * dhead + gw] + part
        )


def _gather_bwd_kernel_v5s(
    idx_ref, w_ref, value_ref, dout_ref, dw_ref, dval_ref, *, hr, wp, spl, dhead
):
    """S-chunked v5 backward: one program per (image, row-chunk) of ONE level.

    dval chunk rows are written exactly once (slab rows partition across
    chunks); dW accumulates in its revisited block — a corner contributes
    from the single chunk containing it.  Corner indices are LEVEL-LOCAL
    flat (y * wp + x).
    """
    lq = idx_ref.shape[2]
    m = idx_ref.shape[1]
    kc = pl.program_id(1)
    chunk = hr * wp
    value = value_ref[0]                        # [chunk, C]
    dout = dout_ref[0]                          # [Lq, C]
    pairs = _head_pairs(m)

    @pl.when(kc == 0)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (lq, chunk), 1) + kc * chunk
    for lane0, heads in pairs:
        gw = dhead * len(heads)
        vsl = jax.lax.slice_in_dim(value, lane0 * dhead, lane0 * dhead + gw,
                                   axis=1)
        do_pair = jax.lax.slice_in_dim(
            dout, lane0 * dhead, lane0 * dhead + gw, axis=1)   # [Lq, gw]
        lane = jax.lax.broadcasted_iota(jnp.int32, (lq, gw), 1)
        dv_parts = []
        for hi_, h in enumerate(heads):
            idx = idx_ref[0, h]                 # [Lq, spl] level-local flat
            wts = w_ref[0, h]
            selm = jnp.zeros((lq, chunk), jnp.float32)
            for ci in range(spl):
                sel = jax.lax.slice_in_dim(idx, ci, ci + 1, axis=1)
                ww = jax.lax.slice_in_dim(wts, ci, ci + 1, axis=1)
                selm = selm + jnp.where(
                    col_ids == sel, ww.astype(jnp.float32), 0.0)
            dv_parts.append(jax.lax.dot_general(
                selm.astype(do_pair.dtype), do_pair, (((0,), (0,)), ((), ())),
                precision=_precision_for(value.dtype),
                preferred_element_type=jnp.float32,
            ))                                   # [chunk, gw]
            if len(heads) == 2:
                half = lane < dhead if hi_ == 0 else lane >= dhead
                do_h = jnp.where(half, do_pair, jnp.zeros((), do_pair.dtype))
            else:
                do_h = do_pair
            dov = jax.lax.dot_general(           # [Lq, chunk]
                do_h, vsl, (((1,), (1,)), ((), ())),
                precision=_precision_for(value.dtype),
                preferred_element_type=jnp.float32,
            )
            dw_lane = jax.lax.broadcasted_iota(jnp.int32, (lq, spl), 1)
            dw = jnp.zeros((lq, spl), jnp.float32)
            for ci in range(spl):
                sel = jax.lax.slice_in_dim(idx, ci, ci + 1, axis=1)
                dw_ci = jnp.sum(
                    jnp.where(col_ids == sel, dov, 0.0), axis=1, keepdims=True)
                dw = dw + jnp.where(dw_lane == ci, dw_ci, 0.0)
            dw_ref[0, h] = dw_ref[0, h] + dw.astype(dw_ref.dtype)
        if len(dv_parts) == 2:
            slane = jax.lax.broadcasted_iota(jnp.int32, dv_parts[0].shape, 1)
            dv = jnp.where(slane < dhead, dv_parts[0], dv_parts[1])
        else:
            dv = dv_parts[0]
        dval_ref[0, :, lane0 * dhead:lane0 * dhead + gw] = dv.astype(
            dval_ref.dtype)


def _gather_call_v5s(yy, xx, wy, wxa, value, spans5, npts, dhead):
    n, m, _, lq = yy.shape
    c = value.shape[2]
    total = None
    for lvl, (st, hl, wp) in enumerate(spans5):
        hr, nk = _chunk_plan_v5s(hl, wp, lq)
        hpad = hr * nk
        val_l = jax.lax.slice_in_dim(value, st, st + hl * wp, axis=1)
        if hpad != hl:
            val_l = jnp.pad(val_l, [(0, 0), (0, (hpad - hl) * wp), (0, 0)])
        sl = slice(2 * lvl * npts, 2 * (lvl + 1) * npts)
        kernel = functools.partial(
            _gather_matmul_kernel_v5s, hr=hr, wp=wp, npts=npts, dhead=dhead)
        c2 = 2 * npts
        tap_spec = pl.BlockSpec((1, m, c2, lq), lambda i, k: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        out_l = pl.pallas_call(
            kernel,
            grid=(n, nk),
            in_specs=[
                tap_spec, tap_spec, tap_spec, tap_spec,
                pl.BlockSpec((1, hr * wp, c), lambda i, k: (i, k, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, lq, c), lambda i, k: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, lq, c), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * n * m * lq * hpad * wp * 2 * dhead,
                bytes_accessed=2 * val_l.size + 4 * n * lq * c,
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        )(yy[:, :, sl], xx[:, :, sl], wy[:, :, sl], wxa[:, :, sl], val_l)
        total = out_l if total is None else total + out_l
    return total.astype(value.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _gather_op_v5s(yy, xx, wy, wxa, idx_h, w_h, value, spans5, npts, dhead):
    return _gather_call_v5s(yy, xx, wy, wxa, value, spans5, npts, dhead)


def _gather_fwd_v5s(yy, xx, wy, wxa, idx_h, w_h, value, spans5, npts, dhead):
    out = _gather_call_v5s(yy, xx, wy, wxa, value, spans5, npts, dhead)
    return out, (idx_h, w_h, value)


def _gather_bwd_v5s(spans5, npts, dhead, residuals, dout):
    """Per-level, row-chunked backward.  Like _gather_bwd_v5 the corner-form
    path carries the COMPLETE gradient; the separable forward operands get
    zero cotangents."""
    idx_h, w_h, value = residuals
    n, m, lq, cw = idx_h.shape
    c = value.shape[2]
    spl = npts * 4
    dw_parts, dval_parts = [], []
    for lvl, (st, hl, wp) in enumerate(spans5):
        hr, nk = _chunk_plan_v5s(hl, wp, lq)
        hpad = hr * nk
        val_l = jax.lax.slice_in_dim(value, st, st + hl * wp, axis=1)
        if hpad != hl:
            val_l = jnp.pad(val_l, [(0, 0), (0, (hpad - hl) * wp), (0, 0)])
        slc = slice(lvl * spl, (lvl + 1) * spl)
        idx_l = idx_h[:, :, :, slc] - st        # level-local flat indices
        w_l = w_h[:, :, :, slc]
        kernel = functools.partial(
            _gather_bwd_kernel_v5s, hr=hr, wp=wp, spl=spl, dhead=dhead)
        dw_l, dval_l = pl.pallas_call(
            kernel,
            grid=(n, nk),
            in_specs=[
                pl.BlockSpec((1, m, lq, spl), lambda i, k: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, m, lq, spl), lambda i, k: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hr * wp, c), lambda i, k: (i, k, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lq, c), lambda i, k: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, m, lq, spl), lambda i, k: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hr * wp, c), lambda i, k: (i, k, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, m, lq, spl), w_h.dtype),
                jax.ShapeDtypeStruct((n, hpad * wp, c), value.dtype),
            ],
            cost_estimate=pl.CostEstimate(
                flops=4 * n * m * lq * hpad * wp * 2 * dhead,
                bytes_accessed=4 * val_l.size + 8 * (idx_l.size + w_l.size),
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        )(idx_l, w_l, val_l, dout)
        dw_parts.append(dw_l)
        dval_parts.append(jax.lax.slice_in_dim(dval_l, 0, hl * wp, axis=1))
    dw = jnp.concatenate(dw_parts, axis=3)
    dval = jnp.concatenate(dval_parts, axis=1)
    dzero = np.zeros((n, m, cw // 2, lq), jax.dtypes.float0)
    dwy = jnp.zeros((n, m, cw // 2, lq), jnp.float32)
    return (dzero, dzero, dwy, dwy,
            np.zeros(idx_h.shape, jax.dtypes.float0), dw, dval)


_gather_op_v5s.defvjp(_gather_fwd_v5s, _gather_bwd_v5s)
