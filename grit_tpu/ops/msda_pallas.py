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
    pad = max(w for _, w in spatial_shapes) + 2
    lead = -(-pad // 8) * 8  # head pad: v3's left-extended compare window
    starts, sizes = [], []
    off = lead
    for h, w in spatial_shapes:
        starts.append(off)
        sizes.append(h * w)
        off += -(-(h * w) // 8) * 8
    off += -(-pad // 8) * 8  # tail pad: v3's shifted slices stay in-bounds
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
