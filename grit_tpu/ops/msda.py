"""Multi-scale deformable attention (MSDA) for TPU.

This replaces the reference's only native component — the CUDA
``MultiScaleDeformableAttention`` extension (reference:
models/ops/src/cuda/ms_deform_im2col_cuda.cuh:238-299 forward im2col,
:302-921 backward variants) — with TPU-native formulations:

- ``ms_deform_attn_reference``: level-by-level jnp port of the documented
  semantics (reference python oracle: models/ops/functions/ms_deform_attn_func.py:41-61,
  i.e. ``F.grid_sample(align_corners=False, padding_mode='zeros')`` per level).
  Used as the test oracle.
- ``ms_deform_attn``: fused single-gather XLA formulation — all levels, points
  and bilinear corners collapse into ONE ``take_along_axis`` on a
  level-concatenated value tensor, followed by a weighted reduction.  XLA
  lowers this to a single gather + fused multiply-adds; gradients (scatter-add
  into value, analytic bilinear-weight grads into locations) come from autodiff,
  so no hand-written backward is needed — unlike the five CUDA col2im kernels.
- a Pallas kernel variant lives in ``grit_tpu.ops.msda_pallas`` and is selected
  via ``impl='pallas'``.

Shapes (reference: models/ops/modules/ms_deform_attn.py:80-89):
  value:               [N, S, M, D]   S = sum_l H_l * W_l
  spatial_shapes:      static list of L (H, W) ints (XLA shapes must be static)
  sampling_locations:  [N, Lq, M, L, P, 2], (x, y) normalized to [0, 1]
  attention_weights:   [N, Lq, M, L, P], softmax-normalized over L*P
  output:              [N, Lq, M*D]  (head-major channel concat)
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def level_start_index(spatial_shapes: Sequence[tuple[int, int]]) -> list[int]:
    starts, acc = [], 0
    for h, w in spatial_shapes:
        starts.append(acc)
        acc += h * w
    return starts


def _bilinear_corners(px, py, h, w):
    """Corner indices, weights and validity for zero-padded bilinear sampling.

    px, py: pixel-space coords (already ``loc * size - 0.5``), any shape.
    Returns (ix, iy, weight, valid) each of shape [..., 4] ordered
    (top-left, top-right, bottom-left, bottom-right).
    """
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    lx = px - x0
    ly = py - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    ix = jnp.stack([x0i, x0i + 1, x0i, x0i + 1], axis=-1)
    iy = jnp.stack([y0i, y0i, y0i + 1, y0i + 1], axis=-1)
    wx = jnp.stack([1 - lx, lx, 1 - lx, lx], axis=-1)
    wy = jnp.stack([1 - ly, 1 - ly, ly, ly], axis=-1)
    valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    return ix, iy, wx * wy, valid


def ms_deform_attn_reference(
    value: jnp.ndarray,
    spatial_shapes: Sequence[tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Readable per-level implementation; the parity/test oracle."""
    n, s, m, d = value.shape
    _, lq, _, nlvl, npts, _ = sampling_locations.shape
    starts = level_start_index(spatial_shapes)

    out = jnp.zeros((n, lq, m, d), value.dtype)
    for lid, (h, w) in enumerate(spatial_shapes):
        val_l = jax.lax.dynamic_slice_in_dim(value, starts[lid], h * w, axis=1)
        val_l = val_l.reshape(n, h, w, m, d)
        loc = sampling_locations[:, :, :, lid]  # [N, Lq, M, P, 2]
        px = loc[..., 0] * w - 0.5
        py = loc[..., 1] * h - 0.5
        ix, iy, wgt, valid = _bilinear_corners(px, py, h, w)  # [N, Lq, M, P, 4]
        ixc = jnp.clip(ix, 0, w - 1)
        iyc = jnp.clip(iy, 0, h - 1)
        # gather each corner: val_l[n, iy, ix, m, :]
        n_idx = jnp.arange(n)[:, None, None, None, None]
        m_idx = jnp.arange(m)[None, None, :, None, None]
        sampled = val_l[n_idx, iyc, ixc, m_idx]  # [N, Lq, M, P, 4, D]
        wgt = jnp.where(valid, wgt, 0.0)
        interp = (sampled * wgt[..., None]).sum(-2)  # [N, Lq, M, P, D]
        aw = attention_weights[:, :, :, lid][..., None]  # [N, Lq, M, P, 1]
        out = out + (interp * aw).sum(3)
    return out.reshape(n, lq, m * d)


@partial(jax.jit, static_argnames=("spatial_shapes",))
def _msda_fused_xla(value, spatial_shapes, sampling_locations, attention_weights):
    n, s, m, d = value.shape
    _, lq, _, nlvl, npts, _ = sampling_locations.shape
    starts = level_start_index(spatial_shapes)

    hs = np.array([h for h, _ in spatial_shapes], np.float32)
    ws = np.array([w for _, w in spatial_shapes], np.float32)
    st = np.array(starts, np.int32)

    # pixel coords per level:  [N, Lq, M, L, P]
    px = sampling_locations[..., 0] * ws[None, None, None, :, None] - 0.5
    py = sampling_locations[..., 1] * hs[None, None, None, :, None] - 0.5
    ix, iy, wgt, valid = _bilinear_corners(
        px, py, hs[None, None, None, :, None, None], ws[None, None, None, :, None, None]
    )  # each [N, Lq, M, L, P, 4]
    ixc = jnp.clip(ix, 0, (ws - 1).astype(np.int32)[None, None, None, :, None, None])
    iyc = jnp.clip(iy, 0, (hs - 1).astype(np.int32)[None, None, None, :, None, None])
    flat = st[None, None, None, :, None, None] + iyc * ws.astype(np.int32)[
        None, None, None, :, None, None
    ] + ixc  # [N, Lq, M, L, P, 4] in [0, S)

    # combine bilinear weight, validity and attention weight BEFORE the gather
    # reduction: w_total[n,q,m,l,p,c] = attn[n,q,m,l,p] * bilin[n,q,m,l,p,c] * valid
    w_total = jnp.where(valid, wgt, 0.0) * attention_weights[..., None]

    # one gather: value_t [N, M, S, D], idx [N, M, K] with K = Lq*L*P*4
    k = lq * nlvl * npts * 4
    value_t = value.transpose(0, 2, 1, 3)  # [N, M, S, D]
    idx = flat.transpose(0, 2, 1, 3, 4, 5).reshape(n, m, k)  # [N, M, K]
    gathered = jnp.take_along_axis(value_t, idx[..., None], axis=2)  # [N, M, K, D]
    w = w_total.transpose(0, 2, 1, 3, 4, 5).reshape(n, m, k)  # [N, M, K]
    out = (gathered * w[..., None]).reshape(n, m, lq, nlvl * npts * 4, d).sum(3)
    return out.transpose(0, 2, 1, 3).reshape(n, lq, m * d).astype(value.dtype)


@partial(jax.jit, static_argnames=("spatial_shapes",))
def _msda_flat_gather(value, spatial_shapes, sampling_locations, attention_weights):
    """Single flat one-axis gather variant.

    Identical math to ``_msda_fused_xla`` but the (batch, head) dims are
    folded into a single global row index so XLA sees ONE rank-1 gather over
    a [N*M*S, D] table — a pattern the TPU backend lowers to its vectorized
    gather path, where the batched-gather form can serialize.
    """
    n, s, m, d = value.shape
    _, lq, _, nlvl, npts, _ = sampling_locations.shape

    hs = np.array([h for h, _ in spatial_shapes], np.float32)
    ws = np.array([w for _, w in spatial_shapes], np.float32)
    st = np.array(level_start_index(spatial_shapes), np.int32)

    px = sampling_locations[..., 0] * ws[None, None, None, :, None] - 0.5
    py = sampling_locations[..., 1] * hs[None, None, None, :, None] - 0.5
    ix, iy, wgt, valid = _bilinear_corners(
        px, py, hs[None, None, None, :, None, None], ws[None, None, None, :, None, None]
    )  # [N, Lq, M, L, P, 4]
    ixc = jnp.clip(ix, 0, (ws - 1).astype(np.int32)[None, None, None, :, None, None])
    iyc = jnp.clip(iy, 0, (hs - 1).astype(np.int32)[None, None, None, :, None, None])
    flat = st[None, None, None, :, None, None] + iyc * ws.astype(np.int32)[
        None, None, None, :, None, None
    ] + ixc  # [N, Lq, M, L, P, 4] in [0, S)
    w_total = jnp.where(valid, wgt, 0.0) * attention_weights[..., None]

    k = lq * nlvl * npts * 4
    # global row index: (n * M + m) * S + s
    nm_base = (
        jnp.arange(n, dtype=jnp.int32)[:, None] * m
        + jnp.arange(m, dtype=jnp.int32)[None, :]
    ) * s  # [N, M]
    idx = flat.transpose(0, 2, 1, 3, 4, 5).reshape(n, m, k) + nm_base[..., None]
    table = value.transpose(0, 2, 1, 3).reshape(n * m * s, d)
    gathered = jnp.take(table, idx.reshape(-1), axis=0)  # [N*M*K, D]
    w = w_total.transpose(0, 2, 1, 3, 4, 5).reshape(n * m * k)
    out = (gathered * w[:, None]).reshape(n, m, lq, nlvl * npts * 4, d).sum(3)
    return out.transpose(0, 2, 1, 3).reshape(n, lq, m * d).astype(value.dtype)


@partial(jax.jit, static_argnames=("spatial_shapes",))
def _msda_window_gather(value, spatial_shapes, sampling_locations, attention_weights):
    """Paired-column window gather.

    The two x-corners of a bilinear sample are ADJACENT columns, i.e.
    contiguous rows of the flattened [H*W, D] level map.  Gathering a
    (2, D) window per (y-corner, point) instead of 4 separate D-rows halves
    the gather count and doubles the contiguous transfer size — friendlier
    to the TPU gather unit.  Border handling: the fetched window start is
    ``clip(x0, 0, W-2)``; per fetched column the weight is re-derived by
    comparing against the true corner index (out-of-range corners get 0).
    """
    n, s, m, d = value.shape
    _, lq, _, nlvl, npts, _ = sampling_locations.shape

    hs = np.array([h for h, _ in spatial_shapes], np.float32)
    ws = np.array([w for _, w in spatial_shapes], np.float32)
    st = np.array(level_start_index(spatial_shapes), np.int32)
    lvl = lambda a: a[None, None, None, :, None]  # broadcast level constants

    px = sampling_locations[..., 0] * lvl(ws) - 0.5
    py = sampling_locations[..., 1] * lvl(hs) - 0.5
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    lx = px - x0
    ly = py - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    wi = ws.astype(np.int32)
    hi = hs.astype(np.int32)
    xs = jnp.clip(x0i, 0, lvl(wi - 2))  # fetched window start column
    # per fetched column c in {xs, xs+1}: weight = (1-lx) if c==x0 else lx if c==x0+1
    def col_weight(c):
        w_left = jnp.where((c == x0i) & (x0i >= 0), 1 - lx, 0.0)
        w_right = jnp.where((c == x0i + 1) & (x0i + 1 <= lvl(wi) - 1), lx, 0.0)
        return w_left + w_right

    wx = jnp.stack([col_weight(xs), col_weight(xs + 1)], -1)  # [..., 2]

    out = jnp.zeros((n, m, lq, d), jnp.float32)
    k = lq * nlvl * npts
    nm_base = (
        jnp.arange(n, dtype=jnp.int32)[:, None] * m
        + jnp.arange(m, dtype=jnp.int32)[None, :]
    ) * s  # [N, M]

    table = value.transpose(0, 2, 1, 3).reshape(n * m * s, d)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,),
        operand_batching_dims=(), start_indices_batching_dims=(),
    )

    for row, wy in ((y0i, 1 - ly), (y0i + 1, ly)):
        y_valid = (row >= 0) & (row < lvl(hi))
        rowc = jnp.clip(row, 0, lvl(hi - 1))
        flat = lvl(st) + rowc * lvl(wi) + xs  # [N, Lq, M, L, P]
        idx = flat.transpose(0, 2, 1, 3, 4).reshape(n, m, k) + nm_base[..., None]
        windows = jax.lax.gather(
            table, idx.reshape(-1, 1), dnums, slice_sizes=(2, d),
            mode=jax.lax.GatherScatterMode.CLIP,
        )  # [N*M*K, 2, D]
        w_cols = (
            (wx * (wy * y_valid.astype(wx.dtype) * attention_weights)[..., None])
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(n * m * k, 2)
        )
        contrib = (windows * w_cols[..., None].astype(windows.dtype)).sum(1)
        out = out + contrib.reshape(n, m, lq, nlvl * npts, d).sum(3)

    return out.transpose(0, 2, 1, 3).reshape(n, lq, m * d)


def ms_deform_attn_relaid(
    value: jnp.ndarray,
    spatial_shapes: Sequence[tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    num_heads: int,
    impl: str = "xla",
    real_hw: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """MSDA on a RELAID [N, S_pad, C] value slab -> [N, Lq, C].

    The hot-path entry used by the decoder layers: ``value`` stays in its
    natural post-projection layout, re-laid ONCE per forward by
    ``msda_pallas.relay_value`` (a no-op for level grids whose sizes are
    already multiples of 8, e.g. the production 384x640 pyramid) and hoisted
    out of the 6 per-layer calls.  ``impl='pallas'`` runs the v4 kernel
    directly on the slab; other impls un-relay and use the [N, S, M, D]
    formulations (the CPU/oracle paths).

    ``real_hw`` ([N, L, 2] int): with impl='pallas', padding is handled by
    zeroing corner weights against the per-level real rectangles — the
    caller then passes the UNMASKED value slab.  Other impls ignore it
    (their callers pre-mask the value as before).
    """
    spatial_shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    if impl == "pallas":
        from grit_tpu.ops.msda_pallas import ms_deform_attn_pallas_relaid

        return ms_deform_attn_pallas_relaid(
            value, spatial_shapes, sampling_locations, attention_weights,
            real_hw=real_hw,
        )
    from grit_tpu.ops.msda_pallas import unrelay_value

    n = value.shape[0]
    val = unrelay_value(value, spatial_shapes)
    val = val.reshape(n, val.shape[1], num_heads, val.shape[2] // num_heads)
    return ms_deform_attn(
        val, spatial_shapes, sampling_locations, attention_weights, impl=impl
    )


def ms_deform_attn(
    value: jnp.ndarray,
    spatial_shapes: Sequence[tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    impl: str = "xla",
) -> jnp.ndarray:
    """Multi-scale deformable attention core op (see module docstring)."""
    spatial_shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    if impl == "reference":
        return ms_deform_attn_reference(
            value, spatial_shapes, sampling_locations, attention_weights
        )
    if impl == "pallas":
        from grit_tpu.ops.msda_pallas import ms_deform_attn_pallas

        return ms_deform_attn_pallas(
            value, spatial_shapes, sampling_locations, attention_weights
        )
    if impl == "flat":
        return _msda_flat_gather(
            value, spatial_shapes, sampling_locations, attention_weights
        )
    if impl == "window":
        return _msda_window_gather(
            value, spatial_shapes, sampling_locations, attention_weights
        )
    return _msda_fused_xla(value, spatial_shapes, sampling_locations, attention_weights)
