"""Fused window attention Pallas kernel for Swin (v2: block-diagonal head
packing).

Profiling the Swin tower on v5e (batch 64, 384x640) put the attention core —
QK^T + relative bias + shift mask + softmax + AV — at 151 ms of the 360 ms
backbone forward.  XLA materializes the per-window score tensors to HBM (up
to ~600M elements per stage-1 block), and the 144-wide key axis lane-pads to
256, so ~78% of that traffic is padding.  This kernel keeps scores in VMEM:

    out = softmax(q k^T * scale + rel_bias [+ shift_mask]) @ v

v1 of this kernel (see docs/NOTES.md) looped a fori_loop of per-(batch,head)
[N, d]x[d, N] dots and LOST to XLA (528 vs 466 ms e2e): with N=144, d=32 each
dot is MXU-hostile (32-deep contraction) and the per-iteration overhead over
~30k tiny units dominated.  v2 fixes the arithmetic shape instead of the
schedule:

**Block-diagonal head packing.**  For a group of g heads (g*d = 128, the MXU
contraction depth), tile the window's q [N, g*d] g times along rows and mask
row-block j to head j's d-slice.  One dot

    Q_bd [g*N, g*d] @ K^T [g*d, N]  ->  scores [g*N, N]

then yields EVERY head's [N, N] scores stacked along rows — the zero blocks
in Q_bd kill the cross-head terms.  The AV dot [g*N, N] @ V [N, g*d]
computes all-head values for each row-block; a mask+sum over the g row
blocks extracts the diagonal.  FLOPs inflate by g, but MXU utilization rises
by more than g (full 128-deep contraction, 4x the rows), so the dots run
FASTER than the "minimal" tiny ones — and the score tensor never leaves
VMEM.

Layout: qkv stay in the natural merged-head [B, nW, N, C] layout (head h =
lanes [h*d, (h+1)*d)) — no 5-D head-split transposes at all.  Grid =
(window_kind, head_group, batch_block) with batch fastest: the combined
[kind, g, N, N] bias block index is constant across the inner batch steps,
so Pallas DMAs each bias block exactly once.

Backward is a fused Pallas kernel too (``_bwd_kernel``): it recomputes the
softmax probabilities in VMEM (flash-style, nothing saved but qkv+bias) and
emits dQ/dK/dV with the same block-diagonal head-packing trick.

Replaces the reference's in-XLA-graph window attention
(models/common/swin_model.py:146-187); math parity with `_unfused` below.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale, g, d, bblk):
    """One (kind, head-group, batch-block) program.

    q/k/v/out refs: [bblk, 1, N, g*d]; bias ref: [1, g, N, N] fp32.
    """
    n = q_ref.shape[2]
    gd = g * d
    bias = bias_ref[0].reshape(g * n, n)  # row-block j = head j's [N, N] bias

    # row-block / lane-block masks for the block-diagonal packing
    row_blk = jax.lax.broadcasted_iota(jnp.int32, (g * n, gd), 0) // n
    col_blk = jax.lax.broadcasted_iota(jnp.int32, (g * n, gd), 1) // d
    qmask = row_blk == col_blk

    for i in range(bblk):  # static unroll; Mosaic pipelines across programs
        # pre-scale q once ([N, gd]) instead of scaling s ([g*N, N]) — g x
        # less VPU work (the scale distributes through the dot)
        q = (q_ref[i, 0].astype(jnp.float32) * scale).astype(q_ref.dtype)
        k = k_ref[i, 0]
        v = v_ref[i, 0]
        q_bd = jnp.where(
            qmask,
            jnp.broadcast_to(q[None], (g, n, gd)).reshape(g * n, gd),
            jnp.zeros((), q.dtype),
        )
        s = jax.lax.dot_general(
            q_bd, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [g*N, N] — per-head scores stacked along rows
        s = s + bias
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [g*N, g*d]; row-block j valid only in lane-block j
        # head j's output lives at (row-block j, lane-block j): static 2-D
        # diagonal slices (g tiny [N, d] copies) beat the masked full-tensor
        # reduction (3 passes over [g*N, gd]); plain slices — Mosaic cannot
        # lower >2-D vector reshapes on hardware
        o_merged = jnp.concatenate(
            [o[j * n:(j + 1) * n, j * d:(j + 1) * d] for j in range(g)], axis=-1
        )
        out_ref[i, 0] = o_merged.astype(out_ref.dtype)


def _wa_vmem_budget() -> int:
    """Per-program working-set budget the block/chunk pickers size against.

    ``GRIT_WA_VMEM_MB`` lifts every picker (gpp, MLP row caps, batch
    blocks, block-MLP fusability) AND the kernels' compiled vmem limit
    together — v5e has 128 MB physical VMEM, so bigger working sets trade
    double-buffer headroom for fewer, fatter programs.  13 targets
    Mosaic's 16 MB scoped-vmem default (the pre-r5 behavior, no explicit
    limit attached).  Default 26 by chip A/B (2026-08-21, paired windows):
    eval 397.8 vs 393.8 img/s, XE train 173.2 vs 193.4 ms/step sustained
    (+11.7%); 40 plateaus.  Read at trace time.
    """
    return int(float(os.environ.get("GRIT_WA_VMEM_MB", "26")) * (1 << 20))


def _wa_compiler_params():
    """Mosaic params for the window-attention kernel family.

    The explicit vmem limit exists to let A/B budgets ABOVE Mosaic's 16 MB
    scoped default compile (the s4 gpp=4 probe OOM'd against it); it must
    never sit BELOW the implicit allowance or it breaks kernels that
    already compile — the f32 stage-4 fused-MLP's stack allocation is
    32.5 MB and passed before any explicit limit was set (chip log
    2026-08-21).  96 MB matches the MSDA kernels' practice and leaves the
    v5e's 128 MB physical VMEM headroom for XLA's own buffers.
    """
    budget = _wa_vmem_budget()
    if budget <= 13 << 20:
        # default budget: DON'T attach an explicit limit — the chip A/B
        # measured the same 393.8 img/s but cold compile ballooned 154 ->
        # 1395 s with an explicit 96 MB limit on these kernels (the Mosaic
        # allocator's search space scales with the ceiling); the implicit
        # limits already admit every default-pick kernel.
        return None
    return pltpu.CompilerParams(
        vmem_limit_bytes=max(96 << 20, budget + (8 << 20)))


def _pick_bblk(b: int, n: int, gd: int, itemsize: int) -> int:
    """Largest batch block whose q/k/v/out VMEM blocks stay under budget.

    Bigger blocks amortize per-program overhead and the bias DMA; v5e has
    128 MB VMEM so a ~24 MB double-buffered budget is comfortable next to
    the [g*N, N] score intermediates.
    """
    per_image = 4 * n * max(gd, 128) * itemsize  # q, k, v, out (lane-padded)
    budget = max(10 << 20, _wa_vmem_budget() - (3 << 20))  # scoped limit also
    bblk = max(1, min(16, budget // (2 * per_image)))  # holds score temps
    while b % bblk:
        bblk -= 1
    return bblk


def _forward(q, k, v, bias, scale, num_heads):
    """q, k, v: [B, nW, N, C] merged-head; bias: [M, h, N, N] (M == nW or 1)."""
    b, nw, n, c = q.shape
    h = num_heads
    d = c // h
    m = bias.shape[0]
    g = max(1, min(h, 128 // max(d, 1)))
    while h % g:
        g -= 1
    gd = g * d

    bblk = _pick_bblk(b, n, gd, q.dtype.itemsize)
    kernel = functools.partial(_kernel, scale=scale, g=g, d=d, bblk=bblk)

    qkv_spec = pl.BlockSpec(
        (bblk, 1, n, gd),
        lambda w, hg, bb: (bb, w, 0, hg),
        memory_space=pltpu.VMEM,
    )
    bias_spec = pl.BlockSpec(
        (1, g, n, n),
        lambda w, hg, bb, _m=m: (w % _m, hg, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        kernel,
        grid=(nw, h // g, b // bblk),  # batch fastest -> bias DMA'd once/kind
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((b, nw, n, c), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * nw * g * h * n * n * d,
            bytes_accessed=(4 * q.size + m * h * n * n) * q.dtype.itemsize,
            transcendentals=b * nw * h * n * n,
        ),
        compiler_params=_wa_compiler_params(),
    )(q, k, v, bias.astype(jnp.float32))
    return out


def _bwd_kernel(
    q_ref, k_ref, v_ref, dout_ref, bias_ref,
    dq_ref, dk_ref, dv_ref, dbias_ref,
    *, scale, g, d, bblk,
):
    """Backward program for one (kind, head-group, batch-block).

    Recomputes P in VMEM, then (per image):
      dV   = contract(P,  dO_bd)   — block-diag dO lands per-head blocks
      dP   = dO_bd @ V^T
      dS   = P * (dP - rowsum(dP * P))
      dQ   = diag-extract((dS*scale) @ K)
      dK   = contract(dS*scale, Q_bd)
      dBias += dS (summed over the batch; per window kind)
    The contract-over-rows dots against a block-diagonal operand produce the
    per-head blocks directly — no extraction needed for dK/dV.
    """
    n = q_ref.shape[2]
    gd = g * d
    bias = bias_ref[0].reshape(g * n, n)
    row_blk = jax.lax.broadcasted_iota(jnp.int32, (g * n, gd), 0) // n
    col_blk = jax.lax.broadcasted_iota(jnp.int32, (g * n, gd), 1) // d
    qmask = row_blk == col_blk

    bb = pl.program_id(2)

    @pl.when(bb == 0)
    def _init():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    db_acc = jnp.zeros((g * n, n), jnp.float32)
    for i in range(bblk):
        q = q_ref[i, 0]
        k = k_ref[i, 0]
        v = v_ref[i, 0]
        do = dout_ref[i, 0]

        def bd(x):  # [N, gd] -> block-diagonal [g*N, gd]
            return jnp.where(
                qmask,
                jnp.broadcast_to(x[None], (g, n, gd)).reshape(g * n, gd),
                jnp.zeros((), x.dtype),
            )

        q_bd = bd(q)
        do_bd = bd(do)
        s = jax.lax.dot_general(
            q_bd, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + bias
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)          # [g*N, N]

        dv = jax.lax.dot_general(                            # [N, gd]
            p.astype(do_bd.dtype), do_bd, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(                            # [g*N, N]
            do_bd, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        db_acc = db_acc + ds
        ds_s = (ds * scale).astype(k.dtype)
        dq_bd = jax.lax.dot_general(                         # [g*N, gd]
            ds_s, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dq = jnp.where(qmask, dq_bd, 0.0).reshape(g, n, gd).sum(0)
        dk = jax.lax.dot_general(                            # [N, gd]
            ds_s, q_bd, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dq_ref[i, 0] = dq.astype(dq_ref.dtype)
        dk_ref[i, 0] = dk.astype(dk_ref.dtype)
        dv_ref[i, 0] = dv.astype(dv_ref.dtype)

    dbias_ref[...] = dbias_ref[...] + db_acc.reshape(1, g, n, n)


def _backward(q, k, v, bias, scale, num_heads, dout):
    b, nw, n, c = q.shape
    h = num_heads
    d = c // h
    m = bias.shape[0]
    g = max(1, min(h, 128 // max(d, 1)))
    while h % g:
        g -= 1
    gd = g * d

    bblk = _pick_bblk(b, n, gd, q.dtype.itemsize)
    kernel = functools.partial(_bwd_kernel, scale=scale, g=g, d=d, bblk=bblk)
    qkv_spec = pl.BlockSpec(
        (bblk, 1, n, gd),
        lambda w, hg, bb: (bb, w, 0, hg),
        memory_space=pltpu.VMEM,
    )
    bias_spec = pl.BlockSpec(
        (1, g, n, n),
        lambda w, hg, bb, _m=m: (w % _m, hg, 0, 0),
        memory_space=pltpu.VMEM,
    )
    dbias_spec = pl.BlockSpec(
        (1, g, n, n),
        lambda w, hg, bb: (w, hg, 0, 0),  # revisited across the inner bb steps
        memory_space=pltpu.VMEM,
    )
    dq, dk, dv, dbias_w = pl.pallas_call(
        kernel,
        grid=(nw, h // g, b // bblk),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, qkv_spec, bias_spec],
        out_specs=[qkv_spec, qkv_spec, qkv_spec, dbias_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, nw, n, c), q.dtype),
            jax.ShapeDtypeStruct((b, nw, n, c), k.dtype),
            jax.ShapeDtypeStruct((b, nw, n, c), v.dtype),
            jax.ShapeDtypeStruct((nw, h, n, n), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * b * nw * g * h * n * n * d,
            bytes_accessed=(8 * q.size + 2 * nw * h * n * n) * q.dtype.itemsize,
            transcendentals=b * nw * h * n * n,
        ),
        compiler_params=_wa_compiler_params(),
    )(q, k, v, dout, bias.astype(jnp.float32))
    if m == 1:
        dbias = dbias_w.sum(0, keepdims=True)
    else:
        dbias = dbias_w
    return dq, dk, dv, dbias.astype(bias.dtype)


def _unfused(q, k, v, bias, scale, num_heads):
    """Reference formulation on the merged-head layout (fp32 scores)."""
    b, nw, n, c = q.shape
    h = num_heads
    d = c // h

    def split(x):
        return x.reshape(b, nw, n, h, d)

    s = jnp.einsum(
        "bwqhd,bwkhd->bwhqk",
        split(q).astype(jnp.float32) * scale,
        split(k).astype(jnp.float32),
    )
    s = s + bias[None]  # [1, M, h, N, N] broadcasts over batch when M == nW
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    out = jnp.einsum("bwhqk,bwkhd->bwqhd", p, split(v))
    return out.reshape(b, nw, n, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_window_attention(q, k, v, bias, scale, num_heads):
    """softmax(q k^T * scale + bias[window kind]) @ v — fused on TPU.

    q, k, v: [B, nW, N, C] merged-head; bias: [M, h, N, N], M == nW or 1.
    """
    return _forward(q, k, v, bias, scale, num_heads)


def _fwd(q, k, v, bias, scale, num_heads):
    return _forward(q, k, v, bias, scale, num_heads), (q, k, v, bias)


def _bwd(scale, num_heads, res, gout):
    q, k, v, bias = res
    return _backward(q, k, v, bias, scale, num_heads, gout)


fused_window_attention.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Fused whole-block attention for the deterministic (eval) path:
#   qkv projection + window partition + attention + output projection +
#   window reverse in ONE kernel over the un-partitioned [B, Hp, Wp, C] map.
#
# The window partition/reverse transposes disappear into the BlockSpec DMA
# (a window IS a rectangular [win, win, C] tile of the feature map), and the
# 3C qkv tensor + the attention inputs/outputs never round-trip HBM.  Head
# groups are a grid dimension (fastest-varying) accumulating the per-group
# partial projections into an f32 VMEM scratch; the x block is DMA'd once
# per (batch-block, window) since its index is constant across groups.
# ---------------------------------------------------------------------------


def _block_kernel(
    x_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref,
    wp_ref, bp_ref, bias_ref, out_ref, *rest,
    scale, g, d, bblk, n_groups, win, save_attn, wide,
):
    """One (batch-block, window, head-group) program.

    x/out refs: [bblk, win, win, C]; w{q,k,v}: [C, g*d]; wp: [g*d, C];
    b{q,k,v}: [1, g*d]; bp: [1, C]; bias: [1, g, N, N] fp32 (tall) or the
    pre-rearranged [1, 1, N, g*N] (``wide`` — see the wide-layout comment
    above ``_step_kernel``); acc (scratch): [bblk, N, C] fp32 partial
    projection accumulator.
    With ``save_attn`` (the differentiating forward) an extra
    [bblk, 1, N, g*d] output receives the pre-projection per-head-group
    attention output — the backward needs it for the projection weight
    gradient, and emitting it here (it already lives in VMEM) is far
    cheaper than recomputing the whole attention pass.
    """
    if save_attn:
        o2_ref, acc_ref = rest
    else:
        (acc_ref,) = rest
    n = win * win
    c = x_ref.shape[5]  # block is [bblk, 1, win, 1, win, C]
    gd = g * d
    hg = pl.program_id(2)
    if wide:
        bias = bias_ref[0, 0]  # [N, g*N]
    else:
        bias = bias_ref[0].reshape(g * n, n)

    row_blk = jax.lax.broadcasted_iota(jnp.int32, (g * n, gd), 0) // n
    col_blk = jax.lax.broadcasted_iota(jnp.int32, (g * n, gd), 1) // d
    qmask = row_blk == col_blk

    for i in range(bblk):
        # [1, win, 1, win, C] block -> [win, win, C] -> [N, C] token merge
        # (both are pure views; Mosaic rejects >2-D vector reshapes only)
        xt = x_ref[i, 0, :, 0].reshape(n, c)

        def proj(w_ref_, b_ref_):
            y = jax.lax.dot_general(
                xt, w_ref_[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b_ref_[0][None, :]
            return y

        q = (proj(wq_ref, bq_ref) * scale).astype(xt.dtype)  # [N, gd]
        k = proj(wk_ref, bk_ref).astype(xt.dtype)
        v = proj(wv_ref, bv_ref).astype(xt.dtype)

        def bd(x_):  # [N, gd] -> block-diagonal [g*N, gd]
            return jnp.where(
                qmask,
                jnp.broadcast_to(x_[None], (g, n, gd)).reshape(g * n, gd),
                jnp.zeros((), x_.dtype),
            )

        if wide:
            s = jax.lax.dot_general(
                q, bd(k), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bias  # [N, g*N], column block j = head j's scores
            e = _wide_exp(s, g, n, v.dtype)
            o_un = jax.lax.dot_general(
                e, bd(v), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [N, gd] merged-head, unnormalized
            sums = jax.lax.dot_general(
                e, qmask.astype(v.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [N, gd]: column c = head (c//d)'s rowsum
            o_m = (o_un / sums).astype(xt.dtype)
        else:
            s = jax.lax.dot_general(
                bd(q), k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bias
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [g*N, gd]
            o_m = jnp.concatenate(
                [o[j * n:(j + 1) * n, j * d:(j + 1) * d] for j in range(g)],
                axis=-1,
            ).astype(xt.dtype)  # [N, gd]
        if save_attn:
            o2_ref[i, 0] = o_m
        part = jax.lax.dot_general(
            o_m, wp_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [N, C]

        @pl.when(hg == 0)
        def _init():
            acc_ref[i] = part

        @pl.when(hg > 0)
        def _acc():
            acc_ref[i] = acc_ref[i] + part

        @pl.when(hg == n_groups - 1)
        def _emit():
            out_ref[i, 0, :, 0] = (
                acc_ref[i] + bp_ref[0][None, :]
            ).astype(out_ref.dtype).reshape(win, win, c)


def _pick_block_bblk(b: int, n: int, c: int, itemsize: int) -> int:
    # x + out double-buffered (itemsize) + f32 scratch, per image
    per_image = n * c * (2 * 2 * itemsize + 4)
    budget = max(10 << 20, _wa_vmem_budget() - (3 << 20))
    bblk = max(1, min(16, budget // per_image))
    while b % bblk:
        bblk -= 1
    return bblk


def _block_forward(x, wqkv, bqkv, wproj, bproj, bias, scale, num_heads, window,
                   save_attn=False):
    b, hp, wp_, c = x.shape
    h = num_heads
    d = c // h
    n = window * window
    nwy, nwx = hp // window, wp_ // window
    nw = nwy * nwx
    m = bias.shape[0]

    g = max(1, min(h, 128 // max(d, 1)))
    while h % g:
        g -= 1
    gd = g * d
    n_groups = h // g

    wq, wk, wv = wqkv[:, :c], wqkv[:, c:2 * c], wqkv[:, 2 * c:]
    bq, bk, bv = bqkv[None, :c], bqkv[None, c:2 * c], bqkv[None, 2 * c:]

    wide = _WIDE and g > 1  # wide degenerates to tall when g == 1
    bblk = _pick_block_bblk(b, n, c, x.dtype.itemsize)
    kernel = functools.partial(
        _block_kernel, scale=scale, g=g, d=d, bblk=bblk,
        n_groups=n_groups, win=window, save_attn=save_attn, wide=wide,
    )

    # window tiles as blocks: split H/W into (n_windows, window) OUTSIDE (a
    # free view) so the block's last two dims are exact array dims — the
    # Pallas TPU (8, 128)-divisibility rule only binds the trailing two
    x6 = x.reshape(b, nwy, window, nwx, window, c)
    x_spec = pl.BlockSpec(
        (bblk, 1, window, 1, window, c),
        lambda bb, w, hg, _nwx=nwx: (bb, w // _nwx, 0, w % _nwx, 0, 0),
        memory_space=pltpu.VMEM,
    )
    wcol_spec = pl.BlockSpec(
        (c, gd), lambda bb, w, hg: (0, hg), memory_space=pltpu.VMEM)
    bcol_spec = pl.BlockSpec(
        (1, gd), lambda bb, w, hg: (0, hg), memory_space=pltpu.VMEM)
    wrow_spec = pl.BlockSpec(
        (gd, c), lambda bb, w, hg: (hg, 0), memory_space=pltpu.VMEM)
    bp_spec = pl.BlockSpec(
        (1, c), lambda bb, w, hg: (0, 0), memory_space=pltpu.VMEM)
    bias_f = bias.astype(jnp.float32)
    if wide:
        # [M, h, N, N] -> [M, n_groups, N, g*N]: per group, head j's scores
        # live in lane block j (column-blocked wide layout)
        bias_f = bias_f.reshape(m, n_groups, g, n, n).transpose(
            0, 1, 3, 2, 4).reshape(m, n_groups, n, g * n)
        bias_spec = pl.BlockSpec(
            (1, 1, n, g * n), lambda bb, w, hg, _m=m: (w % _m, hg, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        bias_spec = pl.BlockSpec(
            (1, g, n, n), lambda bb, w, hg, _m=m: (w % _m, hg, 0, 0),
            memory_space=pltpu.VMEM,
        )

    out_specs = x_spec
    out_shape = jax.ShapeDtypeStruct(x6.shape, x.dtype)
    if save_attn:
        o2_spec = pl.BlockSpec(
            (bblk, 1, n, gd), lambda bb, w, hg: (bb, w, 0, hg),
            memory_space=pltpu.VMEM,
        )
        out_specs = [x_spec, o2_spec]
        out_shape = [out_shape, jax.ShapeDtypeStruct((b, nw, n, c), x.dtype)]
    outs = pl.pallas_call(
        kernel,
        grid=(b // bblk, nw, n_groups),  # head groups fastest: x/out blocks
        in_specs=[x_spec, wcol_spec, wcol_spec, wcol_spec,  # stay resident,
                  bcol_spec, bcol_spec, bcol_spec,          # scratch accumulates
                  wrow_spec, bp_spec, bias_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((bblk, n, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * nw * n * (4 * c * c + 2 * g * (h // g) * n * d * 2),
            bytes_accessed=(2 * x.size + m * h * n * n * 4),
            transcendentals=b * nw * h * n * n,
        ),
        compiler_params=_wa_compiler_params(),
    )(x6, wq, wk, wv, bq, bk, bv, wproj, bproj[None], bias_f)
    if save_attn:
        out6, o_merged = outs
        return out6.reshape(b, hp, wp_, c), o_merged
    return outs.reshape(b, hp, wp_, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _block_attention(x, wqkv, bqkv, wproj, bproj, bias, scale, num_heads, window):
    return _block_forward(x, wqkv, bqkv, wproj, bproj, bias, scale, num_heads, window)


def _block_attention_fwd(x, wqkv, bqkv, wproj, bproj, bias, scale, num_heads, window):
    # the differentiating forward also emits the pre-projection attention
    # output (one extra DMA out of VMEM) so the backward need not recompute
    # the whole attention pass for the projection weight gradient
    out, o_merged = _block_forward(
        x, wqkv, bqkv, wproj, bproj, bias, scale, num_heads, window,
        save_attn=True,
    )
    return out, (x, wqkv, bqkv, wproj, bproj, bias, o_merged)


def _block_attention_bwd(scale, num_heads, window, res, dout):
    """Flash-style backward: nothing saved but the inputs.

    The projections (qkv, output) are recomputed/differentiated as big
    batched XLA matmuls — exactly the shapes XLA already runs at high MXU
    utilization — and the attention core (the part whose intermediates must
    never touch HBM) reuses the fused ``_backward`` Pallas kernel, with the
    probabilities recomputed in VMEM by one extra ``_forward`` pass for the
    output-projection weight gradient.
    """
    from grit_tpu.ops.window import window_partition, window_reverse

    x, wqkv, bqkv, wproj, bproj, bias, attn_out = res
    b, hp, wp_, c = x.shape
    nw = (hp // window) * (wp_ // window)
    n = window * window

    xw = window_partition(x, window).reshape(b, nw, n, c)
    qkv = (
        jax.lax.dot_general(
            xw, wqkv, (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bqkv
    ).astype(x.dtype)
    q, k, v = qkv[..., :c], qkv[..., c:2 * c], qkv[..., 2 * c:]

    dout_w = window_partition(dout, window).reshape(b, nw, n, c)

    ao2 = attn_out.reshape(-1, c)
    do2 = dout_w.reshape(-1, c)
    dwproj = jax.lax.dot_general(
        ao2, do2, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(wproj.dtype)
    dbproj = do2.astype(jnp.float32).sum(0).astype(bproj.dtype)
    d_ao = jax.lax.dot_general(
        do2, wproj, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(x.dtype).reshape(b, nw, n, c)

    dq, dk, dv, dbias = _backward(q, k, v, bias, scale, num_heads, d_ao)

    dqkv = jnp.concatenate([dq, dk, dv], axis=-1).reshape(-1, 3 * c)
    xw2 = xw.reshape(-1, c)
    dwqkv = jax.lax.dot_general(
        xw2, dqkv, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(wqkv.dtype)
    dbqkv = dqkv.astype(jnp.float32).sum(0).astype(bqkv.dtype)
    dxw = jax.lax.dot_general(
        dqkv, wqkv, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(x.dtype).reshape(b * nw, n, c)
    dx = window_reverse(dxw, window, hp, wp_)
    return dx, dwqkv, dbqkv, dwproj, dbproj, dbias


_block_attention.defvjp(_block_attention_fwd, _block_attention_bwd)


def fused_block_attention(
    x, wqkv, bqkv, wproj, bproj, bias, *, scale, num_heads, window,
):
    """x: [B, Hp, Wp, C] (LN'd, padded, pre-rolled when shifted);
    wqkv: [C, 3C]; bqkv: [3C]; wproj: [C, C]; bproj: [C];
    bias: [M, h, N, N] (M == nW or 1).  Returns the pre-residual projected
    attention output, position-aligned with ``x``.

    Differentiable: forward is one whole-block Pallas kernel; backward is a
    flash-style recompute (``_block_attention_bwd``) built on the fused
    attention backward kernel — training runs the same forward the eval
    path does.
    """
    return _block_attention(x, wqkv, bqkv, wproj, bproj, bias, scale, num_heads, window)


# ---------------------------------------------------------------------------
# Fused block STEP for the resident-padded-map pipeline:
#   LN1 + pad-token zeroing + qkv projection + window attention + output
#   projection + residual, in ONE kernel over the un-partitioned padded
#   [B, Hp, Wp, C] map.
#
# Rationale (round-3 trace, docs/NOTES.md): at b128 the eval step carried
# ~150 ms of per-block XLA formatting AROUND the round-2 whole-block kernel —
# LN1's f32 convert + two reduction passes + affine, jnp.pad/unpad every
# block, the residual add, and {3,0,2,1}<->row-major layout copies on every
# kernel boundary.  This kernel absorbs LN1 and the residual, and the caller
# keeps the map PADDED across the whole stage (pad once at stage entry,
# slice once at exit), so a non-shifted block is kernel->kernel with zero
# XLA ops in between.
#
# Padding parity: the reference (torch Swin, swin_model.py:108-187) pads
# AFTER norm1 with zeros, so padded KEY/VALUE tokens enter the projections
# as exact zeros (k_pad = b_k, v_pad = b_v).  With a resident padded map the
# pad rows hold stale residual garbage, so the kernel re-derives the pad
# mask from static geometry each block — (y + shift) mod Hp >= H_real in
# PRE-ROLL coordinates, handling the cyclic shift — zeroes those rows before
# the LN statistics AND after the affine, reproducing k_pad = b_k exactly.
# Pad-row OUTPUTS are don't-cares (stage exit slices them off; they are
# re-zeroed as keys every block), which is the one intentional divergence
# from the reference's (also discarded) pad-row outputs.
# ---------------------------------------------------------------------------


# The resident step kernel's attention core uses the WIDE score layout when
# the head group packs more than one head (g > 1).  Tall layout (scores
# [g*N, N], per-head rows stacked) lane-pads the N=144 key axis to 256 — 78%
# of every VPU softmax pass is padding, and the AV dot's K=144 contraction
# wastes an MXU pass.  Wide layout instead block-diagonalizes K and V:
#
#     S = q [N, gd] @ K_bd^T [gd, g*N]          (full-depth contraction)
#     E = exp(S + bias_wide - rowmax)           ([N, g*N]: 640 lanes, 11% pad)
#     O_un = E @ V_bd [g*N, gd]                 (merged [N, gd] directly)
#     sums = E @ qmask                          (per-head rowsums via MXU)
#     O = O_un / sums
#
# ~1.9x fewer VPU element-ops, no rowsum/divide over the score tensor, and
# no diagonal extraction.  The softmax shift is a PER-HEAD-BLOCK rowmax
# (_wide_exp) — exact per-head softmax at any cross-head score spread.
# _WIDE/_BAND are chip-A/B flags (docs/NOTES.md round 3); interpret-mode
# parity tests cover all four combinations' code paths.  Chip A/B
# (2026-08-19, b128 beam5): wide 258.5 vs tall 232.0 img/s; default ON
# (set GRIT_WA_WIDE=0 for the tall layout — on v5e that also requires
# GRIT_WA_ROLLFREE=0; the guard below _ROLLFREE enforces it for defaults).
_WIDE = os.environ.get("GRIT_WA_WIDE", "1") == "1"


def _wide_exp(s, g, n, dtype):
    """exp(s - rowmax) for the wide [N, g*N] score layout, with the rowmax
    taken PER HEAD BLOCK — the exact softmax shift.  (An earlier version
    used one cross-head rowmax with an exp(-60) clamp; that silently turns
    a weak head's attention uniform once the cross-head logit spread passes
    the clamp — per-head softmax is shift-invariant and never saturates, so
    the head-blocked max is both exact and clamp-free.)"""
    if g == 1:
        return jnp.exp(s - jnp.max(s, axis=-1, keepdims=True)).astype(dtype)
    parts = []
    for j in range(g):
        blk = s[:, j * n:(j + 1) * n]
        parts.append(jnp.exp(blk - jnp.max(blk, axis=-1, keepdims=True)))
    return jnp.concatenate(parts, axis=1).astype(dtype)


def _step_kernel(
    x_ref, lns_ref, lnb_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref,
    wp_ref, bp_ref, bias_ref, out_ref, *rest,
    scale, g, d, bblk, n_groups, win, save_attn, eps,
    real_h, real_w, hp, wp, nwx, shift, residual, wide,
):
    """One (batch-block, window, head-group) program of the fused block step.

    Refs as in ``_block_kernel`` plus lns/lnb: [1, C] f32 LayerNorm affine.
    Scratch: acc [bblk, N, C] f32 projection accumulator and xn [bblk, N, C]
    (compute dtype) holding the masked-LN output — computed once at head
    group 0 and reused by the other groups (grid iterates groups fastest).
    ``wide`` selects the wide-layout attention core (comment above); bias_ref
    is then the pre-rearranged [1, N, g*N] instead of [1, g, N, N].
    """
    if save_attn:
        o2_ref, acc_ref, xn_ref = rest
    else:
        acc_ref, xn_ref = rest
    n = win * win
    c = x_ref.shape[5]
    gd = g * d
    hg = pl.program_id(2)
    w_id = pl.program_id(1)
    wy = w_id // nwx
    wx = w_id % nwx
    if wide:
        bias = bias_ref[0, 0]  # [N, g*N]
    else:
        bias = bias_ref[0].reshape(g * n, n)

    row_blk = jax.lax.broadcasted_iota(jnp.int32, (g * n, gd), 0) // n
    col_blk = jax.lax.broadcasted_iota(jnp.int32, (g * n, gd), 1) // d
    qmask = row_blk == col_blk

    # pad-token mask in PRE-ROLL coordinates: token r of this window sits at
    # rolled (y, x) = (wy*win + r//win, wx*win + r%win); it came from original
    # ((y + shift) mod Hp, (x + shift) mod Wp), which is padding iff >= real
    r = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    y0 = wy * win + r // win
    x0 = wx * win + r % win
    if shift:
        y0 = jax.lax.rem(y0 + shift, hp)
        x0 = jax.lax.rem(x0 + shift, wp)
    tok_pad = jnp.logical_or(y0 >= real_h, x0 >= real_w)  # [N, 1]

    for i in range(bblk):
        xt_raw = x_ref[i, 0, :, 0].reshape(n, c)

        @pl.when(hg == 0)
        def _ln():
            xf = jnp.where(tok_pad, 0.0, xt_raw.astype(jnp.float32))
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
            xn = (xf - mu) * jax.lax.rsqrt(var + eps)
            xn = xn * lns_ref[0][None, :] + lnb_ref[0][None, :]
            # zero pad rows post-affine: padded keys/values must project to
            # bias-only, exactly as the reference's pad-after-LN zeros do
            xn_ref[i] = jnp.where(tok_pad, 0.0, xn).astype(xn_ref.dtype)

        xn = xn_ref[i]

        def proj(w_ref_, b_ref_):
            return jax.lax.dot_general(
                xn, w_ref_[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b_ref_[0][None, :]

        q = (proj(wq_ref, bq_ref) * scale).astype(xn.dtype)
        k = proj(wk_ref, bk_ref).astype(xn.dtype)
        v = proj(wv_ref, bv_ref).astype(xn.dtype)

        def bd(x_):  # [N, gd] -> block-diagonal [g*N, gd]
            return jnp.where(
                qmask,
                jnp.broadcast_to(x_[None], (g, n, gd)).reshape(g * n, gd),
                jnp.zeros((), x_.dtype),
            )

        if wide:
            s = jax.lax.dot_general(
                q, bd(k), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bias  # [N, g*N], column block j = head j's scores
            e = _wide_exp(s, g, n, v.dtype)
            o_un = jax.lax.dot_general(
                e, bd(v), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [N, gd] merged-head, unnormalized
            sums = jax.lax.dot_general(
                e, qmask.astype(v.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [N, gd]: column c = head (c//d)'s rowsum
            o_m = (o_un / sums).astype(xn.dtype)
        else:
            s = jax.lax.dot_general(
                bd(q), k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bias
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_m = jnp.concatenate(
                [o[j * n:(j + 1) * n, j * d:(j + 1) * d] for j in range(g)],
                axis=-1,
            ).astype(xn.dtype)
        if save_attn:
            o2_ref[i, 0] = o_m
        part = jax.lax.dot_general(
            o_m, wp_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(hg == 0)
        def _init():
            acc_ref[i] = part

        @pl.when(hg > 0)
        def _acc():
            acc_ref[i] = acc_ref[i] + part

        @pl.when(hg == n_groups - 1)
        def _emit():
            y = acc_ref[i] + bp_ref[0][None, :]
            if residual:
                y = y + jnp.where(tok_pad, 0.0, xt_raw.astype(jnp.float32))
            out_ref[i, 0, :, 0] = y.astype(out_ref.dtype).reshape(win, win, c)


def _step_forward(x, lns, lnb, wqkv, bqkv, wproj, bproj, bias,
                  scale, num_heads, window, real_hw, shift, residual,
                  eps, save_attn=False):
    b, hp, wp_, c = x.shape
    h = num_heads
    d = c // h
    n = window * window
    nwy, nwx = hp // window, wp_ // window
    nw = nwy * nwx
    m = bias.shape[0]

    g = max(1, min(h, 128 // max(d, 1)))
    while h % g:
        g -= 1
    gd = g * d
    n_groups = h // g

    wq, wk, wv = wqkv[:, :c], wqkv[:, c:2 * c], wqkv[:, 2 * c:]
    bq, bk, bv = bqkv[None, :c], bqkv[None, c:2 * c], bqkv[None, 2 * c:]

    wide = _WIDE and g > 1  # wide degenerates to tall when g == 1
    bblk = _pick_block_bblk(b, n, c, x.dtype.itemsize)
    kernel = functools.partial(
        _step_kernel, scale=scale, g=g, d=d, bblk=bblk,
        n_groups=n_groups, win=window, save_attn=save_attn, eps=eps,
        real_h=real_hw[0], real_w=real_hw[1], hp=hp, wp=wp_, nwx=nwx,
        shift=shift, residual=residual, wide=wide,
    )

    x6 = x.reshape(b, nwy, window, nwx, window, c)
    x_spec = pl.BlockSpec(
        (bblk, 1, window, 1, window, c),
        lambda bb, w, hg, _nwx=nwx: (bb, w // _nwx, 0, w % _nwx, 0, 0),
        memory_space=pltpu.VMEM,
    )
    ln_spec = pl.BlockSpec((1, c), lambda bb, w, hg: (0, 0), memory_space=pltpu.VMEM)
    wcol_spec = pl.BlockSpec(
        (c, gd), lambda bb, w, hg: (0, hg), memory_space=pltpu.VMEM)
    bcol_spec = pl.BlockSpec(
        (1, gd), lambda bb, w, hg: (0, hg), memory_space=pltpu.VMEM)
    wrow_spec = pl.BlockSpec(
        (gd, c), lambda bb, w, hg: (hg, 0), memory_space=pltpu.VMEM)
    bp_spec = pl.BlockSpec(
        (1, c), lambda bb, w, hg: (0, 0), memory_space=pltpu.VMEM)
    bias_f = bias.astype(jnp.float32)
    if wide:
        # [M, h, N, N] -> [M, n_groups, N, g*N]: per group, head j's scores
        # live in lane block j (column-blocked wide layout)
        bias_f = bias_f.reshape(m, n_groups, g, n, n).transpose(
            0, 1, 3, 2, 4).reshape(m, n_groups, n, g * n)
        bias_spec = pl.BlockSpec(
            (1, 1, n, g * n), lambda bb, w, hg, _m=m: (w % _m, hg, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        bias_spec = pl.BlockSpec(
            (1, g, n, n), lambda bb, w, hg, _m=m: (w % _m, hg, 0, 0),
            memory_space=pltpu.VMEM,
        )

    out_specs = x_spec
    out_shape = jax.ShapeDtypeStruct(x6.shape, x.dtype)
    if save_attn:
        o2_spec = pl.BlockSpec(
            (bblk, 1, n, gd), lambda bb, w, hg: (bb, w, 0, hg),
            memory_space=pltpu.VMEM,
        )
        out_specs = [x_spec, o2_spec]
        out_shape = [out_shape, jax.ShapeDtypeStruct((b, nw, n, c), x.dtype)]
    outs = pl.pallas_call(
        kernel,
        grid=(b // bblk, nw, n_groups),
        in_specs=[x_spec, ln_spec, ln_spec,
                  wcol_spec, wcol_spec, wcol_spec,
                  bcol_spec, bcol_spec, bcol_spec,
                  wrow_spec, bp_spec, bias_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((bblk, n, c), jnp.float32),
            pltpu.VMEM((bblk, n, c), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * nw * n * (4 * c * c + 2 * g * (h // g) * n * d * 2),
            bytes_accessed=(2 * x.size + m * h * n * n * 4),
            transcendentals=b * nw * h * n * n,
        ),
        compiler_params=_wa_compiler_params(),
    )(x6, lns.astype(jnp.float32)[None], lnb.astype(jnp.float32)[None],
      wq, wk, wv, bq, bk, bv, wproj, bproj[None], bias_f)
    if save_attn:
        out6, o_merged = outs
        return out6.reshape(b, hp, wp_, c), o_merged
    return outs.reshape(b, hp, wp_, c)


# Band mode: one program per (image, window ROW, head group), block
# [1, win, Wp, C] of the natural 4-D map.  The 6-D windowed operand's
# T(8,128) tiling physically pads the win=12 sublane dim to 16, which makes
# every kernel entry/exit a full-map copy (trace: 1.9-3.9 ms per block at
# b128 stage 1); the band block's minor dims (Wp, C) are tile-aligned, so
# the operand shares the neighbors' layout and the copies vanish.  Windows
# are sliced from the band in VMEM (sublane shifts, no HBM).  Grid order
# puts the window row OUTERMOST so the per-row bias block (all nwx window
# kinds) is DMA'd nwy times per call, not per program.
# Chip A/B (2026-08-19, b128 beam5): band 248.9 vs 232.0 default; with the
# wide layout 279.6 vs 258.5 — default ON (GRIT_WA_BAND=0 opts out).
_BAND = os.environ.get("GRIT_WA_BAND", "1") == "1"
# Roll-free shifted blocks (requires _BAND): the band kernel absorbs the
# cyclic shift on its READ side — two half-window-row refs at a static block
# offset assemble the shifted band, and an in-VMEM lane rotate handles the
# column shift — while the output is written in the block's own
# window-aligned coordinates.  The resident map's storage convention then
# FOLLOWS each block's shift (see fused_block_step storage_shift), and the
# per-shifted-block jnp.roll pairs (~12 ms/step at b128, docs/NOTES.md
# round-3 glue hunt item 4) collapse to one roll at stage exit.
# Chip A/B (2026-08-19): wide+band+rollfree 292.8 img/s vs wide+band 279.6
# — default ON.  NOTE: rollfree with the TALL score layout VMEM-OOMs at
# stage 1 on v5e (the assemble temps + the 44%-padded score tensor exceed
# the 16 MB scoped limit); the wide layout's smaller scores fit.  Setting
# GRIT_WA_WIDE=0 therefore requires GRIT_WA_ROLLFREE=0 too.
_ROLLFREE = os.environ.get("GRIT_WA_ROLLFREE", "1") == "1"
if _ROLLFREE and not _WIDE and "GRIT_WA_ROLLFREE" not in os.environ:
    # GRIT_WA_WIDE=0 alone must not inherit the rollfree default: the tall
    # score layout + the rollfree assemble temps exceed v5e's 16 MB VMEM
    # scope at stage 1 (ADVICE r3).  An EXPLICIT GRIT_WA_ROLLFREE=1 with
    # WIDE=0 is left alone (larger-VMEM chips), just warned about.
    _ROLLFREE = False
elif _ROLLFREE and not _WIDE:
    import warnings

    warnings.warn(
        "GRIT_WA_ROLLFREE=1 with GRIT_WA_WIDE=0 (tall score layout) exceeds "
        "the 16 MB VMEM scope at Swin stage 1 on v5e-class chips; expect a "
        "Mosaic OOM there (docs/FLAGS.md).",
        stacklevel=1,
    )


def rollfree_enabled() -> bool:
    """True when the resident Swin pipeline should run roll-free shifted
    blocks (band kernels reading at a storage offset instead of jnp.roll)."""
    return _BAND and _ROLLFREE


def _band_kernel(
    x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref,
    wp_ref, bp_ref, bias_ref, *rest,
    scale, g, d, n_groups, gpp, win, nwx, m, save_attn, eps,
    real_h, real_w, hp, wp, shift, residual, wide, delta_c=0,
    with_mlp=False,
):
    """One (window-row, image, head-group-CHUNK) program of the fused step.

    ``gpp`` head groups are processed per program (r5: the old one-group
    grid re-DMA'd the qkv/proj columns and the f32 bias block every single
    program — hg was the innermost grid axis — which at stage 3 was ~1.9 GB
    of weight traffic per block-attention vs a 0.3 GB floor; with all
    groups in one program the weight/bias block indices are constant and
    Mosaic fetches them once, and each band row is read once instead of
    ``n_groups`` times).

    x/out refs: [1, win, Wp, C]; wqkv_ref: [1, C, 3*gpp*g*d] with per-chunk
    column layout [q | k | v]; bias_ref: [1, nwx|1, gpp, N, g*N] (wide) or
    [1, nwx|1, gpp*g, N, N] (tall); scratch acc/xn: [win, Wp, C].

    Roll-free mode (``delta_c`` != 0): the band's rows arrive as TWO
    half-window refs [1, win//2, Wp, C] (x_ref is that pair) fetched at a
    static half-block offset from the storage map, and the columns are
    rotated by ``delta_c`` in VMEM — together they materialize the band in
    the block's own window-aligned coordinates without any HBM roll.
    """
    rollfree = delta_c != 0
    if rollfree:
        x_top_ref, x_bot_ref = x_ref
    rest = list(rest)
    if with_mlp:
        # MLP tail refs (whole-block residency): LN2 scale/bias, fc1, fc2
        lns2_ref, lnb2_ref, w1_ref, b1_ref, w2_ref, b2_ref = rest[:6]
        del rest[:6]
    out_ref = rest.pop(0)
    if save_attn:
        o2_ref, acc_ref, xn_ref = rest
    else:
        acc_ref, xn_ref = rest
    n = win * win
    c = (x_top_ref if rollfree else x_ref).shape[3]
    gd = g * d
    gpd = gpp * gd
    n_chunks = n_groups // gpp
    wy = pl.program_id(0)
    hg = pl.program_id(2)

    def _assemble():
        """Raw band in compute (window-aligned) coordinates."""
        if not rollfree:
            return x_ref[0]
        rows = jnp.concatenate([x_top_ref[0], x_bot_ref[0]], axis=0)
        if delta_c % wp != 0:  # static; wp == identity (rows-only offset)
            rows = jnp.concatenate(
                [rows[:, delta_c:], rows[:, :delta_c]], axis=1)
        return rows

    row_blk = jax.lax.broadcasted_iota(jnp.int32, (g * n, gd), 0) // n
    col_blk = jax.lax.broadcasted_iota(jnp.int32, (g * n, gd), 1) // d
    qmask = row_blk == col_blk

    # band pad mask in PRE-ROLL coordinates (see _step_kernel).  Iotas are
    # born 3-D: Mosaic can only insert a minor dim on 32-bit vectors, so a
    # [:, :, None] on the i1 compare result fails to compile on real TPU.
    iy = jax.lax.broadcasted_iota(jnp.int32, (win, wp, 1), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (win, wp, 1), 1)
    y0 = wy * win + iy
    x0 = ix
    if shift:
        y0 = jax.lax.rem(y0 + shift, hp)
        x0 = jax.lax.rem(x0 + shift, wp)
    band_pad = jnp.logical_or(y0 >= real_h, x0 >= real_w)

    @pl.when(hg == 0)
    def _ln():
        xf = jnp.where(band_pad, 0.0, _assemble().astype(jnp.float32))
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
        xn = (xf - mu) * jax.lax.rsqrt(var + eps)
        xn = xn * lns_ref[0][None, None, :] + lnb_ref[0][None, None, :]
        xn_ref[...] = jnp.where(band_pad, 0.0, xn).astype(xn_ref.dtype)

    # q/k/v projections stay PER WINDOW.  Hoisting them to one whole-band
    # dot each ([win*Wp, C] @ [C, g*d]) looked like an MXU win on paper
    # (one deep dot vs nwx row-tile-padded fragments) but measured 279.6
    # vs 292.9 img/s e2e on v5e (2026-08-19 A/B): the full-band q/k/v
    # temporaries must stay live across the whole window loop, while the
    # per-window dots feed attention producer-consumer and pipeline with
    # it.  Same genus as the fused-Adam/one-hot-gather lessons.
    # Within a window the chunk's gpp head groups run off ONE merged qkv
    # dot (output columns are independent — bit-identical to split dots,
    # the GRIT_DECODE_MERGED_PROJ argument) and their outputs feed one
    # full-width projection dot.
    parts = []
    for wx in range(nwx):
        xw = xn_ref[:, wx * win:(wx + 1) * win, :].reshape(n, c)

        qkv = jax.lax.dot_general(
            xw, wqkv_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bqkv_ref[0, 0][None, :]

        def bd(x_):
            return jnp.where(
                qmask,
                jnp.broadcast_to(x_[None], (g, n, gd)).reshape(g * n, gd),
                jnp.zeros((), x_.dtype),
            )

        kx = wx if m > 1 else 0
        outs = []
        for j in range(gpp):
            q = (qkv[:, j * gd:(j + 1) * gd] * scale).astype(xn_ref.dtype)
            k = qkv[:, (gpp + j) * gd:(gpp + j + 1) * gd].astype(xn_ref.dtype)
            v = qkv[:, (2 * gpp + j) * gd:(2 * gpp + j + 1) * gd].astype(
                xn_ref.dtype)
            if wide:
                bias = bias_ref[0, kx, j]  # [N, g*N]
                s = jax.lax.dot_general(
                    q, bd(k), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + bias
                e = _wide_exp(s, g, n, v.dtype)
                o_un = jax.lax.dot_general(
                    e, bd(v), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                sums = jax.lax.dot_general(
                    e, qmask.astype(v.dtype), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                o_m = (o_un / sums).astype(xn_ref.dtype)
            else:
                bias = bias_ref[0, kx, j * g:(j + 1) * g].reshape(g * n, n)
                s = jax.lax.dot_general(
                    bd(q), k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + bias
                s = s - jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s)
                p = p / jnp.sum(p, axis=-1, keepdims=True)
                o = jax.lax.dot_general(
                    p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                o_m = jnp.concatenate(
                    [o[jj * n:(jj + 1) * n, jj * d:(jj + 1) * d]
                     for jj in range(g)],
                    axis=-1,
                ).astype(xn_ref.dtype)
            outs.append(o_m)
        o_cat = outs[0] if gpp == 1 else jnp.concatenate(outs, axis=-1)
        if save_attn:
            o2_ref[0, wx] = o_cat
        part = jax.lax.dot_general(
            o_cat, wp_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        parts.append(part.reshape(win, win, c))

    band = jnp.concatenate(parts, axis=1) if nwx > 1 else parts[0]

    @pl.when(hg == 0)
    def _init():
        acc_ref[...] = band

    @pl.when(hg > 0)
    def _acc():
        acc_ref[...] = acc_ref[...] + band

    @pl.when(hg == n_chunks - 1)
    def _emit():
        y = acc_ref[...] + bp_ref[0][None, None, :]
        if residual:
            y = y + jnp.where(band_pad, 0.0, _assemble().astype(jnp.float32))
        if not with_mlp:
            out_ref[0] = y.astype(out_ref.dtype)
            return
        # Whole-block residency: the MLP half-block (LN2 + fc1 + GELU + fc2
        # + residual) runs on the attention output while it is still in
        # VMEM — one HBM round trip per Swin block instead of two, and the
        # MLP's MXU dots can overlap this program's VPU-heavy softmaxes.
        # Dtype semantics REPRODUCE the separate-kernel path bit-for-bit:
        # the attention output is cast to the storage dtype first (that is
        # what the separate fused_mlp read from HBM), LN/GELU follow
        # _mlp_kernel exactly, and the residual adds in f32.
        rows_t = win * wp
        yb = y.astype(out_ref.dtype).reshape(rows_t, c)
        sub = rows_t
        hid = w1_ref.shape[1]
        # sub-block the rows so the f32 GELU intermediate stays ~<= 2 MB
        while sub > 256 and sub * hid * 4 > 2 * 1024 * 1024:
            sub //= 2
        while rows_t % sub:
            sub -= 1
        outs_rows = []
        for r0 in range(0, rows_t, sub):
            xr = yb[r0:r0 + sub]
            xn2 = _ln_rows(xr, lns2_ref[0], lnb2_ref[0], eps)
            hmid = jax.lax.dot_general(
                xn2, w1_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b1_ref[0][None, :]
            hmid = _gelu(hmid, jnp.dtype(out_ref.dtype)).astype(out_ref.dtype)
            yr = jax.lax.dot_general(
                hmid, w2_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b2_ref[0][None, :]
            outs_rows.append(
                (xr.astype(jnp.float32) + yr).astype(out_ref.dtype))
        rows_out = (jnp.concatenate(outs_rows, 0) if len(outs_rows) > 1
                    else outs_rows[0])
        out_ref[0] = rows_out.reshape(win, wp, c)


def _pick_gpp(n_groups, gd, c, n, nwx, win, wp_, kb, g, wide, itemsize):
    """Head-group chunks per program: the largest divisor of ``n_groups``
    whose VMEM footprint fits the budget.  Bigger is better — at gpp ==
    n_groups the weight/bias block indices are grid-constant (fetched once)
    and each band row is read once.  ``GRIT_WA_GPP`` pins a value for chip
    A/Bs (clamped to a divisor)."""
    forced = int(os.environ.get("GRIT_WA_GPP", "0"))
    budget = _wa_vmem_budget()

    def fits(gpp):
        gpd = gpp * gd
        n_chunks = n_groups // gpp
        dbl = 2 if n_chunks > 1 else 1  # changing blocks get double-buffered
        est = 0
        est += 2 * win * wp_ * c * itemsize * 2     # x in + out, double-buffered
        est += win * wp_ * c * (itemsize + 4)       # xn scratch + f32 acc
        est += dbl * (c * 3 * gpd + gpd * c) * itemsize   # wqkv chunk + proj rows
        bias_elems = kb * gpp * n * (g * n)         # same count wide or tall
        est += dbl * bias_elems * 4
        est += n * 3 * gpd * 4                      # f32 qkv temp
        est += n * g * n * (4 + itemsize) * 2       # scores f32 + e, slack x2
        return est <= budget

    cands = [v for v in range(n_groups, 0, -1) if n_groups % v == 0]
    if forced:
        for v in cands:
            if v <= forced:
                return v
        return 1
    for v in cands:
        if fits(v):
            return v
    return 1


def _step_forward_band(x, lns, lnb, wqkv, bqkv, wproj, bproj, bias,
                       scale, num_heads, window, real_hw, shift, residual,
                       eps, save_attn=False, storage_shift=0, mlp=None):
    b, hp, wp_, c = x.shape
    h = num_heads
    d = c // h
    n = window * window
    nwy, nwx = hp // window, wp_ // window
    nw = nwy * nwx
    m = bias.shape[0]

    g = max(1, min(h, 128 // max(d, 1)))
    while h % g:
        g -= 1
    gd = g * d
    n_groups = h // g
    wide = _WIDE and g > 1

    # roll-free read offset: the input map is stored rolled by storage_shift
    # (storage[y, x] = unrolled[(y+ss) % Hp, (x+ss) % Wp]); this block's
    # window-aligned compute coords are rolled by ``shift``, so the read
    # offset is delta = shift - storage_shift (mod the map extents)
    delta_r = (shift - storage_shift) % hp
    delta_c = (shift - storage_shift) % wp_
    rollfree = delta_r != 0 or delta_c != 0
    if rollfree:
        s_half = window // 2
        assert s_half > 0 and delta_r % s_half == 0 and hp % s_half == 0, (
            "roll-free band needs half-window-divisible offsets")
        n_half = hp // s_half
        k_off = delta_r // s_half

    # kb window-kinds per bias block (needed by the gpp VMEM model)
    kb_pick = nwx if m > 1 else 1
    gpp = _pick_gpp(n_groups, gd, c, n, nwx, window, wp_, kb_pick, g, wide,
                    x.dtype.itemsize)
    gpd = gpp * gd
    n_chunks = n_groups // gpp

    # per-chunk column layout [q | k | v]: chunk j's q columns are
    # wqkv[:, j*gpd:(j+1)*gpd] etc. — reshape groups the columns
    # contiguously, so this is a pure relayout of the same weights
    wq, wk, wv = wqkv[:, :c], wqkv[:, c:2 * c], wqkv[:, 2 * c:]
    wqkv_c = jnp.concatenate(
        [wq.reshape(c, n_chunks, gpd), wk.reshape(c, n_chunks, gpd),
         wv.reshape(c, n_chunks, gpd)], axis=2,
    ).transpose(1, 0, 2)  # [n_chunks, C, 3*gpd]
    bq, bk, bv = bqkv[:c], bqkv[c:2 * c], bqkv[2 * c:]
    bqkv_c = jnp.concatenate(
        [bq.reshape(n_chunks, gpd), bk.reshape(n_chunks, gpd),
         bv.reshape(n_chunks, gpd)], axis=1,
    )[:, None, :]  # [n_chunks, 1, 3*gpd]

    if mlp is not None:
        assert n_chunks == 1, "whole-block MLP fusion needs all groups resident"
        assert not save_attn
    base_kernel = functools.partial(
        _band_kernel, scale=scale, g=g, d=d, n_groups=n_groups, gpp=gpp,
        win=window, nwx=nwx, m=m, save_attn=save_attn, eps=eps,
        real_h=real_hw[0], real_w=real_hw[1], hp=hp, wp=wp_,
        shift=shift, residual=residual, wide=wide,
        # delta_c == wp_ is the identity rotation but still flags the
        # roll-free ref unpacking when only the rows are offset
        delta_c=(delta_c or wp_) if rollfree else 0,
        with_mlp=mlp is not None,
    )

    if rollfree:
        def kernel(x_top, x_bot, *rest):
            return base_kernel((x_top, x_bot), *rest)
    else:
        kernel = base_kernel
    # bias block's window-kind count: per-window kinds when the bias is
    # per-window (m == nw), one shared kind otherwise
    kb = nwx if m > 1 else 1

    x_spec = pl.BlockSpec(
        (1, window, wp_, c), lambda wy, bb, hg: (bb, wy, 0, 0),
        memory_space=pltpu.VMEM,
    )
    ln_spec = pl.BlockSpec((1, c), lambda wy, bb, hg: (0, 0), memory_space=pltpu.VMEM)
    wqkv_spec = pl.BlockSpec(
        (1, c, 3 * gpd), lambda wy, bb, hg: (hg, 0, 0), memory_space=pltpu.VMEM)
    bqkv_spec = pl.BlockSpec(
        (1, 1, 3 * gpd), lambda wy, bb, hg: (hg, 0, 0), memory_space=pltpu.VMEM)
    wrow_spec = pl.BlockSpec(
        (gpd, c), lambda wy, bb, hg: (hg, 0), memory_space=pltpu.VMEM)
    bp_spec = pl.BlockSpec(
        (1, c), lambda wy, bb, hg: (0, 0), memory_space=pltpu.VMEM)

    bias_f = bias.astype(jnp.float32)
    if wide:
        # [M, h, N, N] -> [nwy|1, nwx|1, n_groups, N, g*N]
        bias_f = bias_f.reshape(m, n_groups, g, n, n).transpose(
            0, 1, 3, 2, 4).reshape(m, n_groups, n, g * n)
        if m > 1:
            bias_f = bias_f.reshape(nwy, nwx, n_groups, n, g * n)
        else:
            bias_f = bias_f.reshape(1, 1, n_groups, n, g * n)
        bias_spec = pl.BlockSpec(
            (1, kb, gpp, n, g * n),
            lambda wy, bb, hg, _m=m: (wy if _m > 1 else 0, 0, hg, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        if m > 1:
            bias_f = bias_f.reshape(nwy, nwx, h, n, n)
        else:
            bias_f = bias_f.reshape(1, 1, h, n, n)
        bias_spec = pl.BlockSpec(
            (1, kb, gpp * g, n, n),
            lambda wy, bb, hg, _m=m: (wy if _m > 1 else 0, 0, hg, 0, 0),
            memory_space=pltpu.VMEM,
        )

    if rollfree:
        # the storage map read in half-window-row blocks: band wy's rows
        # live at half-blocks (2*wy + k_off) and (2*wy + k_off + 1),
        # cyclically (the output spec stays x_spec: written in this block's
        # own window-aligned coordinates)
        x_top_spec = pl.BlockSpec(
            (1, s_half, wp_, c),
            lambda wy, bb, hg, _k=k_off, _n=n_half: (
                bb, (2 * wy + _k) % _n, 0, 0),
            memory_space=pltpu.VMEM,
        )
        x_bot_spec = pl.BlockSpec(
            (1, s_half, wp_, c),
            lambda wy, bb, hg, _k=k_off, _n=n_half: (
                bb, (2 * wy + _k + 1) % _n, 0, 0),
            memory_space=pltpu.VMEM,
        )
        x_in_specs = [x_top_spec, x_bot_spec]
        x_operands = (x, x)
    else:
        x_in_specs = [x_spec]
        x_operands = (x,)

    out_specs = x_spec
    out_shape = jax.ShapeDtypeStruct(x.shape, x.dtype)
    if save_attn:
        o2_spec = pl.BlockSpec(
            (1, nwx, n, gpd), lambda wy, bb, hg: (bb, wy, 0, hg),
            memory_space=pltpu.VMEM,
        )
        out_specs = [x_spec, o2_spec]
        out_shape = [out_shape, jax.ShapeDtypeStruct((b, nw, n, c), x.dtype)]
    mlp_specs: list = []
    mlp_operands: tuple = ()
    if mlp is not None:
        lns2, lnb2, w1, b1, w2, b2 = mlp
        hid = w1.shape[1]
        whole = lambda a: pl.BlockSpec(  # noqa: E731
            a.shape, (lambda wy, bb, hg: (0,) * a.ndim), memory_space=pltpu.VMEM)
        mlp_operands = (
            lns2.astype(jnp.float32)[None], lnb2.astype(jnp.float32)[None],
            w1, b1[None], w2, b2[None],
        )
        mlp_specs = [whole(a) for a in mlp_operands]
    outs = pl.pallas_call(
        kernel,
        grid=(nwy, b, n_chunks),  # window row outermost: bias DMA'd per row
        in_specs=x_in_specs + [ln_spec, ln_spec,
                               wqkv_spec, bqkv_spec,
                               wrow_spec, bp_spec, bias_spec] + mlp_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((window, wp_, c), jnp.float32),
            pltpu.VMEM((window, wp_, c), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * nw * n * (4 * c * c + 2 * g * (h // g) * n * d * 2)
            + (4 * b * hp * wp_ * c * mlp[2].shape[1] if mlp is not None else 0),
            bytes_accessed=(2 * x.size + m * h * n * n * 4),
            transcendentals=b * nw * h * n * n
            + (b * hp * wp_ * mlp[2].shape[1] if mlp is not None else 0),
        ),
        compiler_params=_wa_compiler_params(),
    )(*x_operands, lns.astype(jnp.float32)[None],
      lnb.astype(jnp.float32)[None],
      wqkv_c, bqkv_c, wproj, bproj[None], bias_f, *mlp_operands)
    if save_attn:
        return outs[0], outs[1]
    return outs


def _pad_mask(hp, wp_, real_hw, shift):
    """[1, Hp, Wp, 1] bool — True on tokens that are padding in pre-roll
    coordinates (numpy constant, baked at trace time)."""
    import numpy as np

    y = (np.arange(hp) + shift) % hp
    x = (np.arange(wp_) + shift) % wp_
    m = (y[:, None] >= real_hw[0]) | (x[None, :] >= real_hw[1])
    return jnp.asarray(m[None, :, :, None])


def _step_prefix_ref(x, lns, lnb, pad4, eps):
    """Masked LN1 with the kernel's dtype semantics (f32 stats, fast
    variance) — the recompute target for the backward pass."""
    xf = jnp.where(pad4, 0.0, x.astype(jnp.float32))
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    xn = (xf - mu) * jax.lax.rsqrt(var + eps)
    xn = xn * lns.astype(jnp.float32) + lnb.astype(jnp.float32)
    return jnp.where(pad4, 0.0, xn).astype(x.dtype)


def _step_fwd_impl(x, lns, lnb, wqkv, bqkv, wproj, bproj, bias,
                   scale, num_heads, window, real_hw, shift, residual, eps,
                   save_attn=False, storage_shift=None):
    if storage_shift is None:
        storage_shift = shift
    args = (x, lns, lnb, wqkv, bqkv, wproj, bproj, bias,
            scale, num_heads, window, real_hw, shift, residual, eps)
    if _BAND:
        return _step_forward_band(*args, save_attn=save_attn,
                                  storage_shift=storage_shift)
    assert storage_shift == shift, (
        "roll-free storage offsets require the band kernel (GRIT_WA_BAND)")
    return _step_forward(*args, save_attn=save_attn)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(8, 9, 10, 11, 12, 13, 14, 15))
def _block_step(x, lns, lnb, wqkv, bqkv, wproj, bproj, bias,
                scale, num_heads, window, real_hw, shift, residual, eps,
                storage_shift):
    return _step_fwd_impl(x, lns, lnb, wqkv, bqkv, wproj, bproj, bias,
                          scale, num_heads, window, real_hw, shift, residual,
                          eps, storage_shift=storage_shift)


def _block_step_fwd(x, lns, lnb, wqkv, bqkv, wproj, bproj, bias,
                    scale, num_heads, window, real_hw, shift, residual, eps,
                    storage_shift):
    out, o_merged = _step_fwd_impl(
        x, lns, lnb, wqkv, bqkv, wproj, bproj, bias,
        scale, num_heads, window, real_hw, shift, residual, eps,
        save_attn=True, storage_shift=storage_shift,
    )
    return out, (x, lns, lnb, wqkv, bqkv, wproj, bproj, bias, o_merged)


def _block_step_bwd(scale, num_heads, window, real_hw, shift, residual, eps,
                    storage_shift, res, dout):
    """Flash-style backward: recompute the masked LN (XLA, with its vjp), the
    qkv projections (big MXU matmuls), and run the fused attention backward
    kernel; the saved pre-projection attention output supplies the output
    projection's weight grad without an attention recompute.

    With ``storage_shift`` (roll-free forward), the saved x is in storage
    coordinates while everything else (o_merged, dout, the math below) lives
    in the block's window-aligned compute coordinates — roll x in, roll dx
    back out.  The backward only runs in training, where the one XLA roll
    pair is the plain path's cost anyway.
    """
    from grit_tpu.ops.window import window_partition, window_reverse

    x, lns, lnb, wqkv, bqkv, wproj, bproj, bias, attn_out = res
    d_r = d_c = 0
    if storage_shift != shift:
        hp_, wp__ = x.shape[1], x.shape[2]
        d_r = (shift - storage_shift) % hp_
        d_c = (shift - storage_shift) % wp__
        x = jnp.roll(x, shift=(-d_r, -d_c), axis=(1, 2))
    b, hp, wp_, c = x.shape
    nw = (hp // window) * (wp_ // window)
    n = window * window

    pad4 = _pad_mask(hp, wp_, real_hw, shift)
    xn, prefix_vjp = jax.vjp(
        lambda x_, s_, b_: _step_prefix_ref(x_, s_, b_, pad4, eps), x, lns, lnb)

    xw = window_partition(xn, window).reshape(b, nw, n, c)
    qkv = (
        jax.lax.dot_general(
            xw, wqkv, (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bqkv
    ).astype(x.dtype)
    q, k, v = qkv[..., :c], qkv[..., c:2 * c], qkv[..., 2 * c:]

    dout_w = window_partition(dout, window).reshape(b, nw, n, c)

    ao2 = attn_out.reshape(-1, c)
    do2 = dout_w.reshape(-1, c)
    dwproj = jax.lax.dot_general(
        ao2, do2, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(wproj.dtype)
    dbproj = do2.astype(jnp.float32).sum(0).astype(bproj.dtype)
    d_ao = jax.lax.dot_general(
        do2, wproj, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(x.dtype).reshape(b, nw, n, c)

    dq, dk, dv, dbias = _backward(q, k, v, bias, scale, num_heads, d_ao)

    dqkv = jnp.concatenate([dq, dk, dv], axis=-1).reshape(-1, 3 * c)
    xw2 = xw.reshape(-1, c)
    dwqkv = jax.lax.dot_general(
        xw2, dqkv, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(wqkv.dtype)
    dbqkv = dqkv.astype(jnp.float32).sum(0).astype(bqkv.dtype)
    dxn_w = jax.lax.dot_general(
        dqkv, wqkv, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(x.dtype).reshape(b * nw, n, c)
    dxn = window_reverse(dxn_w, window, hp, wp_)
    dx, dlns, dlnb = prefix_vjp(dxn)
    if residual:
        dx = dx + jnp.where(pad4, jnp.zeros((), dout.dtype), dout)
    if d_r or d_c:
        dx = jnp.roll(dx, shift=(d_r, d_c), axis=(1, 2))
    return dx, dlns, dlnb, dwqkv, dbqkv, dwproj, dbproj, dbias


_block_step.defvjp(_block_step_fwd, _block_step_bwd)


def fused_block_step(
    x, lns, lnb, wqkv, bqkv, wproj, bproj, bias, *,
    scale, num_heads, window, real_hw, shift=0, residual=True, eps=1e-5,
    storage_shift=None,
):
    """One Swin attention half-block on a RESIDENT padded map.

    x: [B, Hp, Wp, C] raw (pre-LN1) feature map, padded to window multiples
    and cyclically rolled by ``storage_shift`` (``shift`` locates the pad
    tokens in pre-roll coordinates).  The default storage_shift == shift is
    the classic contract: the caller pre-rolled the map to this block's
    window alignment.  In roll-free mode (``rollfree_enabled()``) the caller
    passes the map as the PREVIOUS block left it (storage_shift = previous
    block's shift) and the band kernel absorbs the offset on its read side;
    the output is always stored rolled by ``shift`` (this block's own
    alignment).  Computes
    ``x_masked + proj(win_attn(qkv(LN1(x_masked))))`` (or just the branch
    with ``residual=False`` for external drop-path), entirely in one Pallas
    kernel.  Pad rows of the output are unspecified (finite) — callers slice
    the real region at stage exit.  Differentiable (flash-style recompute
    backward).  Reference semantics: swin_model.py:108-187.
    """
    if storage_shift is None:
        storage_shift = shift  # classic pre-rolled contract (delta == 0)
    return _block_step(x, lns, lnb, wqkv, bqkv, wproj, bproj, bias,
                       scale, num_heads, window, real_hw, shift, residual,
                       eps, storage_shift)


_BLOCK_MLP = os.environ.get("GRIT_WA_BLOCK_MLP", "1") == "1"


def block_mlp_fusable(c, num_heads, window, hp, wp_, m, hid, itemsize) -> bool:
    """True when the whole Swin block (attention + MLP) fits one band
    program: every head group resident (n_chunks == 1) and the combined
    VMEM footprint (attention working set + LN2/fc1/fc2 + the sub-blocked
    f32 GELU intermediate) under budget.  At GRIT shapes this holds for
    stages 1-2 (C=128/256) and not for 3-4 (the MLP weights alone are
    4/16 MB bf16)."""
    if not _BLOCK_MLP:
        return False
    h = num_heads
    d = c // h
    g = max(1, min(h, 128 // max(d, 1)))
    while h % g:
        g -= 1
    gd = g * d
    n_groups = h // g
    n = window * window
    nwx = wp_ // window
    kb = nwx if m > 1 else 1
    gpp = _pick_gpp(n_groups, gd, c, n, nwx, window, wp_, kb, g, _WIDE and g > 1,
                    itemsize)
    if gpp != n_groups:
        return False
    est = 0
    est += 2 * window * wp_ * c * itemsize * 2          # x in + out
    est += window * wp_ * c * (itemsize + 4 + itemsize)  # xn + acc + yb
    est += (c * 3 * gpp * gd + gpp * gd * c) * itemsize
    est += kb * gpp * n * g * n * 4                      # bias
    est += n * 3 * gpp * gd * 4 + n * g * n * (4 + itemsize) * 2
    est += (c * hid + hid * c) * itemsize                # fc1 + fc2
    est += min(window * wp_, 512) * hid * (4 + itemsize)  # GELU sub-block
    return est <= _wa_vmem_budget()


@functools.partial(jax.custom_vjp, nondiff_argnums=(14, 15, 16, 17, 18, 19, 20))
def _block_mlp_step(x, lns, lnb, wqkv, bqkv, wproj, bproj, bias,
                    lns2, lnb2, w1, b1, w2, b2,
                    scale, num_heads, window, real_hw, shift, eps,
                    storage_shift):
    return _step_forward_band(
        x, lns, lnb, wqkv, bqkv, wproj, bproj, bias,
        scale, num_heads, window, real_hw, shift, True, eps,
        storage_shift=storage_shift, mlp=(lns2, lnb2, w1, b1, w2, b2),
    )


def _block_mlp_ref(x, lns, lnb, wqkv, bqkv, wproj, bproj, bias,
                   lns2, lnb2, w1, b1, w2, b2,
                   scale, num_heads, window, real_hw, shift, eps,
                   storage_shift):
    """jnp mirror (recompute target for the backward): the separate-kernel
    composition the fused program reproduces bit-for-bit."""
    attn_out = block_step_ref(
        x, lns, lnb, wqkv, bqkv, wproj, bproj, bias,
        scale=scale, num_heads=num_heads, window=window, real_hw=real_hw,
        shift=shift, residual=True, eps=eps, storage_shift=storage_shift,
    )
    b, hp, wp_, c = attn_out.shape
    rows = _mlp_ref2(attn_out.reshape(b * hp * wp_, c), lns2, lnb2,
                     w1, b1, w2, b2, eps, True)
    return rows.reshape(b, hp, wp_, c)


def _block_mlp_fwd(x, lns, lnb, wqkv, bqkv, wproj, bproj, bias,
                   lns2, lnb2, w1, b1, w2, b2, *nd):
    out = _block_mlp_step(x, lns, lnb, wqkv, bqkv, wproj, bproj, bias,
                          lns2, lnb2, w1, b1, w2, b2, *nd)
    return out, (x, lns, lnb, wqkv, bqkv, wproj, bproj, bias,
                 lns2, lnb2, w1, b1, w2, b2)


def _block_mlp_bwd(scale, num_heads, window, real_hw, shift, eps,
                   storage_shift, res, dout):
    # recompute-and-differentiate through the jnp mirror (XLA autodiff);
    # this path only runs if someone differentiates the resident pipeline,
    # which the engines never do (resident mode = eval / frozen stages)
    _, vjp = jax.vjp(
        lambda *a: _block_mlp_ref(*a, scale, num_heads, window, real_hw,
                                  shift, eps, storage_shift), *res)
    return vjp(dout)


_block_mlp_step.defvjp(_block_mlp_fwd, _block_mlp_bwd)


def fused_block_mlp_step(
    x, lns, lnb, wqkv, bqkv, wproj, bproj, bias, lns2, lnb2, w1, b1, w2, b2, *,
    scale, num_heads, window, real_hw, shift=0, eps=1e-5, storage_shift=None,
):
    """One FULL Swin block (LN1+attention+residual, then LN2+MLP+residual)
    on a resident padded map, in ONE Pallas program per band — one HBM
    round trip per block instead of two, with the MLP's MXU dots available
    to overlap the attention's VPU softmax.  Caller must check
    ``block_mlp_fusable`` first.  Bit-identical to
    ``fused_block_step(residual=True)`` followed by ``fused_mlp`` (the
    fused tail reproduces the separate kernels' dtype boundaries).
    Reference semantics: swin_model.py:189-301."""
    if storage_shift is None:
        storage_shift = shift
    return _block_mlp_step(x, lns, lnb, wqkv, bqkv, wproj, bproj, bias,
                           lns2, lnb2, w1, b1, w2, b2,
                           scale, num_heads, window, real_hw, shift, eps,
                           storage_shift)


def block_step_ref(x, lns, lnb, wqkv, bqkv, wproj, bproj, bias, *,
                   scale, num_heads, window, real_hw, shift=0, residual=True,
                   eps=1e-5, storage_shift=None):
    """jnp mirror of ``fused_block_step`` (test oracle)."""
    from grit_tpu.ops.window import window_partition, window_reverse

    b, hp, wp_, c = x.shape
    if storage_shift is not None and storage_shift != shift:
        # roll-free contract: x arrives in storage coords; compute (and the
        # returned output) live in this block's window-aligned coords
        d_r = (shift - storage_shift) % hp
        d_c = (shift - storage_shift) % wp_
        x = jnp.roll(x, shift=(-d_r, -d_c), axis=(1, 2))
    nw = (hp // window) * (wp_ // window)
    n = window * window
    pad4 = _pad_mask(hp, wp_, real_hw, shift)
    xn = _step_prefix_ref(x, lns, lnb, pad4, eps)
    xw = window_partition(xn, window).reshape(b, nw, n, c)
    qkv = xw @ wqkv + bqkv
    q, k, v = qkv[..., :c], qkv[..., c:2 * c], qkv[..., 2 * c:]
    ao = _unfused(q, k, v, bias, scale, num_heads)
    out = ao @ wproj + bproj
    out = window_reverse(out.reshape(b * nw, n, c), window, hp, wp_)
    if residual:
        out = out + jnp.where(pad4, 0.0, x.astype(out.dtype))
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# Fused MLP (LN2 + fc1 + GELU + fc2 + residual) for the deterministic path.
# Saves the [rows, 4C] GELU intermediate's HBM round trip and the separate
# LayerNorm pass.  Mosaic has no erf primitive, so GELU is approximated:
#
# - f32 path: Abramowitz-Stegun 7.1.26 erf (max abs err 1.5e-7) — keeps the
#   fp32 parity harness (tools/checkpoint_parity.py, the fused-vs-plain
#   tests) at reference precision.
# - bf16 path (production): a clamped odd rational  gelu(x) ~= x * (1/2 +
#   xc*P(xc^2)/Q(xc^2)),  xc = clip(x, +-4.5), P/Q cubic (least-squares
#   minimax fit vs scipy erf; max abs gelu err 2.0e-6 on the clamp range,
#   2.4e-5 over all reals incl. the clamp tails).  It replaces the A&S
#   form's exp + exact divide + sign selects with 6 FMAs + 1 divide —
#   roughly half the VPU slots of the 7.1.26 form — and its error regime at
#   bf16 output resolution is identical: vs exact erf, A&S flips 22% of
#   bf16-rounded outputs by 1 ulp, the rational 27% (measured on
#   [-8, 8]); both are far below the bf16 matmul noise around them.
#   GRIT_FAST_GELU=0 falls back to A&S everywhere.
# ---------------------------------------------------------------------------

_FAST_GELU = os.environ.get("GRIT_FAST_GELU", "1") == "1"
_GELU_B = 4.5
_GELU_P = (0.39893290604005033, 0.027383394683929127,
           0.0038322300140980104, 3.333728760510167e-05)
_GELU_Q = (1.0, 0.23528462861714552,
           0.023806497945587236, 0.0011668215201330351)


def _erf(x):
    # A&S 7.1.26 rational approximation, odd-extended
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
    p = 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _gelu_fast(h):
    """Clamped odd-rational GELU (f32 in/out) — see the block comment."""
    xc = jnp.clip(h, -_GELU_B, _GELU_B)
    u = xc * xc
    pv = ((_GELU_P[3] * u + _GELU_P[2]) * u + _GELU_P[1]) * u + _GELU_P[0]
    qv = ((_GELU_Q[3] * u + _GELU_Q[2]) * u + _GELU_Q[1]) * u + _GELU_Q[0]
    return h * (0.5 + xc * (pv / qv))


def _gelu(h, out_dtype):
    if _FAST_GELU and out_dtype == jnp.bfloat16:
        return _gelu_fast(h)
    return h * 0.5 * (1.0 + _erf(h * 0.7071067811865476))


def _mlp_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                out_ref, *, eps, residual):
    xf = x_ref[...].astype(jnp.float32)  # [R, C]
    xn = _ln_rows(x_ref[...], lns_ref[0], lnb_ref[0], eps)
    h = jax.lax.dot_general(
        xn, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0][None, :]
    h = _gelu(h, jnp.dtype(x_ref.dtype)).astype(x_ref.dtype)
    y = jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[0][None, :]
    if residual:
        y = xf + y
    out_ref[...] = y.astype(out_ref.dtype)


def _const2(a):
    """Promote a 1-D parameter to 2-D with a whole-array VMEM BlockSpec
    (TPU vector constants must be >=2-D); shared by the row-fused kernels."""
    a2 = a[None] if a.ndim == 1 else a
    return a2, pl.BlockSpec(a2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)


def _pick_row_block(rows: int, max_r: int = 512) -> int:
    """Largest power-of-two row block <= max_r that divides ``rows``."""
    r = max_r
    while rows % r:
        r //= 2
    return r


# Optional override for the MLP row cap (rows per program), for chip A/Bs.
_MLP_ROWS = int(os.environ.get("GRIT_MLP_ROWS", "0"))


def _mlp_row_cap(c: int, hid: int, itemsize: int) -> int:
    """Row-block cap for the fused-MLP kernel, sized from a VMEM budget.

    A fixed 512-row block starves narrow stages: at stage 1 (C=128,
    hid=512) each program is ~0.13 GFLOP — launch overhead dominates and
    the b128 eval trace showed ~14% MFU vs stage 3's 74%.  Budgeting rows
    against the per-row VMEM footprint raises the narrow stages (C=128 ->
    2048 rows, C=256 -> 1024) while the floor keeps the wide stages at
    the proven 512 (the byte model below overestimates — the old fixed
    512 compiled and ran fine even at C=1024/hid=4096 where the model
    says ~25 MB — so it must only ever RAISE the cap, never lower it).
    """
    if _MLP_ROWS:
        return _MLP_ROWS
    # per-row bytes: in/out blocks (double-buffered) + f32 LN temps at C
    # + the f32 GELU intermediate + its cast at hid
    per_row = c * (6 * itemsize + 12) + hid * (4 + itemsize)
    cap = _wa_vmem_budget() // max(per_row, 1)
    r = 512
    while r * 2 <= min(cap, 2048):
        r *= 2
    return r


def _ln_rows(x2, lns, lnb, eps):
    """f32-stats fast-variance LayerNorm over rows, result in ``x2.dtype``.
    THE definition of the fused kernels' LN semantics — the kernel bodies
    and their recompute-backward jnp mirrors all call here, so the math
    cannot drift between a kernel and its backward."""
    xf = x2.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    xn = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (xn * lns[None, :] + lnb[None, :]).astype(x2.dtype)


def _mlp_forward(x2, lns, lnb, w1, b1, w2, b2, eps, residual):
    rows, c = x2.shape
    hid = w1.shape[1]
    r = _pick_row_block(rows, max_r=_mlp_row_cap(c, hid, x2.dtype.itemsize))

    row_spec = pl.BlockSpec((r, c), lambda i: (i, 0), memory_space=pltpu.VMEM)

    lns2, lns_spec = _const2(lns)
    lnb2, lnb_spec = _const2(lnb)
    b1_2, b1_spec = _const2(b1)
    b2_2, b2_spec = _const2(b2)
    w1_spec = pl.BlockSpec(w1.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    w2_spec = pl.BlockSpec(w2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_mlp_kernel, eps=eps, residual=residual),
        grid=(rows // r,),
        in_specs=[row_spec, lns_spec, lnb_spec, w1_spec, b1_spec, w2_spec, b2_spec],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((rows, c), x2.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * rows * c * hid,
            bytes_accessed=2 * rows * c * x2.dtype.itemsize,
            transcendentals=rows * hid,
        ),
        compiler_params=_wa_compiler_params(),
    )(x2, lns2, lnb2, w1, b1_2, w2, b2_2)
    return out


def _mlp_ref2(x2, lns, lnb, w1, b1, w2, b2, eps, residual):
    """jnp mirror of ``_mlp_kernel``'s dtype semantics — the recompute
    target for the backward pass.  Uses XLA's native erf: when the bf16
    forward ran the rational GELU, the value/derivative mismatch is
    <=2.4e-5 absolute — far below bf16 gradient noise."""
    xf = x2.astype(jnp.float32)
    xn = _ln_rows(x2, lns, lnb, eps)
    h = jax.lax.dot_general(
        xn, w1, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) + b1[None, :]
    h = (h * 0.5 * (1.0 + jax.lax.erf(h * 0.7071067811865476))).astype(x2.dtype)
    y = jax.lax.dot_general(
        h, w2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) + b2[None, :]
    if residual:
        y = xf + y
    return y.astype(x2.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _mlp(x2, lns, lnb, w1, b1, w2, b2, eps, residual):
    return _mlp_forward(x2, lns, lnb, w1, b1, w2, b2, eps, residual)


def _mlp_fwd(x2, lns, lnb, w1, b1, w2, b2, eps, residual):
    out = _mlp_forward(x2, lns, lnb, w1, b1, w2, b2, eps, residual)
    return out, (x2, lns, lnb, w1, b1, w2, b2)


def _mlp_bwd(eps, residual, res, dy):
    # recompute-and-differentiate: XLA fuses the recomputed forward into the
    # backward matmuls; only the row inputs were saved (the [R, 4C] GELU
    # intermediate never hit HBM in the forward)
    _, vjp = jax.vjp(
        lambda *a: _mlp_ref2(*a, eps, residual), *res
    )
    return vjp(dy)


_mlp.defvjp(_mlp_fwd, _mlp_bwd)


def fused_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, *, eps=1e-5, residual=True):
    """x: [B, L, C] -> [x +] fc2(gelu(fc1(LN(x)))) in one VMEM-resident pass.

    ``residual=False`` returns just the MLP branch so the caller can apply
    drop-path before the residual add (training with stochastic depth).
    Differentiable: backward recomputes the branch from ``x`` (flash-style).
    """
    bsz, L, c = x.shape
    out = _mlp(x.reshape(bsz * L, c), ln_scale, ln_bias, w1, b1, w2, b2,
               eps, residual)
    return out.reshape(bsz, L, c)


# ---------------------------------------------------------------------------
# Fused LN + Linear (PatchMerging's norm -> reduction): one VMEM pass over
# the merged rows instead of an f32 LN materialization followed by a
# separate matmul (the stage-exit convert_reduce/copy chains in the b128
# eval trace).  Same LN semantics as _mlp_kernel (f32 stats, fast variance).
# ---------------------------------------------------------------------------


def _lnlin_kernel(x_ref, lns_ref, lnb_ref, w_ref, out_ref, *, eps):
    xn = _ln_rows(x_ref[...], lns_ref[0], lnb_ref[0], eps)
    y = jax.lax.dot_general(
        xn, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[...] = y.astype(out_ref.dtype)


def _lnlin_forward(x2, lns, lnb, w, eps):
    rows, cin = x2.shape
    cout = w.shape[1]
    # VMEM budget: the whole weight stays resident (8 MB at the stage-3
    # merge: [4096, 1024] bf16), and each row costs the bf16 input + the
    # f32 LN intermediates + the f32 matmul accumulator.  r=512 blew the
    # 16 MB scoped limit by 448 KB on v5e at [7680, 4096] -> size the row
    # block from the leftover budget instead of rows alone.
    itemsize = x2.dtype.itemsize
    weight_bytes = cin * cout * w.dtype.itemsize
    per_row = cin * (2 * itemsize + 4) + cout * (4 + itemsize)
    budget = (_wa_vmem_budget() - (1 << 20)) - weight_bytes
    if budget < 8 * per_row:
        # the whole weight must stay VMEM-resident; a weight past the budget
        # would schedule a guaranteed Mosaic OOM (ADVICE r3).  Unreachable at
        # GRIT shapes (max 8 MB stage-3 merge weight) — future larger configs
        # get the unfused XLA LN+matmul instead of a doomed kernel.
        xn = _ln_rows(x2, lns, lnb, eps)
        return jax.lax.dot_general(
            xn, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x2.dtype)
    cap = max(8, budget // per_row)
    r = _pick_row_block(rows)
    while r > cap and r > 8:
        r //= 2

    x_spec = pl.BlockSpec((r, cin), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((r, cout), lambda i: (i, 0), memory_space=pltpu.VMEM)

    lns2, lns_spec = _const2(lns)
    lnb2, lnb_spec = _const2(lnb)
    w_spec = pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_lnlin_kernel, eps=eps),
        grid=(rows // r,),
        in_specs=[x_spec, lns_spec, lnb_spec, w_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((rows, cout), x2.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * cin * cout,
            bytes_accessed=rows * (cin + cout) * x2.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=_wa_compiler_params(),
    )(x2, lns2, lnb2, w)


def _lnlin_ref2(x2, lns, lnb, w, eps):
    """jnp mirror of ``_lnlin_kernel`` — the backward's recompute target."""
    xn = _ln_rows(x2, lns, lnb, eps)
    y = jax.lax.dot_general(
        xn, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    return y.astype(x2.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _lnlin(x2, lns, lnb, w, eps):
    return _lnlin_forward(x2, lns, lnb, w, eps)


def _lnlin_fwd(x2, lns, lnb, w, eps):
    return _lnlin_forward(x2, lns, lnb, w, eps), (x2, lns, lnb, w)


def _lnlin_bwd(eps, res, dy):
    _, vjp = jax.vjp(lambda *a: _lnlin_ref2(*a, eps), *res)
    return vjp(dy)


_lnlin.defvjp(_lnlin_fwd, _lnlin_bwd)


def fused_ln_linear(x, ln_scale, ln_bias, w, *, eps=1e-5):
    """x: [B, L, Cin] -> Linear(LN(x)) [B, L, Cout], no bias, one VMEM pass.

    Covers PatchMerging's norm -> reduction pair (swin_model.py PatchMerging)
    without materializing the f32-normalized [B, L, 4C] rows in HBM.
    Differentiable (recompute backward, like fused_mlp).
    """
    bsz, L, cin = x.shape
    out = _lnlin(x.reshape(bsz * L, cin), ln_scale, ln_bias, w, eps)
    return out.reshape(bsz, L, w.shape[1])


def _ln_kernel(x_ref, lns_ref, lnb_ref, out_ref, *, eps):
    out_ref[...] = _ln_rows(x_ref[...], lns_ref[0], lnb_ref[0], eps).astype(
        out_ref.dtype
    )


def _ln_forward(x2, lns, lnb, eps):
    rows, c = x2.shape
    r = _pick_row_block(rows)
    row_spec = pl.BlockSpec((r, c), lambda i: (i, 0), memory_space=pltpu.VMEM)

    lns2, lns_spec = _const2(lns)
    lnb2, lnb_spec = _const2(lnb)
    return pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(rows // r,),
        in_specs=[row_spec, lns_spec, lnb_spec],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((rows, c), x2.dtype),
        cost_estimate=pl.CostEstimate(
            flops=8 * rows * c,
            bytes_accessed=2 * rows * c * x2.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=_wa_compiler_params(),
    )(x2, lns2, lnb2)


def _ln_ref2(x2, lns, lnb, eps):
    return _ln_rows(x2, lns, lnb, eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _ln(x2, lns, lnb, eps):
    return _ln_forward(x2, lns, lnb, eps)


def _ln_fwd(x2, lns, lnb, eps):
    return _ln_forward(x2, lns, lnb, eps), (x2, lns, lnb)


def _ln_bwd(eps, res, dy):
    _, vjp = jax.vjp(lambda *a: _ln_ref2(*a, eps), *res)
    return vjp(dy)


_ln.defvjp(_ln_fwd, _ln_bwd)


def fused_layernorm(x, ln_scale, ln_bias, *, eps=1e-5):
    """LayerNorm over the last axis in one VMEM pass — no f32 copy of the
    whole map in HBM (the patch-embed norm's convert/reduce chain, ~5 ms at
    b128 eval).  Differentiable (recompute backward)."""
    bsz, L, c = x.shape
    return _ln(x.reshape(bsz * L, c), ln_scale, ln_bias, eps).reshape(bsz, L, c)
