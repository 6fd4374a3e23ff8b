"""Fused window attention Pallas kernel for Swin.

Profiling the Swin tower on v5e showed the attention core dominating: XLA
materializes the per-window score tensors (up to ~600M elements per stage-1
block at batch 64) to HBM, then pays 4+ full passes for the relative-bias
add, shift-mask add and softmax (`convert_reduce_fusion`/`add_add_fusion`
ops at ~8 ms each).  This kernel computes

    out = softmax(q k^T * scale + rel_bias [+ shift_mask]) @ v

with the scores living only in VMEM.

Layout/grid design (the first cut was SLOWER than XLA because the combined
[h, N, N] bias block was re-fetched for every one of B*nW programs):
q/k/v are reshaped to **window-kind-major** [nW, B, h, N, d] and the grid is
(nW, B/BBLK) with the batch as the fastest axis — consecutive grid steps
keep the same bias block index, so Pallas skips its DMA and each of the nW
bias blocks crosses HBM exactly once; BBLK batch rows per program amortize
program overhead.  Scores accumulate in fp32; the probability matrix is cast
back to the input dtype for the AV matmul.

Backward falls back to autodiff of the unfused formulation via custom_vjp
(inference is the headline path; training can remat).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale, hblk, bblk):
    # sequential fori_loop (NOT an unrolled python loop: unrolling kept every
    # iteration's [N, N] fp32 intermediates live and blew the VMEM stack)
    def body(idx, _):
        bb = idx // hblk
        hh = idx % hblk
        q = q_ref[0, bb, hh].astype(jnp.float32) * scale      # [N, d]
        k = k_ref[0, bb, hh].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                     # [N, N]
        s = s + bias_ref[0, hh]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        out = jnp.dot(
            p.astype(v_ref.dtype), v_ref[0, bb, hh],
            preferred_element_type=jnp.float32,
        )
        out_ref[0, bb, hh] = out.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, bblk * hblk, body, 0)


def _pick_blocks(b: int, h: int, n: int) -> tuple[int, int]:
    """(bblk, hblk) such that the lane-PADDED qkv/out blocks fit VMEM.

    Mosaic pads the last dim to 128 lanes, so a [*, N, d=32] block occupies
    4x its logical bytes; budget ~5 MB across the 4 double-buffered blocks.
    """
    budget_rows = (5 << 20) // (8 * n * 128 * 2)  # bblk * hblk upper bound
    hblk = h
    while hblk > 1 and hblk > budget_rows:
        hblk //= 2
    bblk = max(1, min(8, budget_rows // hblk))
    while b % bblk:
        bblk -= 1
    return bblk, hblk


def _forward(q, k, v, bias, scale):
    """q, k, v: [B, nW, h, N, d]; bias: [M, h, N, N] (M == nW or 1)."""
    b, nw, h, n, d = q.shape
    m = bias.shape[0]
    bblk, hblk = _pick_blocks(b, h, n)

    def to_kind_major(x):
        return x.transpose(1, 0, 2, 3, 4)  # [nW, B, h, N, d]

    qt, kt, vt = to_kind_major(q), to_kind_major(k), to_kind_major(v)
    kernel = functools.partial(_kernel, scale=scale, hblk=hblk, bblk=bblk)
    qkv_spec = pl.BlockSpec(
        (1, bblk, hblk, n, d), lambda i, j, kk: (i, j, kk, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        kernel,
        grid=(nw, b // bblk, h // hblk),
        in_specs=[
            qkv_spec, qkv_spec, qkv_spec,
            pl.BlockSpec((1, hblk, n, n), lambda i, j, kk, _m=m: (i % _m, kk, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bblk, hblk, n, d), lambda i, j, kk: (i, j, kk, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nw, b, h, n, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * nw * h * n * n * d,
            bytes_accessed=(4 * q.size + m * h * n * n) * q.dtype.itemsize,
            transcendentals=b * nw * h * n * n,
        ),
    )(qt, kt, vt, bias)
    return out.transpose(1, 0, 2, 3, 4)  # back to [B, nW, h, N, d]


def _unfused(q, k, v, bias, scale):
    b, nw, h, n, d = q.shape
    m = bias.shape[0]
    s = jnp.einsum(
        "bwhqd,bwhkd->bwhqk", q.astype(jnp.float32) * scale, k.astype(jnp.float32)
    )
    s = s + bias[None]  # [1, M, h, N, N] broadcasts over batch when M == nW
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bwhqk,bwhkd->bwhqd", p, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_window_attention(q, k, v, bias, scale):
    """softmax(q k^T * scale + bias[window kind]) @ v — fused on TPU.

    q, k, v: [B, nW, h, N, d]; bias: [M, h, N, N] with M == nW or M == 1.
    """
    return _forward(q, k, v, bias, scale)


def _fwd(q, k, v, bias, scale):
    return _forward(q, k, v, bias, scale), (q, k, v, bias)


def _bwd(scale, res, g):
    q, k, v, bias = res
    out, vjp = jax.vjp(
        lambda q_, k_, v_, b_: _unfused(q_, k_, v_, b_, scale), q, k, v, bias
    )
    dq, dk, dv, dbias = vjp(g)
    if bias.shape[0] == 1:
        dbias = dbias  # already reduced by broadcasting rules in vjp
    return dq, dk, dv, dbias


fused_window_attention.defvjp(_fwd, _bwd)
