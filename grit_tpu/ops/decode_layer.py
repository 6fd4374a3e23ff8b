"""Fused decode-layer kernel: cross-attention pair + gated fusion + FFN.

One Pallas program per image block replaces the ~35 XLA ops that each
ParallelAttentionLayer decode step dispatches after self-attention (two
cross attentions over the visual K/V, two sigmoid gates, the position-wise
FFN, three LayerNorms).  The decode scan is pure launch latency — ~46 ms of
the 433 ms b128 eval step at ~5% MFU (docs/NOTES.md round-4 trace) — so
collapsing a layer's tail into one kernel attacks launch count, not FLOPs.

Math parity (reference: models/caption/cap_generator.py:20-56 via the
grit_tpu.models.cap_generator.ParallelAttentionLayer decode path):

  enc_i  = LN_i(x + fc_o_i(softmax(q_i k_i^T / sqrt(d) + mask_i) v_i)) * pad
  alpha_i= sigmoid([x, enc_i] @ W_alpha_i + b_alpha_i)
  enc    = (enc1*alpha1 + enc2*alpha2) / sqrt(2) * pad
  out    = LN_f(enc + fc2(relu(fc1(enc)))) * pad

In-kernel the per-image, per-head score/value dots use the block-diagonal
head packing of the window kernels: q rows of all H heads stack into
[H*f, D] with each head's d-lane block non-zero, so ONE [H*f, D] x [D, T]
dot yields every head's scores and one [H*f, T] x [T, D] dot every head's
values (diagonal-block extraction by the same head mask).  The gate concat
[x, enc] @ W splits into x @ Ws + enc @ We (identical up to f32 summation
order).

Backward is recompute-and-differentiate through the jnp mirror (`_ref`),
like ops/window_attention's fused MLP: gradients are exactly those of the
reference formulation, inputs-only residuals.

Used by cap_generator when GRIT_DECODE_FUSED_LAYER=1 (deterministic decode
only — dropout falls back to the XLA path).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30  # additive mask value; exp underflows to exactly 0 like -inf


def fused_layer_enabled() -> bool:
    return os.environ.get("GRIT_DECODE_FUSED_LAYER", "0") == "1"


def fused_decode_tail_applicable(vis_kv) -> bool:
    """Flag on AND the visual K/V is in the flat [B, T, D] layout (the
    head-split GRIT_VIS_KV_HSPLIT layout targets the unfused path; the
    kernel reads flat slabs directly, making the re-lay moot)."""
    if not fused_layer_enabled():
        return False
    k1, _ = vis_kv["att1"]
    return k1.ndim == 3


def _ln(x, scale, bias, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _cross_bd(x, k_blk, v_blk, madd_blk, wq, bq, wo, bo, lns, lnb,
              *, f, h, eps, bblk, dtype):
    """Block-diag cross attention for a block of ``bblk`` images.

    x: [bblk*f, D] f32; k/v_blk: [bblk, T, D]; madd_blk: [bblk, T] f32.
    Returns LN(x + attn @ wo + bo): [bblk*f, D] f32.
    """
    d_model = x.shape[-1]
    d = d_model // h
    q = jax.lax.dot_general(
        x.astype(dtype), wq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bq
    q = q * (1.0 / np.sqrt(d))
    row_head = jax.lax.broadcasted_iota(jnp.int32, (h * f, d_model), 0) // f
    col_head = jax.lax.broadcasted_iota(jnp.int32, (h * f, d_model), 1) // d
    hmask = row_head == col_head
    outs = []
    for i in range(bblk):
        qi = jax.lax.slice_in_dim(q, i * f, (i + 1) * f, axis=0)  # [f, D]
        q_bd = jnp.where(
            hmask,
            jnp.broadcast_to(qi[None], (h, f, d_model)).reshape(h * f, d_model),
            0.0,
        )
        k = k_blk[i]
        v = v_blk[i]
        s = jax.lax.dot_general(
            q_bd.astype(dtype), k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # [h*f, T]
        s = s + madd_blk[i][None, :]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        o_bd = jax.lax.dot_general(
            p.astype(dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # [h*f, D]
        o = jnp.where(hmask, o_bd, 0.0).reshape(h, f, d_model).sum(axis=0)
        outs.append(o)
    attn = jnp.concatenate(outs, axis=0) if bblk > 1 else outs[0]
    proj = jax.lax.dot_general(
        attn.astype(dtype), wo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bo
    return _ln(x + proj, lns, lnb, eps)


def _kernel(
    x_ref, k1_ref, v1_ref, m1_ref, k2_ref, v2_ref, m2_ref, pad_ref,
    wq1_ref, bq1_ref, wo1_ref, bo1_ref, ln1s_ref, ln1b_ref,
    wq2_ref, bq2_ref, wo2_ref, bo2_ref, ln2s_ref, ln2b_ref,
    wsa_ref, wea_ref, ba_ref, wsb_ref, web_ref, bb_ref,
    wf1_ref, bf1_ref, wf2_ref, bf2_ref, lnfs_ref, lnfb_ref,
    out_ref, *, f, h, eps, bblk,
):
    dtype = k1_ref.dtype
    x = x_ref[...].astype(jnp.float32)                      # [bblk*f, D]
    pad = pad_ref[...].astype(jnp.float32)                  # [bblk*f, 1]

    enc1 = _cross_bd(
        x, k1_ref[...], v1_ref[...], m1_ref[...],
        wq1_ref[...], bq1_ref[...], wo1_ref[...], bo1_ref[...],
        ln1s_ref[...], ln1b_ref[...], f=f, h=h, eps=eps, bblk=bblk, dtype=dtype,
    ) * pad
    enc2 = _cross_bd(
        x, k2_ref[...], v2_ref[...], m2_ref[...],
        wq2_ref[...], bq2_ref[...], wo2_ref[...], bo2_ref[...],
        ln2s_ref[...], ln2b_ref[...], f=f, h=h, eps=eps, bblk=bblk, dtype=dtype,
    ) * pad

    def gate(ws_ref, we_ref, b_ref, enc):
        s = jax.lax.dot_general(
            x.astype(dtype), ws_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        e = jax.lax.dot_general(
            enc.astype(dtype), we_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jax.nn.sigmoid(s + e + b_ref[...])

    alpha1 = gate(wsa_ref, wea_ref, ba_ref, enc1)
    alpha2 = gate(wsb_ref, web_ref, bb_ref, enc2)
    enc = (enc1 * alpha1 + enc2 * alpha2) * (1.0 / np.sqrt(2)) * pad

    h1 = jax.lax.dot_general(
        enc.astype(dtype), wf1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bf1_ref[...]
    h1 = jnp.maximum(h1, 0.0)
    y = jax.lax.dot_general(
        h1.astype(dtype), wf2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bf2_ref[...]
    out = _ln(enc + y, lnfs_ref[...], lnfb_ref[...], eps) * pad
    out_ref[...] = out.astype(out_ref.dtype)


def _ref(x, k1, v1, m1a, k2, v2, m2a, pad, weights, *, f, h, eps):
    """jnp mirror of the kernel (drives the recompute backward + tests)."""
    (wq1, bq1, wo1, bo1, ln1s, ln1b, wq2, bq2, wo2, bo2, ln2s, ln2b,
     wsa, wea, ba, wsb, web, bb, wf1, bf1, wf2, bf2, lnfs, lnfb) = weights
    b = k1.shape[0]
    d_model = x.shape[-1]
    d = d_model // h
    xf = x.astype(jnp.float32)
    padf = pad.astype(jnp.float32)
    dtype = k1.dtype

    def cross(k, v, madd, wq, bq, wo, bo, lns, lnb):
        q = (x.astype(dtype) @ wq + bq).astype(jnp.float32) / np.sqrt(d)
        qh = q.reshape(b, f, h, d)
        kh = k.reshape(b, -1, h, d)
        vh = v.reshape(b, -1, h, d)
        s = jnp.einsum("bqhd,bkhd->bhqk", qh.astype(dtype), kh,
                       preferred_element_type=jnp.float32)
        s = s + madd[:, None, None, :]
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", p.astype(dtype), vh,
                       preferred_element_type=jnp.float32)
        o = o.reshape(b * f, d_model)
        proj = (o.astype(dtype) @ wo + bo).astype(jnp.float32)
        return _ln(xf + proj, lns, lnb, eps)

    enc1 = cross(k1, v1, m1a, wq1, bq1, wo1, bo1, ln1s, ln1b) * padf
    enc2 = cross(k2, v2, m2a, wq2, bq2, wo2, bo2, ln2s, ln2b) * padf

    def gate(ws, we, bg, enc):
        return jax.nn.sigmoid(
            (x.astype(dtype) @ ws).astype(jnp.float32)
            + (enc.astype(dtype) @ we).astype(jnp.float32) + bg)

    enc = (enc1 * gate(wsa, wea, ba, enc1) + enc2 * gate(wsb, web, bb, enc2))
    enc = enc * (1.0 / np.sqrt(2)) * padf
    h1 = jnp.maximum((enc.astype(dtype) @ wf1).astype(jnp.float32) + bf1, 0.0)
    y = (h1.astype(dtype) @ wf2).astype(jnp.float32) + bf2
    return (_ln(enc + y, lnfs, lnfb, eps) * padf).astype(x.dtype)


def _pick_bblk(b: int) -> int:
    for cand in (8, 4, 2, 1):
        if b % cand == 0:
            return cand
    return 1


def _call(x, k1, v1, m1a, k2, v2, m2a, pad, weights, f, h, eps):
    bf, d_model = x.shape
    b, t1, _ = k1.shape
    t2 = k2.shape[1]
    bblk = _pick_bblk(b)
    grid = (b // bblk,)

    def rows(i):
        return (i, 0)

    def img3(i):
        return (i, 0, 0)

    def img2(i):
        return (i, 0)

    const2 = lambda w: pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    w_specs = [const2(w.reshape(1, -1) if w.ndim == 1 else w) for w in weights]
    weights2 = [w.reshape(1, -1) if w.ndim == 1 else w for w in weights]

    return pl.pallas_call(
        functools.partial(_kernel, f=f, h=h, eps=eps, bblk=bblk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bblk * f, d_model), rows, memory_space=pltpu.VMEM),
            pl.BlockSpec((bblk, t1, d_model), img3, memory_space=pltpu.VMEM),
            pl.BlockSpec((bblk, t1, d_model), img3, memory_space=pltpu.VMEM),
            pl.BlockSpec((bblk, t1), img2, memory_space=pltpu.VMEM),
            pl.BlockSpec((bblk, t2, d_model), img3, memory_space=pltpu.VMEM),
            pl.BlockSpec((bblk, t2, d_model), img3, memory_space=pltpu.VMEM),
            pl.BlockSpec((bblk, t2), img2, memory_space=pltpu.VMEM),
            pl.BlockSpec((bblk * f, 1), rows, memory_space=pltpu.VMEM),
        ] + w_specs,
        out_specs=pl.BlockSpec((bblk * f, d_model), rows, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bf, d_model), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bf * d_model * (4 * d_model + 3 * d_model
                                      + 4 * k1.shape[2]) + 8 * bf * d_model * 2048,
            bytes_accessed=2 * (x.size + k1.size + v1.size + k2.size + v2.size),
            transcendentals=bf * (t1 + t2 + 3 * d_model),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
    )(x, k1, v1, m1a, k2, v2, m2a, pad, *weights2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def _op(x, k1, v1, m1a, k2, v2, m2a, pad, weights, f, h, eps):
    return _call(x, k1, v1, m1a, k2, v2, m2a, pad, weights, f, h, eps)


def _op_fwd(x, k1, v1, m1a, k2, v2, m2a, pad, weights, f, h, eps):
    out = _call(x, k1, v1, m1a, k2, v2, m2a, pad, weights, f, h, eps)
    return out, (x, k1, v1, m1a, k2, v2, m2a, pad, weights)


def _op_bwd(f, h, eps, res, dy):
    # recompute-and-differentiate through the jnp mirror: gradients are the
    # reference formulation's, inputs-only residuals (flash-style)
    x, k1, v1, m1a, k2, v2, m2a, pad, weights = res
    _, vjp = jax.vjp(
        lambda *a: _ref(*a[:8], a[8:], f=f, h=h, eps=eps),
        x, k1, v1, m1a, k2, v2, m2a, pad, *weights,
    )
    grads = vjp(dy)
    return grads[:8] + (tuple(grads[8:]),)


_op.defvjp(_op_fwd, _op_bwd)


def fused_decode_layer_tail(
    x, k1, v1, mask1, k2, v2, mask2, mask_pad, weights, *, fold, n_heads,
    eps=1e-5,
):
    """The decode layer's post-self-attention tail in one fused kernel.

    x: [B*fold, 1, D] (self-attention output); k/v_i: [B, T_i, D] flat
    projected visual K/V; mask_i: bool [B, 1, 1, T_i] (True = masked) or
    None; mask_pad: [B*fold, 1, 1]; weights: 24-tuple, see _ref.
    Returns [B*fold, 1, D].
    """
    bf = x.shape[0]
    b = k1.shape[0]

    def madd(mask, t):
        if mask is None:
            return jnp.zeros((b, t), jnp.float32)
        return jnp.where(mask.reshape(b, t), jnp.float32(NEG), 0.0)

    out = _op(
        x.reshape(bf, -1),
        k1, v1, madd(mask1, k1.shape[1]),
        k2, v2, madd(mask2, k2.shape[1]),
        mask_pad.reshape(bf, 1).astype(jnp.float32),
        tuple(weights), fold, n_heads, eps,
    )
    return out[:, None, :]
