"""Fused window attention Pallas kernel for Swin.

Profiling the Swin tower on v5e showed the attention core dominating: XLA
materializes the per-window score tensors (up to ~600M elements per stage-1
block at batch 64) to HBM, then pays 4+ full passes for the relative-bias
add, shift-mask add and softmax (`convert_reduce_fusion`/`add_add_fusion`
ops at ~8 ms each).  This kernel computes

    out = softmax(q k^T * scale + rel_bias [+ shift_mask]) @ v

entirely in VMEM per window: one grid step handles one window's heads, with
the combined additive bias selected by ``window_id % n_mask_kinds`` through
the BlockSpec index map (so the shifted-window mask pattern, which repeats
per image, is never broadcast across the batch).

Shapes: q, k, v [W, h, N, d] with W = batch * windows, N = window² (144),
d = head dim; bias [M, h, N, N] with M = number of distinct window kinds
(nW for shifted blocks, 1 otherwise).  Scores accumulate in fp32; the
probability matrix is cast back to the input dtype for the AV matmul.

Backward falls back to autodiff of the unfused formulation via custom_vjp
(inference is the headline path; training can remat).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale: float, n_heads: int):
    for hh in range(n_heads):
        q = q_ref[0, hh].astype(jnp.float32) * scale          # [N, d]
        k = k_ref[0, hh].astype(jnp.float32)                  # [N, d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                     # [N, N]
        s = s + bias_ref[0, hh]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        out = jnp.dot(
            p.astype(v_ref.dtype), v_ref[0, hh],
            preferred_element_type=jnp.float32,
        )                                                     # [N, d]
        out_ref[0, hh] = out.astype(out_ref.dtype)


def _forward(q, k, v, bias, scale):
    w, h, n, d = q.shape
    m = bias.shape[0]
    kernel = functools.partial(_kernel, scale=scale, n_heads=h)
    return pl.pallas_call(
        kernel,
        grid=(w,),
        in_specs=[
            pl.BlockSpec((1, h, n, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, n, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, n, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, n, n), lambda i, _m=m: (i % _m, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, n, d), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((w, h, n, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * w * h * n * n * d,
            bytes_accessed=(3 * q.size + w * h * n * n) * q.dtype.itemsize,
            transcendentals=w * h * n * n,
        ),
    )(q, k, v, bias)


def _unfused(q, k, v, bias, scale):
    w, h, n, d = q.shape
    m = bias.shape[0]
    s = jnp.einsum(
        "whqd,whkd->whqk", q.astype(jnp.float32) * scale, k.astype(jnp.float32)
    )
    reps = w // m
    full_bias = jnp.tile(bias, (reps, 1, 1, 1)) if m > 1 else bias
    s = s + full_bias
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("whqk,whkd->whqd", p, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_window_attention(q, k, v, bias, scale):
    """softmax(q k^T * scale + bias[window % M]) @ v  — fused on TPU."""
    return _forward(q, k, v, bias, scale)


def _fwd(q, k, v, bias, scale):
    return _forward(q, k, v, bias, scale), (q, k, v, bias)


def _bwd(scale, res, g):
    q, k, v, bias = res
    _, vjp = jax.vjp(lambda q_, k_, v_, b_: _unfused(q_, k_, v_, b_, scale), q, k, v, bias)
    return vjp(g)


fused_window_attention.defvjp(_fwd, _bwd)
