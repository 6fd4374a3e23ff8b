"""Flat single-pass Adam moments update (GRIT_FUSED_ADAM).

Why this exists: ``optax.scale_by_adam`` holds the moments as a pytree
mirroring the 228-leaf param tree, and XLA compiles the update as THREE
elementwise fusions PER LEAF (mu pass, nu pass, apply pass — 684 fusions,
23.3 ms of the measured XE step trace; docs/NOTES.md round 3).  Rewriting
the per-leaf math cannot help: XLA re-derives the same 3-pass split.  The
memory-bandwidth bound, however, is ONE pass — 4 reads (g, mu, nu + the
param read in the apply) and 3 writes (mu', nu', update) — roughly 7 ms
for the caption model's ~230 MB of f32 state on a v5e.

This module gets there by keeping the Adam moments as ONE flat f32 buffer
per moment.  Gradients are raveled+concatenated once per step, the whole
update runs over the flat buffers, and the updates are sliced back into
the param tree (XLA fuses each slice into the per-leaf ``params + u``
add).  Two implementations behind the same flag:

- ``GRIT_FUSED_ADAM=xla``    flat buffers + plain jnp ops.  The single
  shape lets XLA emit one multi-output elementwise fusion instead of
  684 per-leaf ones.
- ``GRIT_FUSED_ADAM=pallas`` the same single pass as an explicit kernel
  (grid over lane-aligned row blocks, moments aliased in-place).
- ``GRIT_FUSED_ADAM=off``    (default) per-leaf ``optax.scale_by_adam``.

Numerical parity: the formulas mirror ``optax.scale_by_adam`` op-for-op
(``(1-b)*g + b*m`` moment EMA, ``m / (1 - b**t)`` bias correction,
``mu_hat / (sqrt(nu_hat + eps_root) + eps)``), and concatenation does not
change elementwise values — updates are bit-identical to optax's on f32
trees (pinned by tests/test_fused_adam.py).

Reference parity note: the torch trainer builds ``torch.optim.Adam`` over
the same two param groups (engine/caption_engine.py:18-73); this flat pass
is the TPU analogue of torch's ``foreach``/``fused`` Adam modes.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 1024  # 8 sublanes x 128 lanes: the f32 VMEM tile
_ROWBLK = 256  # kernel row block: 256 x 1024 f32 = 1 MB per operand


def fused_adam_impl() -> str:
    """Resolve GRIT_FUSED_ADAM: 'off' (default) | 'xla' | 'pallas'."""
    v = os.environ.get("GRIT_FUSED_ADAM", "off").strip().lower()
    if v in ("", "0", "off", "false", "none"):
        return "off"
    if v in ("1", "on", "true", "xla"):
        return "xla"
    if v == "pallas":
        return "pallas"
    raise ValueError(f"GRIT_FUSED_ADAM={v!r}: expected off|xla|pallas")


class FlatSpec(NamedTuple):
    """Static layout of a flattened pytree: one slot per leaf."""

    treedef: Any
    shapes: tuple
    offsets: tuple
    total: int   # sum of leaf sizes
    padded: int  # total rounded up to a _LANES multiple


def make_flat_spec(tree) -> FlatSpec:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    shapes, offsets, off = [], [], 0
    for leaf in leaves:
        shapes.append(tuple(leaf.shape))
        offsets.append(off)
        off += int(leaf.size)
    chunk = _LANES * _ROWBLK  # rows stay a _ROWBLK multiple for the kernel
    padded = -(-max(off, 1) // chunk) * chunk
    return FlatSpec(treedef, tuple(shapes), tuple(offsets), off, padded)


def flatten_f32(tree, spec: FlatSpec) -> jnp.ndarray:
    """Ravel + concatenate all leaves into one padded f32 [spec.padded]."""
    leaves = jax.tree_util.tree_leaves(tree)
    parts = [leaf.reshape(-1) for leaf in leaves]
    if spec.padded > spec.total:
        parts.append(jnp.zeros((spec.padded - spec.total,), jnp.float32))
    return jnp.concatenate(parts)


def unflatten(flat: jnp.ndarray, spec: FlatSpec):
    leaves = [
        flat[off:off + math.prod(shape)].reshape(shape)
        for shape, off in zip(spec.shapes, spec.offsets)
    ]
    return jax.tree_util.tree_unflatten(spec.treedef, leaves)


def _adam_math(g, mu, nu, c1, c2, *, b1, b2, eps, eps_root):
    """One elementwise Adam pass — THE formula both impls share
    (op-for-op ``optax.scale_by_adam``: optax/_src/transform.py)."""
    mu2 = (1.0 - b1) * g + b1 * mu
    nu2 = (1.0 - b2) * (g**2) + b2 * nu
    mu_hat = mu2 / c1
    nu_hat = nu2 / c2
    u = mu_hat / (jnp.sqrt(nu_hat + eps_root) + eps)
    return u, mu2, nu2


def _adam_kernel(s_ref, g_ref, mu_ref, nu_ref, u_ref, mu_out, nu_out,
                 *, b1, b2, eps, eps_root):
    u, mu2, nu2 = _adam_math(
        g_ref[...], mu_ref[...], nu_ref[...], s_ref[0], s_ref[1],
        b1=b1, b2=b2, eps=eps, eps_root=eps_root,
    )
    u_ref[...] = u
    mu_out[...] = mu2
    nu_out[...] = nu2


def _adam_flat_pallas(g, mu, nu, c1, c2, *, b1, b2, eps, eps_root):
    n = g.shape[0]
    rows = n // _LANES  # make_flat_spec pads n to a _LANES*_ROWBLK multiple
    r = _ROWBLK
    shape2 = (rows, _LANES)
    row_spec = pl.BlockSpec((r, _LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    scal = jnp.stack([c1, c2]).astype(jnp.float32)
    u, mu2, nu2 = pl.pallas_call(
        functools.partial(_adam_kernel, b1=b1, b2=b2, eps=eps,
                          eps_root=eps_root),
        grid=(rows // r,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            row_spec, row_spec, row_spec,
        ],
        out_specs=[row_spec, row_spec, row_spec],
        out_shape=[jax.ShapeDtypeStruct(shape2, jnp.float32)] * 3,
        input_output_aliases={2: 1, 3: 2},  # mu, nu update in place
        cost_estimate=pl.CostEstimate(
            flops=12 * n, bytes_accessed=6 * n * 4, transcendentals=n,
        ),
    )(scal, g.reshape(shape2), mu.reshape(shape2), nu.reshape(shape2))
    return u.reshape(n), mu2.reshape(n), nu2.reshape(n)


class FlatAdamState(NamedTuple):
    count: jnp.ndarray  # int32 step counter (optax semantics)
    mu: jnp.ndarray     # f32 [padded] flat first moment
    nu: jnp.ndarray     # f32 [padded] flat second moment


def scale_by_adam_flat(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    eps_root: float = 0.0,
    *,
    impl: str = "xla",
) -> optax.GradientTransformation:
    """Drop-in ``optax.scale_by_adam`` with flat single-pass state.

    f32-only: callers (engine/optim.build_optimizer) fall back to the
    per-leaf optax transform when the param tree carries other dtypes.
    """

    def init_fn(params):
        spec = make_flat_spec(params)
        # mu and nu must be DISTINCT buffers: the train step donates the
        # optimizer state, and donating one buffer twice is a runtime error.
        return FlatAdamState(
            jnp.zeros([], jnp.int32),
            jnp.zeros((spec.padded,), jnp.float32),
            jnp.zeros((spec.padded,), jnp.float32),
        )

    def update_fn(updates, state, params=None):
        del params
        spec = make_flat_spec(updates)
        g = flatten_f32(updates, spec)
        count_inc = optax.safe_increment(state.count)
        # bias_correction (optax/_src/numerics.py): 1 - decay**count in f32
        c1 = (1.0 - b1**count_inc).astype(jnp.float32)
        c2 = (1.0 - b2**count_inc).astype(jnp.float32)
        if impl == "pallas":
            u, mu2, nu2 = _adam_flat_pallas(
                g, state.mu, state.nu, c1, c2,
                b1=b1, b2=b2, eps=eps, eps_root=eps_root,
            )
        else:
            u, mu2, nu2 = _adam_math(
                g, state.mu, state.nu, c1, c2,
                b1=b1, b2=b2, eps=eps, eps_root=eps_root,
            )
        return unflatten(u, spec), FlatAdamState(count_inc, mu2, nu2)

    return optax.GradientTransformation(init_fn, update_fn)
