"""Flat single-pass Adam moments update (GRIT_FUSED_ADAM).

Why this exists: ``optax.scale_by_adam`` holds the moments as a pytree
mirroring the 228-leaf param tree, and XLA compiles the update as THREE
elementwise fusions PER LEAF (mu pass, nu pass, apply pass — 684 fusions,
23.3 ms of the measured XE step trace; docs/NOTES.md round 3).  Rewriting
the per-leaf math cannot help: XLA re-derives the same 3-pass split.  The
memory-bandwidth bound, however, is ONE pass — 4 reads (g, mu, nu + the
param read in the apply) and 3 writes (mu', nu', update) — roughly 7 ms
for the caption model's ~230 MB of f32 state on a v5e.

This module gets there by keeping the Adam moments as flat f32 buffers.
Gradients are raveled+concatenated once per step, the whole update runs
over the flat buffers, and the updates are sliced back into the param tree
(XLA fuses each slice into the per-leaf ``params + u`` add).

**Bucketing (round 4).**  A single whole-model buffer OOM'd the v5e at the
XE step: concatenating every raveled grad into one 637 MB array forces ALL
grad leaves live at the backward's memory peak (+~2 GB over the per-leaf
path, which lets XLA consume each grad right where the backward produces
it — chip ladder /tmp/ladder4, ``Allocation would exceed memory`` at
reshape.509).  Leaves are therefore packed into ~32 MB buckets in traversal
order: each bucket is still one multi-output fusion / one kernel launch
(~20 for the caption model instead of 684 fusions), but a bucket's concat
can be scheduled near its grads' production and dies right after its
update, so the peak-memory overhead is one bucket, not the model.

Two implementations behind the same flag:

- ``GRIT_FUSED_ADAM=xla``    flat buffers + plain jnp ops.  One bucket =
  one multi-output elementwise fusion.
- ``GRIT_FUSED_ADAM=pallas`` the same pass as an explicit kernel per
  bucket (grid over lane-aligned row blocks, moments aliased in-place).
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
_CHUNK = _LANES * _ROWBLK  # bucket sizes stay a multiple of this
#: target bucket size in elements (32 MB of f32).  Big enough that ~20
#: buckets cover a 200M-param model (vs optax's 684 fusions), small enough
#: that one bucket's concat+update never moves the backward's memory peak.
_BUCKET_ELEMS = int(os.environ.get("GRIT_FUSED_ADAM_BUCKET_MB", "32")) * (1 << 20) // 4


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
    """Static bucketed layout of a flattened pytree: one slot per leaf."""

    treedef: Any
    shapes: tuple
    buckets: tuple   # leaf -> bucket index (leaves packed in traversal order)
    offsets: tuple   # leaf -> element offset within its bucket
    sizes: tuple     # bucket -> padded element count (_CHUNK multiples)


def make_flat_spec(tree, bucket_elems: int | None = None) -> FlatSpec:
    bucket_elems = _BUCKET_ELEMS if bucket_elems is None else bucket_elems
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    shapes, buckets, offsets, sizes = [], [], [], []
    cur = 0  # filled elements in the open bucket
    for leaf in leaves:
        if cur >= bucket_elems:
            sizes.append(cur)
            cur = 0
        shapes.append(tuple(leaf.shape))
        buckets.append(len(sizes))
        offsets.append(cur)
        cur += int(leaf.size)
    sizes.append(max(cur, 1))
    sizes = [-(-s // _CHUNK) * _CHUNK for s in sizes]
    return FlatSpec(treedef, tuple(shapes), tuple(buckets), tuple(offsets),
                    tuple(sizes))


def flatten_f32(tree, spec: FlatSpec) -> tuple:
    """Ravel + concatenate leaves into per-bucket padded f32 buffers."""
    leaves = jax.tree_util.tree_leaves(tree)
    out = []
    for b, size in enumerate(spec.sizes):
        parts = [leaf.reshape(-1) for leaf, lb in zip(leaves, spec.buckets)
                 if lb == b]
        filled = sum(p.shape[0] for p in parts)
        if size > filled:
            parts.append(jnp.zeros((size - filled,), jnp.float32))
        out.append(jnp.concatenate(parts))
    return tuple(out)


def unflatten(flats, spec: FlatSpec):
    leaves = [
        flats[b][off:off + math.prod(shape)].reshape(shape)
        for shape, b, off in zip(spec.shapes, spec.buckets, spec.offsets)
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
    rows = n // _LANES  # make_flat_spec pads buckets to a _CHUNK multiple
    r = min(_ROWBLK, rows)
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
    mu: tuple           # per-bucket f32 flat first moments
    nu: tuple           # per-bucket f32 flat second moments


def scale_by_adam_flat(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    eps_root: float = 0.0,
    *,
    impl: str = "xla",
) -> optax.GradientTransformation:
    """Drop-in ``optax.scale_by_adam`` with bucketed flat single-pass state.

    f32-only: callers (engine/optim.build_optimizer) fall back to the
    per-leaf optax transform when the param tree carries other dtypes.
    """

    def init_fn(params):
        spec = make_flat_spec(params)
        # mu and nu must be DISTINCT buffers: the train step donates the
        # optimizer state, and donating one buffer twice is a runtime error.
        return FlatAdamState(
            jnp.zeros([], jnp.int32),
            tuple(jnp.zeros((s,), jnp.float32) for s in spec.sizes),
            tuple(jnp.zeros((s,), jnp.float32) for s in spec.sizes),
        )

    def update_fn(updates, state, params=None):
        del params
        spec = make_flat_spec(updates)
        gs = flatten_f32(updates, spec)
        count_inc = optax.safe_increment(state.count)
        # bias_correction (optax/_src/numerics.py): 1 - decay**count in f32
        c1 = (1.0 - b1**count_inc).astype(jnp.float32)
        c2 = (1.0 - b2**count_inc).astype(jnp.float32)
        step = _adam_flat_pallas if impl == "pallas" else _adam_math
        us, mu2s, nu2s = [], [], []
        for g, mu, nu in zip(gs, state.mu, state.nu):
            u, mu2, nu2 = step(g, mu, nu, c1, c2,
                               b1=b1, b2=b2, eps=eps, eps_root=eps_root)
            us.append(u)
            mu2s.append(mu2)
            nu2s.append(nu2)
        return (unflatten(us, spec),
                FlatAdamState(count_inc, tuple(mu2s), tuple(nu2s)))

    return optax.GradientTransformation(init_fn, update_fn)
