"""Fused window-attention kernel parity (interpret mode) + gradient check."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from unittest import mock

from jax.experimental import pallas as pl

import grit_tpu.ops.window_attention as wa


def _interp_patch():
    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    return mock.patch.object(wa.pl, "pallas_call", interp)


@pytest.mark.parametrize("shape", [
    # (B, nW, h, N, d, M) — M == nW (shifted blocks) or 1 (non-shifted)
    (4, 6, 2, 16, 8, 6),
    (2, 3, 8, 16, 8, 1),
    (6, 2, 4, 8, 4, 2),
    (3, 2, 4, 16, 32, 2),   # gd == 128: single-group packing
    (2, 2, 8, 16, 32, 1),   # h > g: multiple head groups
])
def test_fused_matches_unfused(shape):
    b, nw, h, n, d, m = shape
    c = h * d
    ks = jax.random.split(jax.random.PRNGKey(b), 4)
    q = jax.random.normal(ks[0], (b, nw, n, c))
    k = jax.random.normal(ks[1], (b, nw, n, c))
    v = jax.random.normal(ks[2], (b, nw, n, c))
    bias = jax.random.normal(ks[3], (m, h, n, n))
    ref = wa._unfused(q, k, v, bias, 0.3, h)
    with _interp_patch():
        out = wa.fused_window_attention(q, k, v, bias, 0.3, h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("shape", [
    (2, 2, 2, 8, 4, 2),
    (2, 2, 8, 16, 32, 1),   # multiple head groups, shared bias
    (3, 2, 4, 16, 32, 2),   # single group, per-kind bias
])
def test_custom_vjp_matches_unfused_grads(shape):
    """Fused backward kernel vs autodiff of the unfused form — all 4 grads."""
    b, nw, h, n, d, m = shape
    c = h * d
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (b, nw, n, c))
    k = jax.random.normal(ks[1], (b, nw, n, c))
    v = jax.random.normal(ks[2], (b, nw, n, c))
    bias = jax.random.normal(ks[3], (m, h, n, n))

    def loss_fused(q_, k_, v_, b_):
        return jnp.sum(wa.fused_window_attention(q_, k_, v_, b_, 0.3, h) ** 2)

    def loss_ref(q_, k_, v_, b_):
        return jnp.sum(wa._unfused(q_, k_, v_, b_, 0.3, h) ** 2)

    with _interp_patch():
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for name, gf, gr in zip("qkvb", g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=1e-4, atol=1e-4,
            err_msg=f"grad mismatch for {name}",
        )


def test_swin_model_fused_flag_parity():
    """Tiny Swin with fused_attn on (interpret) vs off — same outputs."""
    from grit_tpu.models.swin import SwinTransformer

    # depths (2, 2): the second block of each stage is SHIFTED, covering the
    # pre-rolled + masked path of the whole-block kernel too
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 48, 3))
    m_off = SwinTransformer(embed_dim=8, depths=(2, 2), num_heads=(2, 2), window=4,
                            drop_path_rate=0.0, pos_dim=16, fused_attn=False)
    params = m_off.init(jax.random.PRNGKey(1), x)
    outs_off = m_off.apply(params, x)
    m_on = SwinTransformer(embed_dim=8, depths=(2, 2), num_heads=(2, 2), window=4,
                           drop_path_rate=0.0, pos_dim=16, fused_attn=True)
    with _interp_patch():
        outs_on = m_on.apply(params, x)
    for a, b_ in zip(outs_on, outs_off):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)


def test_fused_training_grads_with_frozen_stages():
    """Frozen Swin stages run deterministic=True during TRAINING (reference
    eval-mode freezing) — the non-differentiable whole-block kernel must NOT
    activate there (it is gated on eval_mode, threaded separately).  This
    crashed with a pallas jvp AssertionError before the eval_mode split."""
    from grit_tpu.models.swin import SwinTransformer

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 48, 3))
    mk = dict(embed_dim=8, depths=(2, 2), num_heads=(2, 2), window=4,
              drop_path_rate=0.0, pos_dim=16, frozen_stages=2)
    m_fused = SwinTransformer(**mk, fused_attn=True)
    m_plain = SwinTransformer(**mk, fused_attn=False)
    params = m_plain.init(jax.random.PRNGKey(1), x)

    def loss(m):
        def f(p):
            outs = m.apply(p, x, deterministic=False,
                           rngs={"dropout": jax.random.PRNGKey(2)})
            return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)
        return f

    with _interp_patch():
        g_fused = jax.grad(loss(m_fused))(params)   # must not crash
    g_plain = jax.grad(loss(m_plain))(params)
    # drop_rate/attn_drop are 0 -> the fused pair path is deterministic-equal
    for (p1, a), (p2, b) in zip(
        jax.tree_util.tree_flatten_with_path(g_fused)[0],
        jax.tree_util.tree_flatten_with_path(g_plain)[0],
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4, err_msg=str(p1))
