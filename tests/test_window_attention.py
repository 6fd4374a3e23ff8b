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


def test_patch_embed_s2d_parity(monkeypatch):
    """GRIT_PATCH_S2D: space-to-depth + matmul patch embed == the conv, on
    the same conv-shaped params (kernel reshaped at use), fwd AND grads."""
    import grit_tpu.models.swin as swin_mod
    from grit_tpu.models.swin import SwinTransformer

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 48, 3))
    m = SwinTransformer(embed_dim=8, depths=(2, 2), num_heads=(2, 2), window=4,
                        drop_path_rate=0.0, pos_dim=16, fused_attn=False)
    params = m.init(jax.random.PRNGKey(1), x)

    def loss(p, flag):
        monkeypatch.setattr(swin_mod, "_PATCH_S2D", flag)
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in m.apply(p, x))

    outs = {}
    grads = {}
    for flag in (False, True):
        monkeypatch.setattr(swin_mod, "_PATCH_S2D", flag)
        outs[flag] = [np.asarray(o) for o in m.apply(params, x)]
        grads[flag] = jax.grad(lambda p: loss(p, flag))(params)
    for a, b_ in zip(outs[True], outs[False]):
        np.testing.assert_allclose(a, b_, rtol=1e-4, atol=1e-5)
    ga = grads[True]["params"]["patch_embed_proj"]
    gb = grads[False]["params"]["patch_embed_proj"]
    np.testing.assert_allclose(np.asarray(ga["kernel"]), np.asarray(gb["kernel"]),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ga["bias"]), np.asarray(gb["bias"]),
                               rtol=1e-3, atol=1e-4)


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
    eval-mode freezing).  Since round 3 the whole-block/MLP kernels are
    differentiable (custom_vjp flash-style recompute backward), so they stay
    active on BOTH the frozen (deterministic) and trainable stages; grads
    must match the plain XLA formulation."""
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

@pytest.mark.parametrize("wide", [False, True])
@pytest.mark.parametrize("shape", [
    # (B, Hp, Wp, C, h, window)
    (2, 8, 12, 16, 4, 4),
    (1, 16, 8, 64, 2, 8),   # gd == 128: single-group packing
])
def test_block_attention_grads_match_composition(shape, wide, monkeypatch):
    """Whole-block kernel custom_vjp (recompute backward) vs autodiff of the
    jnp composition qkv -> partition -> attention -> proj -> reverse."""
    from grit_tpu.ops.window import window_partition, window_reverse

    monkeypatch.setattr(wa, "_WIDE", wide)

    b, hp, wp_, c, h, win = shape
    n = win * win
    nw = (hp // win) * (wp_ // win)
    ks = jax.random.split(jax.random.PRNGKey(7), 6)
    x = jax.random.normal(ks[0], (b, hp, wp_, c))
    wqkv = jax.random.normal(ks[1], (c, 3 * c)) * 0.1
    bqkv = jax.random.normal(ks[2], (3 * c,)) * 0.1
    wproj = jax.random.normal(ks[3], (c, c)) * 0.1
    bproj = jax.random.normal(ks[4], (c,)) * 0.1
    bias = jax.random.normal(ks[5], (nw, h, n, n))
    scale = (c // h) ** -0.5

    def ref(x_, wqkv_, bqkv_, wproj_, bproj_, bias_):
        xw = window_partition(x_, win).reshape(b, nw, n, c)
        qkv = xw @ wqkv_ + bqkv_
        q, k, v = qkv[..., :c], qkv[..., c:2 * c], qkv[..., 2 * c:]
        ao = wa._unfused(q, k, v, bias_, scale, h)
        out = ao @ wproj_ + bproj_
        return window_reverse(out.reshape(b * nw, n, c), win, hp, wp_)

    def fused(x_, wqkv_, bqkv_, wproj_, bproj_, bias_):
        return wa.fused_block_attention(
            x_, wqkv_, bqkv_, wproj_, bproj_, bias_,
            scale=scale, num_heads=h, window=win)

    args = (x, wqkv, bqkv, wproj, bproj, bias)
    with _interp_patch():
        out_f = fused(*args)
        g_f = jax.grad(lambda *a: jnp.sum(fused(*a) ** 2), argnums=tuple(range(6)))(*args)
    out_r = ref(*args)
    g_r = jax.grad(lambda *a: jnp.sum(ref(*a) ** 2), argnums=tuple(range(6)))(*args)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r), rtol=2e-5, atol=2e-5)
    for name, gf, gr in zip(["x", "wqkv", "bqkv", "wproj", "bproj", "bias"], g_f, g_r):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch for {name}")


@pytest.mark.parametrize("flags", [
    # (_WIDE, _BAND) kernel-variant combinations (chip A/B flags)
    (False, False), (True, False), (False, True), (True, True),
])
@pytest.mark.parametrize("case", [
    # (B, Hp, Wp, C, h, win, real_h, real_w, shift, residual)
    (2, 8, 12, 16, 4, 4, 8, 12, 0, True),      # no padding, no shift
    (2, 8, 12, 16, 4, 4, 6, 9, 0, True),       # padded map, plain windows
    (2, 8, 12, 16, 4, 4, 6, 9, 2, True),       # padded + rolled (shifted)
    (1, 16, 8, 64, 2, 8, 13, 8, 4, False),     # branch-only (drop-path mode)
])
def test_block_step_matches_reference(case, flags, monkeypatch):
    """fused_block_step (LN1 + pad masking + attention + residual in one
    kernel) vs the jnp oracle — REAL rows only (pad rows are don't-cares)."""
    monkeypatch.setattr(wa, "_WIDE", flags[0])
    monkeypatch.setattr(wa, "_BAND", flags[1])
    b, hp, wp_, c, h, win, rh, rw, shift, residual = case
    n = win * win
    nw = (hp // win) * (wp_ // win)
    ks = jax.random.split(jax.random.PRNGKey(11), 8)
    x = jax.random.normal(ks[0], (b, hp, wp_, c))
    lns = 1.0 + 0.1 * jax.random.normal(ks[1], (c,))
    lnb = 0.1 * jax.random.normal(ks[2], (c,))
    wqkv = jax.random.normal(ks[3], (c, 3 * c)) * 0.1
    bqkv = jax.random.normal(ks[4], (3 * c,)) * 0.1
    wproj = jax.random.normal(ks[5], (c, c)) * 0.1
    bproj = jax.random.normal(ks[6], (c,)) * 0.1
    bias = jax.random.normal(ks[7], (nw, h, n, n))
    kw = dict(scale=(c // h) ** -0.5, num_heads=h, window=win,
              real_hw=(rh, rw), shift=shift, residual=residual)

    ref = wa.block_step_ref(x, lns, lnb, wqkv, bqkv, wproj, bproj, bias, **kw)
    with _interp_patch():
        out = wa.fused_block_step(x, lns, lnb, wqkv, bqkv, wproj, bproj, bias, **kw)
    # compare the real region in pre-roll coordinates: token (y, x) is real
    # iff ((y+shift) mod Hp, (x+shift) mod Wp) < (rh, rw)
    yy = (np.arange(hp) + shift) % hp
    xx = (np.arange(wp_) + shift) % wp_
    real = (yy[:, None] < rh) & (xx[None, :] < rw)
    np.testing.assert_allclose(
        np.asarray(out)[:, real], np.asarray(ref)[:, real],
        rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("flags", [
    # (_WIDE, _BAND): the bwd consumes each fwd variant's save_attn output
    (False, False), (True, False), (False, True), (True, True),
])
def test_block_step_grads_match_reference(flags, monkeypatch):
    """custom_vjp backward of fused_block_step vs autodiff of the oracle,
    with padding + shift active; cotangent restricted to real rows."""
    monkeypatch.setattr(wa, "_WIDE", flags[0])
    monkeypatch.setattr(wa, "_BAND", flags[1])
    b, hp, wp_, c, h, win, rh, rw, shift = 2, 8, 12, 16, 4, 4, 6, 9, 2
    n = win * win
    nw = (hp // win) * (wp_ // win)
    ks = jax.random.split(jax.random.PRNGKey(5), 8)
    x = jax.random.normal(ks[0], (b, hp, wp_, c))
    lns = 1.0 + 0.1 * jax.random.normal(ks[1], (c,))
    lnb = 0.1 * jax.random.normal(ks[2], (c,))
    wqkv = jax.random.normal(ks[3], (c, 3 * c)) * 0.1
    bqkv = jax.random.normal(ks[4], (3 * c,)) * 0.1
    wproj = jax.random.normal(ks[5], (c, c)) * 0.1
    bproj = jax.random.normal(ks[6], (c,)) * 0.1
    bias = jax.random.normal(ks[7], (nw, h, n, n))
    kw = dict(scale=(c // h) ** -0.5, num_heads=h, window=win,
              real_hw=(rh, rw), shift=shift, residual=True)
    yy = (np.arange(hp) + shift) % hp
    xx = (np.arange(wp_) + shift) % wp_
    real = jnp.asarray((yy[:, None] < rh) & (xx[None, :] < rw))[None, :, :, None]

    def loss(fn):
        def f(*a):
            out = fn(*a, **kw)
            return jnp.sum(jnp.where(real, out, 0.0) ** 2)
        return f

    args = (x, lns, lnb, wqkv, bqkv, wproj, bproj, bias)
    with _interp_patch():
        g_f = jax.grad(loss(wa.fused_block_step), argnums=tuple(range(8)))(*args)
    g_r = jax.grad(loss(wa.block_step_ref), argnums=tuple(range(8)))(*args)
    names = ["x", "lns", "lnb", "wqkv", "bqkv", "wproj", "bproj", "bias"]
    for name, gf, gr in zip(names, g_f, g_r):
        gf, gr = np.asarray(gf), np.asarray(gr)
        if name == "x":  # pad-row input grads are don't-cares
            gf = gf[:, np.asarray(real)[0, :, :, 0]]
            gr = gr[:, np.asarray(real)[0, :, :, 0]]
        np.testing.assert_allclose(gf, gr, rtol=2e-4, atol=2e-4,
                                   err_msg=f"grad mismatch for {name}")


@pytest.mark.parametrize("wide", [False, True])
@pytest.mark.parametrize("case", [
    # (B, Hp, Wp, C, h, win, rh, rw, shift, storage_shift)
    (2, 8, 12, 16, 4, 4, 6, 9, 2, 0),    # shifted block, unrolled storage
    (2, 8, 12, 16, 4, 4, 6, 9, 0, 2),    # unshifted block, rolled storage
    (1, 16, 8, 64, 2, 8, 13, 8, 4, 0),   # single window column, wraps
    (2, 4, 8, 16, 4, 4, 4, 8, 2, 0),     # nwy == 1: both half-blocks wrap
])
def test_block_step_rollfree_matches_reference(case, wide, monkeypatch):
    """Roll-free band reads (storage_shift != shift): the kernel assembles
    the shifted band from two half-window refs + an in-VMEM column rotate
    instead of the caller jnp.roll-ing the map."""
    monkeypatch.setattr(wa, "_WIDE", wide)
    monkeypatch.setattr(wa, "_BAND", True)
    monkeypatch.setattr(wa, "_ROLLFREE", True)
    b, hp, wp_, c, h, win, rh, rw, shift, ss = case
    n = win * win
    nw = (hp // win) * (wp_ // win)
    ks = jax.random.split(jax.random.PRNGKey(7), 8)
    x = jax.random.normal(ks[0], (b, hp, wp_, c))
    lns = 1.0 + 0.1 * jax.random.normal(ks[1], (c,))
    lnb = 0.1 * jax.random.normal(ks[2], (c,))
    wqkv = jax.random.normal(ks[3], (c, 3 * c)) * 0.1
    bqkv = jax.random.normal(ks[4], (3 * c,)) * 0.1
    wproj = jax.random.normal(ks[5], (c, c)) * 0.1
    bproj = jax.random.normal(ks[6], (c,)) * 0.1
    bias = jax.random.normal(ks[7], (nw if shift else 1, h, n, n))
    kw = dict(scale=(c // h) ** -0.5, num_heads=h, window=win,
              real_hw=(rh, rw), shift=shift, residual=True,
              storage_shift=ss)

    ref = wa.block_step_ref(x, lns, lnb, wqkv, bqkv, wproj, bproj, bias, **kw)
    with _interp_patch():
        out = wa.fused_block_step(x, lns, lnb, wqkv, bqkv, wproj, bproj,
                                  bias, **kw)
    # output is in COMPUTE coords (rolled by ``shift``): token (y, x) is
    # real iff its unrolled position ((y+shift) mod Hp, (x+shift) mod Wp)
    # lies inside (rh, rw)
    yy = (np.arange(hp) + shift) % hp
    xx = (np.arange(wp_) + shift) % wp_
    real = (yy[:, None] < rh) & (xx[None, :] < rw)
    np.testing.assert_allclose(
        np.asarray(out)[:, real], np.asarray(ref)[:, real],
        rtol=2e-5, atol=2e-5)


def test_wide_core_exact_under_cross_head_spread(monkeypatch):
    """The wide layout's softmax shift must be per-head: with one head's
    scores ~200 logits above another's (driven via the bias), the weak head's
    attention must stay exact, not flatten to uniform (the old cross-head
    rowmax + exp(-60) clamp failed this)."""
    monkeypatch.setattr(wa, "_WIDE", True)
    monkeypatch.setattr(wa, "_BAND", False)
    b, hp, wp_, c, h, win = 1, 8, 8, 16, 2, 4
    n = win * win
    ks = jax.random.split(jax.random.PRNGKey(3), 8)
    x = jax.random.normal(ks[0], (b, hp, wp_, c))
    lns = jnp.ones((c,))
    lnb = jnp.zeros((c,))
    wqkv = jax.random.normal(ks[3], (c, 3 * c)) * 0.1
    bqkv = jnp.zeros((3 * c,))
    wproj = jax.random.normal(ks[5], (c, c)) * 0.1
    bproj = jnp.zeros((c,))
    bias = jax.random.normal(ks[7], (1, h, n, n))
    bias = bias.at[:, 0].add(200.0)  # head 0 dominates any cross-head max
    kw = dict(scale=(c // h) ** -0.5, num_heads=h, window=win,
              real_hw=(hp, wp_), shift=0, residual=True)
    ref = wa.block_step_ref(x, lns, lnb, wqkv, bqkv, wproj, bproj, bias, **kw)
    with _interp_patch():
        out = wa.fused_block_step(x, lns, lnb, wqkv, bqkv, wproj, bproj,
                                  bias, **kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_block_step_rollfree_grads_match_reference(monkeypatch):
    """custom_vjp backward under a roll-free forward (storage coords in,
    compute coords out) vs autodiff of the oracle."""
    monkeypatch.setattr(wa, "_WIDE", False)
    monkeypatch.setattr(wa, "_BAND", True)
    monkeypatch.setattr(wa, "_ROLLFREE", True)
    b, hp, wp_, c, h, win, rh, rw, shift, ss = 2, 8, 12, 16, 4, 4, 6, 9, 2, 0
    n = win * win
    nw = (hp // win) * (wp_ // win)
    ks = jax.random.split(jax.random.PRNGKey(9), 8)
    x = jax.random.normal(ks[0], (b, hp, wp_, c))
    lns = 1.0 + 0.1 * jax.random.normal(ks[1], (c,))
    lnb = 0.1 * jax.random.normal(ks[2], (c,))
    wqkv = jax.random.normal(ks[3], (c, 3 * c)) * 0.1
    bqkv = jax.random.normal(ks[4], (3 * c,)) * 0.1
    wproj = jax.random.normal(ks[5], (c, c)) * 0.1
    bproj = jax.random.normal(ks[6], (c,)) * 0.1
    bias = jax.random.normal(ks[7], (nw, h, n, n))
    kw = dict(scale=(c // h) ** -0.5, num_heads=h, window=win,
              real_hw=(rh, rw), shift=shift, residual=True, storage_shift=ss)
    yy = (np.arange(hp) + shift) % hp
    xx = (np.arange(wp_) + shift) % wp_
    real = jnp.asarray((yy[:, None] < rh) & (xx[None, :] < rw))[None, :, :, None]

    def loss(fn):
        def f(*a):
            out = fn(*a, **kw)
            return jnp.sum(jnp.where(real, out, 0.0) ** 2)
        return f

    args = (x, lns, lnb, wqkv, bqkv, wproj, bproj, bias)
    with _interp_patch():
        g_f = jax.grad(loss(wa.fused_block_step), argnums=tuple(range(8)))(*args)
    g_r = jax.grad(loss(wa.block_step_ref), argnums=tuple(range(8)))(*args)
    names = ["x", "lns", "lnb", "wqkv", "bqkv", "wproj", "bproj", "bias"]
    # x grads live in STORAGE coords: real iff unrolled (y+ss, x+ss) in range
    ys = (np.arange(hp) + ss) % hp
    xs = (np.arange(wp_) + ss) % wp_
    real_s = (ys[:, None] < rh) & (xs[None, :] < rw)
    for name, gf, gr in zip(names, g_f, g_r):
        gf, gr = np.asarray(gf), np.asarray(gr)
        if name == "x":  # pad-row input grads are don't-cares
            gf = gf[:, real_s]
            gr = gr[:, real_s]
        np.testing.assert_allclose(gf, gr, rtol=2e-4, atol=2e-4,
                                   err_msg=f"grad mismatch for {name}")


@pytest.mark.parametrize("flags", [
    # (_WIDE, _BAND, _ROLLFREE) — rollfree exercises the storage-convention
    # threading in BasicLayer (one unroll per stage instead of per block)
    (False, False, False), (False, True, False), (False, True, True),
    (True, True, True),
])
def test_swin_resident_mode_parity_with_padding(flags, monkeypatch):
    """Resident padded-map pipeline (fused, with pad + shifted blocks) vs the
    plain path — the end-to-end guard for fused_block_step wiring."""
    from grit_tpu.models.swin import SwinTransformer

    monkeypatch.setattr(wa, "_WIDE", flags[0])
    monkeypatch.setattr(wa, "_BAND", flags[1])
    monkeypatch.setattr(wa, "_ROLLFREE", flags[2])
    # 40x56 -> hw (10, 14) at patch 4 -> pads to (12, 16) with window 4;
    # depths (2, 2) cover shifted blocks on a padded map
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 40, 56, 3))
    mk = dict(embed_dim=8, depths=(2, 2), num_heads=(2, 2), window=4,
              drop_path_rate=0.0, pos_dim=16)
    m_off = SwinTransformer(**mk, fused_attn=False)
    params = m_off.init(jax.random.PRNGKey(1), x)
    outs_off = m_off.apply(params, x)
    m_on = SwinTransformer(**mk, fused_attn=True)
    with _interp_patch():
        outs_on = m_on.apply(params, x)
    for a, b_ in zip(outs_on, outs_off):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("band", [False, True])
def test_train_step_kernel_path_matches_plain(band, monkeypatch):
    """GRIT_TRAIN_STEP_KERNEL: the gradient path's LN1+attention half-block
    runs as one fused_block_step kernel — outputs and parameter grads must
    match the plain (fused_attn=False) path in TRAINING mode."""
    import grit_tpu.models.swin as swin_mod
    from grit_tpu.models.swin import SwinTransformer

    monkeypatch.setattr(swin_mod, "_TRAIN_STEP_KERNEL", True)
    monkeypatch.setattr(wa, "_BAND", band)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 40, 56, 3))
    mk = dict(embed_dim=8, depths=(2, 2), num_heads=(2, 2), window=4,
              drop_path_rate=0.0, pos_dim=16)
    m_off = SwinTransformer(**mk, fused_attn=False)
    params = m_off.init(jax.random.PRNGKey(1), x)
    rngs = {"dropout": jax.random.PRNGKey(2)}

    def loss(m):
        def f(p):
            outs = m.apply(p, x, deterministic=False, rngs=rngs)
            return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)
        return f

    l_off, g_off = jax.value_and_grad(loss(m_off))(params)
    m_on = SwinTransformer(**mk, fused_attn=True)
    with _interp_patch():
        l_on, g_on = jax.value_and_grad(loss(m_on))(params)
    np.testing.assert_allclose(float(l_on), float(l_off), rtol=1e-5)
    flat_on = jax.tree_util.tree_leaves_with_path(g_on)
    flat_off = {jax.tree_util.keystr(k): v
                for k, v in jax.tree_util.tree_leaves_with_path(g_off)}
    for k, v in flat_on:
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_off[jax.tree_util.keystr(k)]),
            rtol=2e-4, atol=2e-4, err_msg=f"grad mismatch for {jax.tree_util.keystr(k)}")


@pytest.mark.parametrize("residual", [True, False])
def test_fused_mlp_grads_match_reference(residual):
    """fused_mlp custom_vjp vs autodiff of LN -> fc1 -> GELU -> fc2 [+ x]."""
    c, hid, rows = 16, 64, 24
    ks = jax.random.split(jax.random.PRNGKey(3), 7)
    x = jax.random.normal(ks[0], (2, rows // 2, c))
    lns = 1.0 + 0.1 * jax.random.normal(ks[1], (c,))
    lnb = 0.1 * jax.random.normal(ks[2], (c,))
    w1 = jax.random.normal(ks[3], (c, hid)) * 0.1
    b1 = 0.1 * jax.random.normal(ks[4], (hid,))
    w2 = jax.random.normal(ks[5], (hid, c)) * 0.1
    b2 = 0.1 * jax.random.normal(ks[6], (c,))

    def ref(x_, lns_, lnb_, w1_, b1_, w2_, b2_):
        mu = jnp.mean(x_, axis=-1, keepdims=True)
        var = jnp.var(x_, axis=-1, keepdims=True)
        xn = (x_ - mu) * jax.lax.rsqrt(var + 1e-5) * lns_ + lnb_
        hmid = xn @ w1_ + b1_
        hmid = hmid * 0.5 * (1.0 + jax.lax.erf(hmid * 2 ** -0.5))
        y = hmid @ w2_ + b2_
        return x_ + y if residual else y

    def fused(*a):
        return wa.fused_mlp(*a, eps=1e-5, residual=residual)

    args = (x, lns, lnb, w1, b1, w2, b2)
    with _interp_patch():
        out_f = fused(*args)
        g_f = jax.grad(lambda *a: jnp.sum(fused(*a) ** 2), argnums=tuple(range(7)))(*args)
    out_r = ref(*args)
    g_r = jax.grad(lambda *a: jnp.sum(ref(*a) ** 2), argnums=tuple(range(7)))(*args)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r), rtol=2e-5, atol=2e-5)
    for name, gf, gr in zip(["x", "lns", "lnb", "w1", "b1", "w2", "b2"], g_f, g_r):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch for {name}")


def test_fused_ln_linear_matches_reference_and_grads():
    """fused_ln_linear (PatchMerging's norm+reduction kernel) vs
    LayerNorm -> no-bias Dense, outputs and all grads."""
    cin, cout, rows = 32, 16, 24
    ks = jax.random.split(jax.random.PRNGKey(4), 4)
    x = jax.random.normal(ks[0], (2, rows // 2, cin))
    lns = 1.0 + 0.1 * jax.random.normal(ks[1], (cin,))
    lnb = 0.1 * jax.random.normal(ks[2], (cin,))
    w = jax.random.normal(ks[3], (cin, cout)) * 0.1

    def ref(x_, lns_, lnb_, w_):
        mu = jnp.mean(x_, axis=-1, keepdims=True)
        var = jnp.var(x_, axis=-1, keepdims=True)
        xn = (x_ - mu) * jax.lax.rsqrt(var + 1e-5) * lns_ + lnb_
        return xn @ w_

    def fused(*a):
        return wa.fused_ln_linear(*a, eps=1e-5)

    args = (x, lns, lnb, w)
    with _interp_patch():
        out_f = fused(*args)
        g_f = jax.grad(lambda *a: jnp.sum(fused(*a) ** 2),
                       argnums=tuple(range(4)))(*args)
    out_r = ref(*args)
    g_r = jax.grad(lambda *a: jnp.sum(ref(*a) ** 2),
                   argnums=tuple(range(4)))(*args)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=2e-5, atol=2e-5)
    for name, gf, gr in zip(["x", "lns", "lnb", "w"], g_f, g_r):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch for {name}")


def test_fused_layernorm_matches_reference_and_grads():
    """fused_layernorm (the patch-embed norm kernel) vs nn-style LN."""
    c, rows = 32, 24
    ks = jax.random.split(jax.random.PRNGKey(6), 3)
    x = jax.random.normal(ks[0], (2, rows // 2, c))
    lns = 1.0 + 0.1 * jax.random.normal(ks[1], (c,))
    lnb = 0.1 * jax.random.normal(ks[2], (c,))

    def ref(x_, lns_, lnb_):
        mu = jnp.mean(x_, axis=-1, keepdims=True)
        var = jnp.var(x_, axis=-1, keepdims=True)
        return (x_ - mu) * jax.lax.rsqrt(var + 1e-5) * lns_ + lnb_

    def fused(*a):
        return wa.fused_layernorm(*a, eps=1e-5)

    args = (x, lns, lnb)
    with _interp_patch():
        out_f = fused(*args)
        g_f = jax.grad(lambda *a: jnp.sum(fused(*a) ** 2),
                       argnums=(0, 1, 2))(*args)
    out_r = ref(*args)
    g_r = jax.grad(lambda *a: jnp.sum(ref(*a) ** 2), argnums=(0, 1, 2))(*args)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=2e-5, atol=2e-5)
    for name, gf, gr in zip(["x", "lns", "lnb"], g_f, g_r):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch for {name}")


def test_fused_patch_merging_e2e_parity(monkeypatch):
    """Swin with GRIT_FUSED_MERGE on (fused PatchMerging + patch-embed LN
    kernels at every stage boundary) vs the plain path."""
    import grit_tpu.models.swin as swin_mod
    from grit_tpu.models.swin import SwinTransformer

    monkeypatch.setattr(swin_mod, "_FUSED_MERGE", True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 40, 56, 3))
    mk = dict(embed_dim=8, depths=(2, 2), num_heads=(2, 2), window=4,
              drop_path_rate=0.0, pos_dim=16)
    m_off = SwinTransformer(**mk, fused_attn=False)
    params = m_off.init(jax.random.PRNGKey(1), x)
    outs_off = m_off.apply(params, x)
    m_on = SwinTransformer(**mk, fused_attn=True)
    with _interp_patch():
        outs_on = m_on.apply(params, x)
    for a, b_ in zip(outs_on, outs_off):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_fast_gelu_rational_accuracy():
    """The bf16-path rational GELU vs exact erf GELU: max abs error must
    stay ~3 orders below bf16 output resolution, clamp tails included."""
    x = jnp.linspace(-10.0, 10.0, 200001, dtype=jnp.float32)
    exact = x * 0.5 * (1.0 + jax.lax.erf(x * 2 ** -0.5))
    fast = wa._gelu_fast(x)
    err = float(jnp.max(jnp.abs(fast - exact)))
    assert err < 5e-5, err
    # interior of the clamp range is tighter still
    xi = jnp.linspace(-4.4, 4.4, 200001, dtype=jnp.float32)
    err_i = float(jnp.max(jnp.abs(
        wa._gelu_fast(xi) - xi * 0.5 * (1.0 + jax.lax.erf(xi * 2 ** -0.5)))))
    assert err_i < 5e-6, err_i


def test_fused_mlp_bf16_uses_rational_gelu():
    """bf16 fused MLP (rational GELU) vs the f32 exact oracle: outputs agree
    to bf16 accumulation tolerance; flag off falls back to A&S."""
    c, hid, rows = 16, 64, 32
    ks = jax.random.split(jax.random.PRNGKey(11), 7)
    x = jax.random.normal(ks[0], (2, rows // 2, c), jnp.bfloat16)
    lns = jnp.ones((c,), jnp.bfloat16)
    lnb = jnp.zeros((c,), jnp.bfloat16)
    w1 = (jax.random.normal(ks[3], (c, hid)) * 0.1).astype(jnp.bfloat16)
    b1 = (0.1 * jax.random.normal(ks[4], (hid,))).astype(jnp.bfloat16)
    w2 = (jax.random.normal(ks[5], (hid, c)) * 0.1).astype(jnp.bfloat16)
    b2 = (0.1 * jax.random.normal(ks[6], (c,))).astype(jnp.bfloat16)

    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
    hmid = xn @ w1.astype(jnp.float32) + b1.astype(jnp.float32)
    hmid = hmid * 0.5 * (1.0 + jax.lax.erf(hmid * 2 ** -0.5))
    oracle = xf + (hmid @ w2.astype(jnp.float32) + b2.astype(jnp.float32))

    for flag in (True, False):
        with _interp_patch(), mock.patch.object(wa, "_FAST_GELU", flag):
            out = wa.fused_mlp(x, lns, lnb, w1, b1, w2, b2,
                               eps=1e-5, residual=True)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(oracle),
            rtol=0.05, atol=0.05, err_msg=f"_FAST_GELU={flag}")


def test_fused_training_grads_with_drop_path():
    """Training with stochastic depth: the fused path applies drop-path
    outside the kernels (residual=False MLP variant); grads must match the
    plain path bit-for-bit in rng stream and numerics."""
    from grit_tpu.models.swin import SwinTransformer

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16, 3))
    mk = dict(embed_dim=8, depths=(2,), num_heads=(2,), window=4,
              drop_path_rate=0.5, pos_dim=16)
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
        l_f = loss(m_fused)(params)
        g_fused = jax.grad(loss(m_fused))(params)
    l_p = loss(m_plain)(params)
    g_plain = jax.grad(loss(m_plain))(params)
    np.testing.assert_allclose(float(l_f), float(l_p), rtol=1e-5)
    for (p1, a), (p2, b) in zip(
        jax.tree_util.tree_flatten_with_path(g_fused)[0],
        jax.tree_util.tree_flatten_with_path(g_plain)[0],
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4, err_msg=str(p1))


def test_fused_ln_linear_oversized_weight_falls_back(monkeypatch):
    """A weight too large to stay VMEM-resident must take the unfused XLA
    LN+matmul path instead of scheduling a guaranteed-OOM kernel (ADVICE r3:
    the old code clamped the row block to 8 and scheduled it anyway).  On the
    CPU backend a pallas_call outside _interp_patch would raise, so merely
    producing a correct result proves the fallback engaged.  The budget is
    pinned (GRIT_WA_VMEM_MB defaults to 26 since round 5) so the fixture
    stays oversized."""
    monkeypatch.setenv("GRIT_WA_VMEM_MB", "13")
    cin, cout = 2048, 1600  # f32 weight = 13.1 MB > the 12 MB VMEM budget
    ks = jax.random.split(jax.random.PRNGKey(11), 4)
    x = jax.random.normal(ks[0], (1, 8, cin))
    lns = 1.0 + 0.1 * jax.random.normal(ks[1], (cin,))
    lnb = 0.1 * jax.random.normal(ks[2], (cin,))
    w = jax.random.normal(ks[3], (cin, cout)) * 0.02

    out = wa.fused_ln_linear(x, lns, lnb, w, eps=1e-5)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    ref = ((x - mu) * jax.lax.rsqrt(var + 1e-5) * lns + lnb) @ w
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("case", [
    # (B, Hp, Wp, C, h, win, real_h, real_w, shift)
    (2, 8, 12, 16, 4, 4, 8, 12, 0),
    (2, 8, 12, 16, 4, 4, 6, 9, 2),       # padded + shifted
])
def test_block_mlp_step_matches_separate_kernels(case, monkeypatch):
    """fused_block_mlp_step (whole Swin block in one program) must
    reproduce fused_block_step + fused_mlp exactly — the fused tail keeps
    the separate path's dtype boundaries (attention output cast to storage
    dtype before LN2)."""
    monkeypatch.setattr(wa, "_WIDE", True)
    monkeypatch.setattr(wa, "_BAND", True)
    b, hp, wp_, c, h, win, rh, rw, shift = case
    n = win * win
    nw = (hp // win) * (wp_ // win)
    hid = 2 * c
    ks = jax.random.split(jax.random.PRNGKey(13), 12)
    x = jax.random.normal(ks[0], (b, hp, wp_, c))
    lns = 1.0 + 0.1 * jax.random.normal(ks[1], (c,))
    lnb = 0.1 * jax.random.normal(ks[2], (c,))
    wqkv = jax.random.normal(ks[3], (c, 3 * c)) * 0.1
    bqkv = jax.random.normal(ks[4], (3 * c,)) * 0.1
    wproj = jax.random.normal(ks[5], (c, c)) * 0.1
    bproj = jax.random.normal(ks[6], (c,)) * 0.1
    bias = jax.random.normal(ks[7], (nw, h, n, n))
    lns2 = 1.0 + 0.1 * jax.random.normal(ks[8], (c,))
    lnb2 = 0.1 * jax.random.normal(ks[9], (c,))
    w1 = jax.random.normal(ks[10], (c, hid)) * 0.1
    b1 = jnp.zeros((hid,))
    w2 = jax.random.normal(ks[11], (hid, c)) * 0.1
    b2 = jnp.zeros((c,))
    kw = dict(scale=(c // h) ** -0.5, num_heads=h, window=win,
              real_hw=(rh, rw), shift=shift)

    assert wa.block_mlp_fusable(c, h, win, hp, wp_, nw if shift else 1,
                                hid, x.dtype.itemsize)
    with _interp_patch():
        sep = wa.fused_block_step(x, lns, lnb, wqkv, bqkv, wproj, bproj,
                                  bias, residual=True, **kw)
        sep = wa.fused_mlp(sep.reshape(b, hp * wp_, c), lns2, lnb2,
                           w1, b1, w2, b2, residual=True).reshape(
            b, hp, wp_, c)
        fused = wa.fused_block_mlp_step(
            x, lns, lnb, wqkv, bqkv, wproj, bproj, bias,
            lns2, lnb2, w1, b1, w2, b2, **kw)
    yy = (np.arange(hp) + shift) % hp
    xx = (np.arange(wp_) + shift) % wp_
    real = (yy[:, None] < rh) & (xx[None, :] < rw)
    np.testing.assert_allclose(
        np.asarray(fused)[:, real], np.asarray(sep)[:, real],
        rtol=1e-6, atol=1e-6)

    # gradients flow through the recompute VJP (vs autodiff of the oracle)
    def loss(fn, *extra):
        def inner(x_, w1_):
            out = fn(x_, lns, lnb, wqkv, bqkv, wproj, bproj, bias,
                     lns2, lnb2, w1_, b1, w2, b2, **kw)
            return jnp.sum(jnp.where(jnp.asarray(real)[None, :, :, None],
                                     out, 0.0) ** 2)
        return inner

    with _interp_patch():
        gx_f, gw1_f = jax.grad(loss(wa.fused_block_mlp_step), argnums=(0, 1))(
            x, w1)

    def ref_fn(x_, *rest, **kw_):
        return wa._block_mlp_ref(x_, *rest, kw_["scale"], kw_["num_heads"],
                                 kw_["window"], kw_["real_hw"], kw_["shift"],
                                 1e-5, kw_["shift"])

    gx_r, gw1_r = jax.grad(loss(ref_fn), argnums=(0, 1))(x, w1)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gw1_f), np.asarray(gw1_r),
                               rtol=2e-4, atol=2e-4)
