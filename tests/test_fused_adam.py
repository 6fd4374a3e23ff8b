"""Flat single-pass Adam (ops/fused_adam.py) vs optax.scale_by_adam.

The flat transform claims BIT-identical updates and moments — the math is
op-for-op optax (docstring there); these tests pin it on an irregular
pytree (mixed shapes incl. scalars and a 3-D leaf) over several steps.
"""

from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.experimental import pallas as pl

import grit_tpu.ops.fused_adam as fa
from grit_tpu.ops.fused_adam import (
    flatten_f32,
    fused_adam_impl,
    make_flat_spec,
    scale_by_adam_flat,
    unflatten,
)

B1, B2 = 0.9, 0.99  # the caption recipe's betas (caption_engine.py:18-73)


def _interp_patch():
    """Force interpret mode (CPU tests; same pattern as test_window_attention)."""
    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    return mock.patch.object(fa.pl, "pallas_call", interp)


def _tree(seed=0):
    rs = np.random.RandomState(seed)
    return {
        "dense": {"kernel": jnp.asarray(rs.randn(37, 53), jnp.float32),
                  "bias": jnp.asarray(rs.randn(53), jnp.float32)},
        "scale": jnp.asarray(rs.randn(), jnp.float32),
        "emb": jnp.asarray(rs.randn(3, 11, 7), jnp.float32),
    }


def _grads(seed):
    return jax.tree.map(
        lambda p: jnp.asarray(
            np.random.RandomState(seed + p.size).randn(*p.shape), jnp.float32
        ),
        _tree(),
    )


class TestFlatRoundtrip:
    def test_flatten_unflatten_identity(self):
        tree = _tree(3)
        spec = make_flat_spec(tree)
        back = unflatten(flatten_f32(tree, spec), spec)
        for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(back)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_bucketed_roundtrip_and_parity(self):
        """Small bucket_elems splits the tree into several buckets (the
        OOM fix: one whole-model concat forced every grad live at the
        backward peak); the roundtrip and the update stay bit-equal."""
        tree = _tree(5)
        spec = make_flat_spec(tree, bucket_elems=512)
        assert len(spec.sizes) > 1
        back = unflatten(flatten_f32(tree, spec), spec)
        for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(back)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # update parity under forced multi-bucket layout
        ref_tx = optax.scale_by_adam(b1=B1, b2=B2)
        flat_tx = scale_by_adam_flat(b1=B1, b2=B2, impl="xla")
        with mock.patch.object(fa, "_BUCKET_ELEMS", 512):
            fs = flat_tx.init(tree)
            assert len(fs.mu) > 1
            ru, _ = ref_tx.update(_grads(2), ref_tx.init(tree))
            fu, _ = flat_tx.update(_grads(2), fs)
        for a, b in zip(jax.tree.leaves(ru), jax.tree.leaves(fu)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestOptaxParity:
    @pytest.mark.parametrize("impl", ["xla", "pallas"])
    def test_updates_bit_equal_over_steps(self, impl):
        if impl == "pallas":
            with _interp_patch():
                self._run(impl)
        else:
            self._run(impl)

    def _run(self, impl):
        ref_tx = optax.scale_by_adam(b1=B1, b2=B2)
        flat_tx = scale_by_adam_flat(b1=B1, b2=B2, impl=impl)
        params = _tree()
        ref_state, flat_state = ref_tx.init(params), flat_tx.init(params)

        @jax.jit
        def both(g, rs, fs):
            ru, rs = ref_tx.update(g, rs)
            fu, fs = flat_tx.update(g, fs)
            return ru, rs, fu, fs

        for step in range(4):
            g = _grads(step)
            ru, ref_state, fu, flat_state = both(g, ref_state, flat_state)
            for a, b in zip(jax.tree.leaves(ru), jax.tree.leaves(fu)):
                np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b),
                    err_msg=f"impl={impl} step={step}",
                )
        # moments match too (flat buffers sliced back to leaves)
        spec = make_flat_spec(params)
        for role, flat in (("mu", flat_state.mu), ("nu", flat_state.nu)):
            got = unflatten(flat, spec)
            want = getattr(ref_state, role)
            for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_build_optimizer_env_switch(self, monkeypatch):
        """GRIT_FUSED_ADAM=xla routes build_optimizer to the flat transform
        and the end state (updates) stays bit-equal to the default."""
        from grit_tpu.engine.optim import build_optimizer

        params = _tree()
        g = _grads(9)

        monkeypatch.delenv("GRIT_FUSED_ADAM", raising=False)
        tx0, _ = build_optimizer(params, beta_1=B1, beta_2=B2)
        u0, _ = tx0.update(g, tx0.init(params))

        monkeypatch.setenv("GRIT_FUSED_ADAM", "xla")
        tx1, _ = build_optimizer(params, beta_1=B1, beta_2=B2)
        u1, _ = tx1.update(g, tx1.init(params))

        for a, b in zip(jax.tree.leaves(u0), jax.tree.leaves(u1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_mixed_dtype_tree_falls_back(self, monkeypatch):
        from grit_tpu.engine.optim import build_optimizer

        params = {"a": jnp.ones((4, 4), jnp.float32),
                  "b": jnp.ones((4,), jnp.bfloat16)}
        monkeypatch.setenv("GRIT_FUSED_ADAM", "xla")
        tx, _ = build_optimizer(params)
        state = tx.init(params)
        # optax fallback: state carries the per-leaf ScaleByAdamState pytree
        assert any(
            getattr(s, "mu", None) is not None and isinstance(s.mu, dict)
            for s in state
        )


class TestDonation:
    def test_state_donates_cleanly(self):
        """mu and nu must be distinct buffers: the train step donates the
        optimizer state, and XLA rejects donating one buffer twice (the
        CPU e2e drive crashed on exactly this before init_fn was fixed)."""
        tx = scale_by_adam_flat(b1=B1, b2=B2, impl="xla")
        params = _tree()
        state = tx.init(params)

        step = jax.jit(lambda g, s: tx.update(g, s), donate_argnums=(1,))
        u, s2 = step(_grads(1), state)  # raises on double donation
        assert jax.tree.leaves(u)


class TestImplResolver:
    def test_values(self, monkeypatch):
        for raw, want in (("", "off"), ("off", "off"), ("0", "off"),
                          ("1", "xla"), ("xla", "xla"), ("pallas", "pallas")):
            monkeypatch.setenv("GRIT_FUSED_ADAM", raw)
            assert fused_adam_impl() == want
        monkeypatch.setenv("GRIT_FUSED_ADAM", "bogus")
        with pytest.raises(ValueError):
            fused_adam_impl()
