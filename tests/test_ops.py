"""Unit tests for grit_tpu.ops: posemb, window helpers, MSDA.

The MSDA parity test mirrors the reference's native-op test strategy
(reference: models/ops/test.py:31-86 — forward allclose vs a
``F.grid_sample`` oracle + gradcheck) using torch-CPU as the oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grit_tpu.ops.msda import ms_deform_attn, ms_deform_attn_reference
from grit_tpu.ops.posemb import masked_sin_pos_encoding, sinusoid_encoding_table
from grit_tpu.ops.window import (
    relative_position_index,
    shifted_window_mask,
    window_partition,
    window_reverse,
)


class TestPosEmb:
    def test_sinusoid_matches_closed_form(self):
        tab = np.asarray(sinusoid_encoding_table(55, 512, padding_idx=0))
        assert tab.shape == (55, 512)
        assert np.all(tab[0] == 0)
        # spot-check position 3, channel pair 10
        i = 10
        angle = 3 / 10000 ** (2 * i / 512)
        assert np.isclose(tab[3, 2 * i], np.sin(angle), atol=1e-6)
        assert np.isclose(tab[3, 2 * i + 1], np.cos(angle), atol=1e-6)

    def test_masked_sin_shapes(self):
        mask = jnp.zeros((2, 8, 10), bool).at[:, 6:, :].set(True)
        pos = masked_sin_pos_encoding(mask, 256)
        assert pos.shape == (2, 8, 10, 256)
        # y channel at last valid row ~ sin/cos(2*pi*...) — just check finite & bounded
        assert np.all(np.abs(np.asarray(pos)) <= 1.0 + 1e-6)


class TestWindow:
    def test_partition_reverse_roundtrip(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 24, 36, 16))
        win = window_partition(x, 12)
        assert win.shape == (2 * 2 * 3, 144, 16)
        back = window_reverse(win, 12, 24, 36)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x))

    def test_relative_position_index_range(self):
        idx = relative_position_index((12, 12))
        assert idx.shape == (144, 144)
        assert idx.min() >= 0 and idx.max() < 23 * 23
        # symmetry: idx[i, j] of (di, dj) mirrors idx[j, i] of (-di, -dj)
        assert idx[0, 143] + idx[143, 0] == 2 * ((11 + 11) * 23 + 22) // 2 * 1  # both extremes sum

    def test_shifted_mask_blocks(self):
        m = shifted_window_mask(24, 24, 12, 6)
        assert m.shape == (4, 144, 144)
        # first window (interior) should be fully visible
        assert np.all(m[0] == 0)
        # last window mixes 4 regions -> has masked pairs
        assert np.any(m[-1] == -100.0)


def _torch_msda_oracle(value, shapes, loc, weights):
    """Oracle via torch grid_sample (the documented semantics of the CUDA op)."""
    import torch
    import torch.nn.functional as F

    value = torch.tensor(np.asarray(value))
    loc = torch.tensor(np.asarray(loc))
    weights = torch.tensor(np.asarray(weights))
    n, s, m, d = value.shape
    _, lq, _, nl, np_, _ = loc.shape
    splits = [h * w for h, w in shapes]
    vals = value.split(splits, dim=1)
    grids = 2 * loc - 1
    sampled = []
    for lid, (h, w) in enumerate(shapes):
        v = vals[lid].flatten(2).transpose(1, 2).reshape(n * m, d, h, w)
        g = grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)  # [N*M, Lq, P, 2]
        sampled.append(
            F.grid_sample(v, g, mode="bilinear", padding_mode="zeros", align_corners=False)
        )
    w_ = weights.transpose(1, 2).reshape(n * m, 1, lq, nl * np_)
    out = (torch.stack(sampled, dim=-2).flatten(-2) * w_).sum(-1).view(n, m * d, lq)
    return out.transpose(1, 2).numpy()


@pytest.fixture(scope="module")
def msda_inputs():
    shapes = ((6, 4), (3, 2), (2, 2))
    s = sum(h * w for h, w in shapes)
    n, m, d, lq, p = 2, 4, 16, 8, 3
    k = jax.random.PRNGKey(42)
    k1, k2, k3 = jax.random.split(k, 3)
    value = jax.random.normal(k1, (n, s, m, d), jnp.float32)
    loc = jax.random.uniform(k2, (n, lq, m, len(shapes), p, 2), minval=-0.2, maxval=1.2)
    w = jax.nn.softmax(
        jax.random.normal(k3, (n, lq, m, len(shapes), p)).reshape(n, lq, m, -1), -1
    ).reshape(n, lq, m, len(shapes), p)
    return value, shapes, loc, w


class TestMSDA:
    def test_reference_vs_torch_oracle(self, msda_inputs):
        value, shapes, loc, w = msda_inputs
        ours = np.asarray(ms_deform_attn_reference(value, shapes, loc, w))
        oracle = _torch_msda_oracle(value, shapes, loc, w)
        np.testing.assert_allclose(ours, oracle, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("impl", ["xla", "flat", "window"])
    def test_fused_matches_reference(self, msda_inputs, impl):
        value, shapes, loc, w = msda_inputs
        ref = np.asarray(ms_deform_attn_reference(value, shapes, loc, w))
        fused = np.asarray(ms_deform_attn(value, shapes, loc, w, impl=impl))
        np.testing.assert_allclose(fused, ref, rtol=1e-5, atol=1e-5)

    def test_grads_match_finite_differences(self, msda_inputs):
        value, shapes, loc, w = msda_inputs

        def loss(v, l, a):
            return jnp.sum(ms_deform_attn(v, shapes, l, a) ** 2)

        g_v, g_l, g_a = jax.grad(loss, argnums=(0, 1, 2))(value, loc, w)
        # directional finite difference for each input
        key = jax.random.PRNGKey(7)
        for g, x, name in [(g_v, value, "value"), (g_l, loc, "loc"), (g_a, w, "attn")]:
            key, sub = jax.random.split(key)
            direction = jax.random.normal(sub, x.shape)
            eps = 1e-3
            if name == "loc":
                # keep away from bilinear-cell boundaries where grad is discontinuous
                eps = 1e-4
            f_plus = loss(*(x + eps * direction if nm == name else inp
                            for inp, nm in [(value, "value"), (loc, "loc"), (w, "attn")]))
            f_minus = loss(*(x - eps * direction if nm == name else inp
                             for inp, nm in [(value, "value"), (loc, "loc"), (w, "attn")]))
            fd = (f_plus - f_minus) / (2 * eps)
            analytic = jnp.sum(g * direction)
            np.testing.assert_allclose(float(analytic), float(fd), rtol=2e-2, atol=1e-2)

    def test_pallas_kernel_matches_reference_interpret(self, msda_inputs):
        """Pallas kernel vs oracle in interpreter mode (compiled-TPU parity is
        exercised on hardware; see grit_tpu/ops/msda_pallas.py)."""
        from unittest import mock

        from jax.experimental import pallas as pl

        import grit_tpu.ops.msda_pallas as mp

        value, shapes, loc, w = msda_inputs
        ref = np.asarray(ms_deform_attn_reference(value, shapes, loc, w))
        orig = pl.pallas_call

        def interp(*a, **kw):
            kw["interpret"] = True
            return orig(*a, **kw)

        with mock.patch.object(mp.pl, "pallas_call", interp):
            out = np.asarray(mp.ms_deform_attn_pallas(value, shapes, loc, w))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_pallas_kernel_grads(self, msda_inputs):
        """Pallas selector-transpose backward matches direct autodiff of the
        XLA formulation for ALL of (value, loc, attn)."""
        from unittest import mock

        from jax.experimental import pallas as pl

        import grit_tpu.ops.msda_pallas as mp

        value, shapes, loc, w = msda_inputs
        orig = pl.pallas_call

        def interp(*a, **kw):
            kw["interpret"] = True
            return orig(*a, **kw)

        with mock.patch.object(mp.pl, "pallas_call", interp):
            g_p = jax.grad(
                lambda v, l, a: jnp.sum(
                    mp.ms_deform_attn_pallas(v, shapes, l, a) ** 2
                ),
                argnums=(0, 1, 2),
            )(value, loc, w)
        g_x = jax.grad(
            lambda v, l, a: jnp.sum(ms_deform_attn(v, shapes, l, a) ** 2),
            argnums=(0, 1, 2),
        )(value, loc, w)
        for name, gp, gx in zip(["value", "loc", "attn"], g_p, g_x):
            np.testing.assert_allclose(
                np.asarray(gp), np.asarray(gx), rtol=1e-4, atol=1e-5,
                err_msg=f"grad mismatch for {name}",
            )

    def test_pallas_v4_relaid_matches_reference_interpret(self, msda_inputs, monkeypatch):
        """The v4 relaid-slab kernel (natural [N, S_pad, C] value layout, one
        program per image, in-kernel head pairs) vs the oracle.  The fixture's
        level sizes (24, 6, 4) are NOT all multiples of 8, so this also
        exercises the hoisted relay path."""
        monkeypatch.setenv("GRIT_MSDA_V5", "0")  # pin the v4 layout under test
        from unittest import mock

        from jax.experimental import pallas as pl

        import grit_tpu.ops.msda_pallas as mp

        value, shapes, loc, w = msda_inputs
        n, s, m, d = value.shape
        ref = np.asarray(ms_deform_attn_reference(value, shapes, loc, w))
        orig = pl.pallas_call

        def interp(*a, **kw):
            kw["interpret"] = True
            return orig(*a, **kw)

        assert mp.needs_relay(shapes)
        relaid = mp.relay_value(value.reshape(n, s, m * d), shapes)
        with mock.patch.object(mp.pl, "pallas_call", interp):
            out = np.asarray(
                mp.ms_deform_attn_pallas_relaid(relaid, shapes, loc, w)
            )
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_pallas_v4_corner_weight_padding_mask(self, msda_inputs, monkeypatch):
        """real_hw corner-weight masking == pre-masking the value slab (the
        reference's padded-position zeroing), exercised with a nontrivial
        per-image pad rectangle at every level."""
        monkeypatch.setenv("GRIT_MSDA_V5", "0")  # pin the v4 layout under test
        from unittest import mock

        from jax.experimental import pallas as pl

        import grit_tpu.ops.msda_pallas as mp

        value, shapes, loc, w = msda_inputs
        n, s, m, d = value.shape
        # real dims: image 0 loses 2 rows/1 col at level 0, etc.; image 1 unpadded
        real = np.array(
            [[[h - min(2, h - 1), wd - 1] for h, wd in shapes],
             [[h, wd] for h, wd in shapes]], np.int32
        )  # [N, L, 2]
        # oracle: zero padded positions of value, then reference MSDA
        vm = np.asarray(value).copy()
        off = 0
        for lvl, (h, wd) in enumerate(shapes):
            grid = vm[:, off:off + h * wd].reshape(n, h, wd, m, d)
            for i in range(n):
                rh, rw = real[i, lvl]
                grid[i, rh:, :, :, :] = 0.0
                grid[i, :, rw:, :, :] = 0.0
            off += h * wd
        ref = np.asarray(ms_deform_attn_reference(jnp.asarray(vm), shapes, loc, w))

        relaid = mp.relay_value(value.reshape(n, s, m * d), shapes)  # UNMASKED
        orig = pl.pallas_call

        def interp(*a, **kw):
            kw["interpret"] = True
            return orig(*a, **kw)

        with mock.patch.object(mp.pl, "pallas_call", interp):
            out = np.asarray(mp.ms_deform_attn_pallas_relaid(
                relaid, shapes, loc, w, real_hw=jnp.asarray(real)))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_pallas_v4_aligned_no_relay(self, msda_inputs, monkeypatch):
        """When every level size is a multiple of 8 the relay is an identity
        (the production 384x640 pyramid case) and parity still holds."""
        monkeypatch.setenv("GRIT_MSDA_V5", "0")  # pin the v4 layout under test
        from unittest import mock

        from jax.experimental import pallas as pl

        import grit_tpu.ops.msda_pallas as mp

        value, _, loc, w = msda_inputs
        shapes = ((4, 4), (2, 4), (2, 4))  # 16 + 8 + 8 rows, all multiples of 8
        n, s0, m, d = value.shape
        s = sum(h * w for h, w in shapes)
        val = value[:, :s]
        assert not mp.needs_relay(shapes)
        # identity: relay returns the input object untouched
        flat = val.reshape(n, s, m * d)
        assert mp.relay_value(flat, shapes) is flat
        ref = np.asarray(ms_deform_attn_reference(val, shapes, loc, w))
        orig = pl.pallas_call

        def interp(*a, **kw):
            kw["interpret"] = True
            return orig(*a, **kw)

        with mock.patch.object(mp.pl, "pallas_call", interp):
            out = np.asarray(mp.ms_deform_attn_pallas_relaid(flat, shapes, loc, w))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_pallas_v4_grads(self, msda_inputs, monkeypatch):
        """v4 backward kernel (pair-merged dValue, masked-half dW) matches
        direct autodiff of the XLA formulation through the relay."""
        monkeypatch.setenv("GRIT_MSDA_V5", "0")  # pin the v4 layout under test
        from unittest import mock

        from jax.experimental import pallas as pl

        import grit_tpu.ops.msda_pallas as mp

        value, shapes, loc, w = msda_inputs
        n, s, m, d = value.shape
        orig = pl.pallas_call

        def interp(*a, **kw):
            kw["interpret"] = True
            return orig(*a, **kw)

        def loss_v4(v, l, a):
            relaid = mp.relay_value(v.reshape(n, s, m * d), shapes)
            return jnp.sum(mp.ms_deform_attn_pallas_relaid(relaid, shapes, l, a) ** 2)

        with mock.patch.object(mp.pl, "pallas_call", interp):
            g_p = jax.grad(loss_v4, argnums=(0, 1, 2))(value, loc, w)
        g_x = jax.grad(
            lambda v, l, a: jnp.sum(ms_deform_attn(v, shapes, l, a) ** 2),
            argnums=(0, 1, 2),
        )(value, loc, w)
        for name, gp, gx in zip(["value", "loc", "attn"], g_p, g_x):
            np.testing.assert_allclose(
                np.asarray(gp), np.asarray(gx), rtol=1e-4, atol=1e-5,
                err_msg=f"grad mismatch for {name}",
            )

    def test_relaid_dispatcher_non_pallas(self, msda_inputs):
        """ms_deform_attn_relaid with a non-pallas impl un-relays and matches."""
        from grit_tpu.ops.msda import ms_deform_attn_relaid
        from grit_tpu.ops.msda_pallas import relay_value

        value, shapes, loc, w = msda_inputs
        n, s, m, d = value.shape
        ref = np.asarray(ms_deform_attn_reference(value, shapes, loc, w))
        relaid = relay_value(value.reshape(n, s, m * d), shapes)
        out = np.asarray(ms_deform_attn_relaid(relaid, shapes, loc, w, m, impl="flat"))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_pallas_v5_matches_reference_interpret(self, msda_inputs, monkeypatch):
        """v5 separable-selection kernel vs the oracle: the fixture widths
        (4, 2, 2) all pad to Wp=8, exercising the row-padded relay, the
        pad-column -1 taps, and the x0+1==W ceil-tap edge."""
        from unittest import mock

        from jax.experimental import pallas as pl

        import grit_tpu.ops.msda_pallas as mp

        monkeypatch.setenv("GRIT_MSDA_V5", "1")
        value, shapes, loc, w = msda_inputs
        n, s, m, d = value.shape
        ref = np.asarray(ms_deform_attn_reference(value, shapes, loc, w))
        assert mp.needs_relay(shapes)
        relaid = mp.relay_value(value.reshape(n, s, m * d), shapes)
        assert relaid.shape[1] == mp._spans_v5(shapes)[2]
        orig = pl.pallas_call

        def interp(*a, **kw):
            kw["interpret"] = True
            return orig(*a, **kw)

        with mock.patch.object(mp.pl, "pallas_call", interp):
            out = np.asarray(mp.ms_deform_attn_pallas_relaid(relaid, shapes, loc, w))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
        # and the relay round-trips
        back = np.asarray(mp.unrelay_value(relaid, shapes))
        np.testing.assert_array_equal(
            back, np.asarray(value.reshape(n, s, m * d)))

    def test_pallas_v5_corner_weight_padding_mask(self, msda_inputs, monkeypatch):
        """v5 real_hw masking (invalid taps -> -1) == pre-masking the value
        slab, with a nontrivial per-image pad rectangle at every level."""
        from unittest import mock

        from jax.experimental import pallas as pl

        import grit_tpu.ops.msda_pallas as mp

        monkeypatch.setenv("GRIT_MSDA_V5", "1")
        value, shapes, loc, w = msda_inputs
        n, s, m, d = value.shape
        real = np.array(
            [[[h - min(2, h - 1), wd - 1] for h, wd in shapes],
             [[h, wd] for h, wd in shapes]], np.int32
        )  # [N, L, 2]
        vm = np.asarray(value).copy()
        off = 0
        for lvl, (h, wd) in enumerate(shapes):
            grid = vm[:, off:off + h * wd].reshape(n, h, wd, m, d)
            for i in range(n):
                rh, rw = real[i, lvl]
                grid[i, rh:, :, :, :] = 0.0
                grid[i, :, rw:, :, :] = 0.0
            off += h * wd
        ref = np.asarray(ms_deform_attn_reference(jnp.asarray(vm), shapes, loc, w))

        relaid = mp.relay_value(value.reshape(n, s, m * d), shapes)  # UNMASKED
        orig = pl.pallas_call

        def interp(*a, **kw):
            kw["interpret"] = True
            return orig(*a, **kw)

        with mock.patch.object(mp.pl, "pallas_call", interp):
            out = np.asarray(mp.ms_deform_attn_pallas_relaid(
                relaid, shapes, loc, w, real_hw=jnp.asarray(real)))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_pallas_v5_grads(self, msda_inputs, monkeypatch):
        """v5 backward (v4 selector-transpose kernel on v5-stride corner
        form; zero cotangents for the separable operands) matches direct
        autodiff of the XLA formulation for ALL of (value, loc, attn)."""
        from unittest import mock

        from jax.experimental import pallas as pl

        import grit_tpu.ops.msda_pallas as mp

        monkeypatch.setenv("GRIT_MSDA_V5", "1")
        value, shapes, loc, w = msda_inputs
        n, s, m, d = value.shape
        orig = pl.pallas_call

        def interp(*a, **kw):
            kw["interpret"] = True
            return orig(*a, **kw)

        def loss_v5(v, l, a):
            relaid = mp.relay_value(v.reshape(n, s, m * d), shapes)
            return jnp.sum(mp.ms_deform_attn_pallas_relaid(relaid, shapes, l, a) ** 2)

        with mock.patch.object(mp.pl, "pallas_call", interp):
            g_p = jax.grad(loss_v5, argnums=(0, 1, 2))(value, loc, w)
        g_x = jax.grad(
            lambda v, l, a: jnp.sum(ms_deform_attn(v, shapes, l, a) ** 2),
            argnums=(0, 1, 2),
        )(value, loc, w)
        for name, gp, gx in zip(["value", "loc", "attn"], g_p, g_x):
            np.testing.assert_allclose(
                np.asarray(gp), np.asarray(gx), rtol=1e-4, atol=1e-5,
                err_msg=f"grad mismatch for {name}",
            )

    def test_pallas_v5_chunked_matches_reference_interpret(
        self, msda_inputs, monkeypatch
    ):
        """S-chunked v5 (per-level calls, row-chunk grid) vs the oracle.

        A tiny chunk budget forces hr=1 so every level splits into multiple
        row chunks (level 0 of the fixture runs 6 chunks), exercising the
        revisited-output accumulation and the chunk-offset iota compares."""
        from unittest import mock

        from jax.experimental import pallas as pl

        import grit_tpu.ops.msda_pallas as mp

        monkeypatch.setenv("GRIT_MSDA_V5", "1")
        monkeypatch.setenv("GRIT_MSDA_CHUNKED", "force")
        monkeypatch.setenv("GRIT_MSDA_CHUNK_VMEM_MB", "0.005")
        value, shapes, loc, w = msda_inputs
        n, s, m, d = value.shape
        assert mp._chunk_plan_v5s(shapes[0][0], 8, 8)[1] > 1
        ref = np.asarray(ms_deform_attn_reference(value, shapes, loc, w))
        relaid = mp.relay_value(value.reshape(n, s, m * d), shapes)
        orig = pl.pallas_call

        def interp(*a, **kw):
            kw["interpret"] = True
            return orig(*a, **kw)

        with mock.patch.object(mp.pl, "pallas_call", interp):
            out = np.asarray(mp.ms_deform_attn_pallas_relaid(relaid, shapes, loc, w))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_pallas_v5_chunked_corner_weight_padding_mask(
        self, msda_inputs, monkeypatch
    ):
        """Chunked real_hw masking == pre-masking the value slab."""
        from unittest import mock

        from jax.experimental import pallas as pl

        import grit_tpu.ops.msda_pallas as mp

        monkeypatch.setenv("GRIT_MSDA_V5", "1")
        monkeypatch.setenv("GRIT_MSDA_CHUNKED", "force")
        monkeypatch.setenv("GRIT_MSDA_CHUNK_VMEM_MB", "0.005")
        value, shapes, loc, w = msda_inputs
        n, s, m, d = value.shape
        real = np.array(
            [[[h - min(2, h - 1), wd - 1] for h, wd in shapes],
             [[h, wd] for h, wd in shapes]], np.int32
        )
        vm = np.asarray(value).copy()
        off = 0
        for lvl, (h, wd) in enumerate(shapes):
            grid = vm[:, off:off + h * wd].reshape(n, h, wd, m, d)
            for i in range(n):
                rh, rw = real[i, lvl]
                grid[i, rh:, :, :, :] = 0.0
                grid[i, :, rw:, :, :] = 0.0
            off += h * wd
        ref = np.asarray(ms_deform_attn_reference(jnp.asarray(vm), shapes, loc, w))

        relaid = mp.relay_value(value.reshape(n, s, m * d), shapes)  # UNMASKED
        orig = pl.pallas_call

        def interp(*a, **kw):
            kw["interpret"] = True
            return orig(*a, **kw)

        with mock.patch.object(mp.pl, "pallas_call", interp):
            out = np.asarray(mp.ms_deform_attn_pallas_relaid(
                relaid, shapes, loc, w, real_hw=jnp.asarray(real)))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_pallas_v5_chunked_grads(self, msda_inputs, monkeypatch):
        """Chunked backward (per-level selector-transpose, dval written once
        per chunk, dW accumulated across chunks) matches direct autodiff of
        the XLA formulation for ALL of (value, loc, attn)."""
        from unittest import mock

        from jax.experimental import pallas as pl

        import grit_tpu.ops.msda_pallas as mp

        monkeypatch.setenv("GRIT_MSDA_V5", "1")
        monkeypatch.setenv("GRIT_MSDA_CHUNKED", "force")
        monkeypatch.setenv("GRIT_MSDA_CHUNK_VMEM_MB", "0.005")
        value, shapes, loc, w = msda_inputs
        n, s, m, d = value.shape
        orig = pl.pallas_call

        def interp(*a, **kw):
            kw["interpret"] = True
            return orig(*a, **kw)

        def loss_chunked(v, l, a):
            relaid = mp.relay_value(v.reshape(n, s, m * d), shapes)
            return jnp.sum(mp.ms_deform_attn_pallas_relaid(relaid, shapes, l, a) ** 2)

        with mock.patch.object(mp.pl, "pallas_call", interp):
            g_p = jax.grad(loss_chunked, argnums=(0, 1, 2))(value, loc, w)
        g_x = jax.grad(
            lambda v, l, a: jnp.sum(ms_deform_attn(v, shapes, l, a) ** 2),
            argnums=(0, 1, 2),
        )(value, loc, w)
        for name, gp, gx in zip(["value", "loc", "attn"], g_p, g_x):
            np.testing.assert_allclose(
                np.asarray(gp), np.asarray(gx), rtol=1e-4, atol=1e-5,
                err_msg=f"grad mismatch for {name}",
            )

    def test_grit_sizes_smoke(self):
        # GRIT production sizes: L=4 levels of a 384x640 image, M=8, D=64, Lq=150
        shapes = ((48, 80), (24, 40), (12, 20), (6, 10))
        s = sum(h * w for h, w in shapes)
        n, m, d, lq, p = 2, 8, 64, 150, 4
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
        value = jax.random.normal(k1, (n, s, m, d))
        loc = jax.random.uniform(k2, (n, lq, m, 4, p, 2))
        w = jnp.full((n, lq, m, 4, p), 1.0 / 16)
        out = ms_deform_attn(value, shapes, loc, w)
        assert out.shape == (n, lq, m * d)
        assert np.isfinite(np.asarray(out)).all()
