"""Numerical parity: converted reference torch weights -> identical outputs.

These tests import the reference PyTorch modules (CPU, eval mode), randomly
initialize them, convert their ``state_dict`` with ``grit_tpu.convert``, and
check our flax modules produce the same outputs — the end-to-end guarantee
behind checkpoint-conversion fidelity (incl. the fc_alpha1 gate bug, post-LN
ordering, LN eps, exact GELU).

The reference imports ``timm.models.layers`` (absent here); a minimal stub
(DropPath/to_2tuple/trunc_normal_) is installed before import.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
HAVE_REF = os.path.isdir(os.path.join(REF, "models"))

torch = pytest.importorskip("torch")


def _install_timm_stub():
    if "timm" in sys.modules:
        return
    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")

    class DropPath(torch.nn.Module):
        def __init__(self, p=0.0):
            super().__init__()

        def forward(self, x):
            return x

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(tensor, std=1.0, **kw):
        with torch.no_grad():
            tensor.normal_(0, std).clamp_(-2 * std, 2 * std)
        return tensor

    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    models.layers = layers
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers


@pytest.fixture(scope="module")
def ref_path():
    _install_timm_stub()
    sys.path.insert(0, REF)
    yield
    sys.path.remove(REF)


def to_jax_params(module: "torch.nn.Module") -> dict:
    from grit_tpu.convert import state_dict_to_params

    sd = {k: v.detach().numpy() for k, v in module.state_dict().items()}
    return state_dict_to_params(sd)


@pytest.mark.skipif(not HAVE_REF, reason="reference checkout unavailable")
class TestGridNetParity(object):
    def test_outputs_match(self, ref_path):
        from models.caption.grid_net import GridFeatureNetwork as TorchGridNet

        import jax.numpy as jnp

        from grit_tpu.models.grid_net import GridFeatureNetwork

        torch.manual_seed(0)
        tm = TorchGridNet(n_layers=2, d_in=24, d_model=16, n_heads=4, d_ff=32,
                          dropout=0.0).eval()
        x = torch.randn(2, 5, 24)
        with torch.no_grad():
            ref_out, _ = tm(x, None)

        ours = GridFeatureNetwork(n_layers=2, d_in=24, d_model=16, n_heads=4, d_ff=32)
        params = {"params": to_jax_params(tm)}
        out, _ = ours.apply(params, jnp.asarray(x.numpy()))
        np.testing.assert_allclose(
            np.asarray(out), ref_out.numpy(), rtol=1e-4, atol=1e-5
        )


@pytest.mark.skipif(not HAVE_REF, reason="reference checkout unavailable")
class TestCapGeneratorParity:
    def test_teacher_forced_match_incl_alpha_bug(self, ref_path):
        from models.caption.cap_generator import CaptionGenerator as TorchGen

        import jax.numpy as jnp

        from grit_tpu.models.cap_generator import CaptionGenerator

        torch.manual_seed(1)
        tm = TorchGen(vocab_size=30, max_len=20, n_layers=2, pad_idx=1,
                      d_model=16, n_heads=4, d_ff=32, dropout=0.0).eval()
        seq = torch.tensor([[2, 5, 6, 3, 1, 1], [2, 7, 8, 9, 3, 1]])
        gri = torch.randn(2, 7, 16)
        reg = torch.randn(2, 4, 16)
        vis_t = {
            "gri_feat": gri,
            "reg_feat": reg,
            "gri_mask": torch.zeros(2, 1, 1, 7, dtype=torch.bool),
            "reg_mask": torch.zeros(2, 1, 1, 4, dtype=torch.bool),
        }
        with torch.no_grad():
            ref_out = tm(seq, vis_t)

        ours = CaptionGenerator(
            vocab_size=30, max_len=20, n_layers=2, pad_idx=1,
            d_model=16, n_heads=4, d_ff=32,
        )
        params = {"params": to_jax_params(tm)}
        vis_j = {
            "gri_feat": jnp.asarray(gri.numpy()),
            "reg_feat": jnp.asarray(reg.numpy()),
            "gri_mask": jnp.zeros((2, 1, 1, 7), bool),
            "reg_mask": jnp.zeros((2, 1, 1, 4), bool),
        }
        out = ours.apply(params, jnp.asarray(seq.numpy()), vis_j)
        np.testing.assert_allclose(
            np.asarray(out), ref_out.numpy(), rtol=1e-4, atol=1e-4
        )


@pytest.mark.skipif(not HAVE_REF, reason="reference checkout unavailable")
class TestSwinParity:
    def test_tiny_swin_outputs_match(self, ref_path):
        from models.common.swin_model import SwinTransformer as TorchSwin

        import jax.numpy as jnp

        from grit_tpu.models.swin import SwinTransformer

        torch.manual_seed(2)
        tm = TorchSwin(
            embed_dim=8, depths=[1, 1], num_heads=[2, 2], window_size=4,
            drop_path_rate=0.0, drop_rate=0.0, attn_drop_rate=0.0,
            out_indices=[1], pos_dim=16,
        )
        tm.eval()  # the reference's train() override returns None (swin_model.py:674-677)
        x = torch.randn(1, 3, 32, 48)
        with torch.no_grad():
            ref_outs = tm(x)

        ours = SwinTransformer(
            embed_dim=8, depths=(1, 1), num_heads=(2, 2), window=4,
            drop_path_rate=0.0, pos_dim=16,
        )
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        from grit_tpu.convert import state_dict_to_params

        params = {"params": state_dict_to_params(sd)}
        outs = ours.apply(params, jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
        assert len(outs) == len(ref_outs)
        for got, want in zip(outs, ref_outs):
            got_nchw = np.asarray(got).transpose(0, 3, 1, 2)
            np.testing.assert_allclose(
                got_nchw, want.numpy(), rtol=1e-4, atol=1e-4
            )


class TestSelfAttentionParity:
    def test_matches_torch_multihead_attention(self):
        import jax.numpy as jnp

        from grit_tpu.models.det_module import SelfAttention

        torch.manual_seed(3)
        d, h, b, n = 16, 4, 2, 6
        tm = torch.nn.MultiheadAttention(d, h, dropout=0.0).eval()
        q = torch.randn(b, n, d)
        with torch.no_grad():
            ref, _ = tm(q.transpose(0, 1), q.transpose(0, 1), q.transpose(0, 1))
            ref = ref.transpose(0, 1)

        ours = SelfAttention(d, h, dropout=0.0)
        params = {"params": {
            "in_proj_weight": jnp.asarray(tm.in_proj_weight.detach().numpy()),
            "in_proj_bias": jnp.asarray(tm.in_proj_bias.detach().numpy()),
            "out_proj": {
                "kernel": jnp.asarray(tm.out_proj.weight.detach().numpy().T),
                "bias": jnp.asarray(tm.out_proj.bias.detach().numpy()),
            },
        }}
        out = ours.apply(params, jnp.asarray(q.numpy()), jnp.asarray(q.numpy()),
                         jnp.asarray(q.numpy()))
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(not HAVE_REF, reason="reference checkout unavailable")
class TestPosEmbClobberParity:
    def test_xavier_clobbered_pos_table_is_loaded(self, ref_path):
        """The reference's Transformer.init_weights xavier-reinitializes ALL
        params with dim>1 — including the 'frozen sinusoid' pos_emb
        (transformer.py:48-50; nn.Embedding.from_pretrained freeze=True only
        sets requires_grad=False).  Released checkpoints therefore carry a
        RANDOM position table.  Conversion must load it, not recompute
        sinusoids — this was a real full-model caption divergence found by
        tools/checkpoint_parity.py --f64."""
        from models.caption.cap_generator import CaptionGenerator as TorchGen

        import jax.numpy as jnp

        from grit_tpu.models.cap_generator import CaptionGenerator

        torch.manual_seed(7)
        tm = TorchGen(vocab_size=30, max_len=20, n_layers=2, pad_idx=1,
                      d_model=16, n_heads=4, dropout=0.0).eval()
        # simulate Transformer.init_weights hitting the frozen table
        with torch.no_grad():
            torch.nn.init.xavier_uniform_(tm.pos_emb.weight)

        seq = torch.tensor([[2, 5, 6, 3, 1, 1], [2, 7, 8, 9, 3, 1]])
        gri = torch.randn(2, 7, 16)
        reg = torch.randn(2, 4, 16)
        vis_t = {
            "gri_feat": gri, "reg_feat": reg,
            "gri_mask": torch.zeros(2, 1, 1, 7, dtype=torch.bool),
            "reg_mask": torch.zeros(2, 1, 1, 4, dtype=torch.bool),
        }
        with torch.no_grad():
            ref_out = tm(seq, vis_t)

        ours = CaptionGenerator(vocab_size=30, max_len=20, n_layers=2,
                                pad_idx=1, d_model=16, n_heads=4)
        params = {"params": to_jax_params(tm)}
        assert "pos_emb" in params["params"], "pos_emb must convert as a param"
        vis_j = {
            "gri_feat": jnp.asarray(gri.numpy()),
            "reg_feat": jnp.asarray(reg.numpy()),
            "gri_mask": jnp.zeros((2, 1, 1, 7), bool),
            "reg_mask": jnp.zeros((2, 1, 1, 4), bool),
        }
        out = ours.apply(params, jnp.asarray(seq.numpy()), vis_j)
        np.testing.assert_allclose(
            np.asarray(out), ref_out.numpy(), rtol=1e-4, atol=1e-4
        )

    def test_fresh_init_is_sinusoid_and_never_updated(self):
        import jax
        import jax.numpy as jnp

        from grit_tpu.engine.optim import apply_lr, build_optimizer
        from grit_tpu.models.cap_generator import CaptionGenerator
        from grit_tpu.ops.posemb import sinusoid_encoding_table

        ours = CaptionGenerator(vocab_size=30, max_len=20, n_layers=1,
                                pad_idx=1, d_model=16, n_heads=4)
        vis = {
            "gri_feat": jnp.zeros((1, 3, 16)), "reg_feat": jnp.zeros((1, 2, 16)),
            "gri_mask": jnp.zeros((1, 1, 1, 3), bool),
            "reg_mask": jnp.zeros((1, 1, 1, 2), bool),
        }
        params = ours.init(jax.random.PRNGKey(0), jnp.ones((1, 4), jnp.int32), vis)
        np.testing.assert_allclose(
            np.asarray(params["params"]["pos_emb"]),
            np.asarray(sinusoid_encoding_table(21, 16, padding_idx=0)),
        )
        # the 'frozen' label zeroes its updates (requires_grad=False parity)
        tx, labels = build_optimizer(params)
        fake_updates = jax.tree.map(jnp.ones_like, params)
        scaled = apply_lr(fake_updates, labels, 1.0, 1.0)
        np.testing.assert_array_equal(
            np.asarray(scaled["params"]["pos_emb"]), 0.0
        )
        assert np.abs(np.asarray(scaled["params"]["word_emb"])).sum() > 0
