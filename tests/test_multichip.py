"""Multi-chip sharding tests on the 8-device virtual CPU mesh.

This is the JAX-native way to validate the distributed path without a TPU
slice (SURVEY.md section 4): the same ``jax.sharding.Mesh`` + GSPMD layout
that runs on ICI runs over virtual CPU devices.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grit_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
    replicate,
    shard_batch,
)

needs_8 = pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")


@needs_8
class TestMesh:
    def test_data_mesh_shards_batch(self):
        mesh = make_mesh(n_data=8)
        batch = {"x": jnp.arange(16.0).reshape(16, 1)}
        sharded = shard_batch(batch, mesh)
        assert sharded["x"].sharding.is_equivalent_to(batch_sharding(mesh), 2)

    def test_tp_rules_shard_wide_matmuls(self):
        mesh = make_mesh(n_data=4, n_model=2)
        params = {
            "cap_generator": {"fc": {"kernel": jnp.zeros((64, 128))}},
            "other": {"dense": {"kernel": jnp.zeros((8, 8))}},
        }
        sh = param_shardings(params, mesh)
        assert "model" in str(sh["cap_generator"]["fc"]["kernel"].spec)
        assert sh["other"]["dense"]["kernel"].spec == jax.sharding.PartitionSpec()

    def test_psum_through_jit(self):
        """Gradient all-reduce semantics: per-shard grads sum to the global."""
        mesh = make_mesh(n_data=8)
        x = shard_batch(jnp.ones((16, 4)), mesh)
        w = replicate(jnp.ones((4, 2)), mesh)

        @jax.jit
        def loss_grad(w, x):
            return jax.grad(lambda w: jnp.sum(x @ w))(w)

        with mesh:
            g = loss_grad(w, x)
        np.testing.assert_allclose(np.asarray(g), 16.0)


@needs_8
class TestDryrunMultichip:
    def test_full_train_step_on_8_device_mesh(self):
        import __graft_entry__

        __graft_entry__.dryrun_multichip(8)

    def test_entry_signature(self):
        import __graft_entry__

        assert callable(__graft_entry__.entry)
        assert callable(__graft_entry__.dryrun_multichip)
