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

    @pytest.mark.parametrize("match_impl", ["host", "device"])
    def test_detector_train_step_dp8_matches_single_device(self, match_impl):
        """Detector pre-training — the reference's LARGEST distributed
        deployment (8x8=64-way DDP, configs/detection/train_config.yaml:5-6)
        — on a dp8 mesh: one full step (forward + Hungarian + losses
        + backward + clip + 2-group Adam) must produce the same loss and
        grad norm as the identical step on one device.  match_impl="device"
        covers the TPU default: the level-stacked batched LAP solve must
        hold up under GSPMD sharding of the batch axis."""
        from grit_tpu.detection.detector import DetectionDetector
        from grit_tpu.detection.losses import SetCriterion
        from grit_tpu.detection.solver import make_detector_train_step
        from grit_tpu.engine.optim import build_optimizer
        from grit_tpu.engine.xe import TrainState
        from grit_tpu.models.det_module import DetectionModule
        from grit_tpu.models.swin import SwinTransformer
        from grit_tpu.utils.nested import ImageBatch

        backbone = SwinTransformer(
            embed_dim=16, depths=(1, 1), num_heads=(2, 2), window=4,
            drop_path_rate=0.0, pos_dim=32,
        )
        det = DetectionModule(
            d_model=32, n_heads=4, num_layers=2, dim_feedforward=64,
            num_levels=2, num_points=2, num_classes=8, num_queries=5,
            name="det_module",
        )
        model = DetectionDetector(
            backbone=backbone, det_module=det, hidden_dim=32,
            num_od_classes=8,
        )
        crit = SetCriterion(num_classes=8, match_impl=match_impl)
        b = 8
        rs = np.random.RandomState(3)
        imgs = ImageBatch(
            jnp.asarray(rs.rand(b, 32, 32, 3), jnp.float32),
            jnp.zeros((b, 32, 32), bool),
        )
        targets = {
            "labels": jnp.asarray(rs.randint(0, 8, (b, 3)), jnp.int32),
            "boxes": jnp.clip(jnp.asarray(rs.rand(b, 3, 4), jnp.float32), 0.1, 0.4),
            "valid": jnp.asarray(rs.rand(b, 3) < 0.7),
        }
        params = model.init(jax.random.PRNGKey(0), imgs, training=True)
        tx, labels = build_optimizer(params, weight_decay=1e-4)
        step = make_detector_train_step(
            model, crit, tx, labels, lr=1e-4, lr_backbone=1e-5,
            clip_max_norm=0.1,
        )
        rng = jax.random.PRNGKey(7)

        # the train step donates the state, and replicate() may alias the
        # source buffer as one of its shards — give each state its OWN copy
        mesh = make_mesh(n_data=8)
        state8 = TrainState.create(replicate(params, mesh), tx)
        imgs8 = shard_batch(imgs, mesh)
        targets8 = shard_batch(targets, mesh)
        params1 = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
        state1 = TrainState.create(params1, tx)
        _, m_single = step(state1, imgs, targets, jnp.float32(1.0), rng)
        with mesh:
            _, m_mesh = step(state8, imgs8, targets8, jnp.float32(1.0), rng)

        np.testing.assert_allclose(
            float(m_mesh["loss"]), float(m_single["loss"]), rtol=1e-5)
        np.testing.assert_allclose(
            float(m_mesh["grad_norm"]), float(m_single["grad_norm"]), rtol=1e-5)

    def test_entry_signature(self):
        import __graft_entry__

        assert callable(__graft_entry__.entry)
        assert callable(__graft_entry__.dryrun_multichip)


@needs_8
class TestRaggedBatch:
    """Ragged batches pad to the data-axis multiple and shard — never
    silently replicate (VERDICT r1: replication cost n_data x memory on the
    final eval batch) — and padded rows are metric-neutral."""

    def test_ragged_batch_is_sharded_not_replicated(self):
        mesh = make_mesh(n_data=8)
        batch = {
            "samples": np.random.RandomState(0).rand(12, 6).astype(np.float32),
            "captions": np.asarray([[2, 5, 6, 3, 1]] * 12, np.int32),
        }
        sharded = shard_batch(batch, mesh, int_fill=1, int_first=2)
        for leaf in jax.tree.leaves(sharded):
            assert leaf.shape[0] == 16  # padded to the multiple
            assert not leaf.sharding.is_fully_replicated
            assert leaf.sharding.is_equivalent_to(batch_sharding(mesh), leaf.ndim)
        # int rows pad as [<bos>, <pad>...] (a fully-<pad> row would mask
        # every self-attention key -> softmax NaN); float leaves pad zeros
        assert np.asarray(sharded["captions"])[12:].tolist() == [[2] + [1] * 4] * 4
        np.testing.assert_array_equal(np.asarray(sharded["samples"])[12:], 0.0)

    def test_val_loss_identical_to_unpadded(self):
        import sys as _sys

        _sys.path.insert(0, __file__.rsplit("/", 1)[0])
        from test_engine import tiny_model

        from grit_tpu.engine.xe import make_eval_loss_step

        model = tiny_model()
        rng = np.random.RandomState(1)
        samples = rng.rand(12, 6).astype(np.float32)
        caps = np.asarray([[2, 5, 6, 3, 1, 1]] * 12, np.int32)
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(samples),
                            jnp.asarray(caps))
        eval_loss = make_eval_loss_step(model, pad_idx=1)
        want = float(eval_loss(params, {"samples": jnp.asarray(samples),
                                        "captions": jnp.asarray(caps)}))

        mesh = make_mesh(n_data=8)
        with mesh:
            batch = shard_batch({"samples": samples, "captions": caps}, mesh,
                                int_fill=1, int_first=2)
            got = float(eval_loss(params, batch))
        # padded rows are all-<pad> captions -> zero token weight -> the
        # per-token-normalized loss is unchanged
        np.testing.assert_allclose(got, want, rtol=1e-6)


@needs_8
class TestRaggedBatchRealModel:
    def test_xe_loss_finite_and_exact_through_real_attention(self):
        """Regression (code review r2): all-<pad> padded caption rows masked
        every self-attention key and produced NaN loss + NaN grads through
        the REAL caption generator.  The [BOS, pad...] pad rows must give a
        finite loss bit-equal to the unpadded batch's."""
        import sys as _sys

        _sys.path.insert(0, __file__.rsplit("/", 1)[0])
        from tiny_models import BOS, PAD, tiny_captioner

        from grit_tpu.engine.xe import make_eval_loss_step, make_xe_train_step, TrainState
        from grit_tpu.engine.optim import build_optimizer
        from grit_tpu.utils.nested import ImageBatch

        model = tiny_captioner()
        rng = np.random.RandomState(0)
        b = 12  # ragged on the 8-device mesh
        images = ImageBatch(
            jnp.asarray(rng.rand(b, 32, 32, 3), jnp.float32),
            jnp.zeros((b, 32, 32), bool),
        )
        caps = jnp.asarray(
            np.concatenate([np.full((b, 1), BOS), rng.randint(4, 40, (b, 4)),
                            np.full((b, 1), 3)], axis=1), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), images, caps)
        eval_loss = make_eval_loss_step(model, pad_idx=PAD)
        want = float(eval_loss(params, {"samples": images, "captions": caps}))

        mesh = make_mesh(n_data=8)
        with mesh:
            batch = shard_batch(
                {"samples": images, "captions": caps}, mesh,
                int_fill=PAD, int_first=BOS,
            )
            got = float(eval_loss(params, batch))
            assert np.isfinite(got), "padded batch produced non-finite loss"
            np.testing.assert_allclose(got, want, rtol=1e-6)

            # and a full train step must produce finite params everywhere
            tx, labels = build_optimizer(params)
            state = TrainState.create(params, tx)
            sched = dict(num_epochs=2, num_its_per_epoch=10, init_lr=1e-3,
                         min_lr=1e-4, warmup_init_lr=1e-4)
            step = make_xe_train_step(model, tx, labels, pad_idx=PAD,
                                      sched_cfg=sched, backbone_lr=1e-4,
                                      donate=False)
            state, metrics = step(state, batch, jax.random.PRNGKey(1))
            assert np.isfinite(float(metrics["loss"]))
            for path, leaf in jax.tree_util.tree_flatten_with_path(state.params)[0]:
                assert np.isfinite(np.asarray(leaf)).all(), str(path)
