"""Detector solver + hook protocol tests (no TPU model needed)."""

import jax
import jax.numpy as jnp
import numpy as np

from grit_tpu.detection.hooks import EpochLRHook, Hook, WarmupLRHook
from grit_tpu.detection.solver import SolverBase, Trainer
from grit_tpu.engine.xe import TrainState


class RecordingHook(Hook):
    def __init__(self):
        self.events = []

    def before_epoch(self, s):
        self.events.append("be")

    def after_epoch(self, s):
        self.events.append("ae")

    def before_step(self, s):
        self.events.append("bs")

    def after_step(self, s):
        self.events.append("as")


class FakeLoader:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __iter__(self):
        for i in range(self.n):
            yield {"samples": jnp.ones((2, 3)), "targets": jnp.zeros((2,))}


def test_hook_order_and_counts():
    hook = RecordingHook()
    lrs = []

    def step_fn(state, images, targets, lr_scale, rng):
        # lr_scale is [main_scale, sp_scale]; warmup applies to both
        lrs.append(float(lr_scale[0]))
        return state, {"loss": jnp.asarray(0.5)}

    state = TrainState(params={}, opt_state={}, global_steps=jnp.asarray(0))
    tr = Trainer(step_fn, state, FakeLoader(3), rng=jax.random.PRNGKey(0),
                 hooks=[WarmupLRHook(warmup_steps=2, warmup_factor=0.1), hook])
    tr.run_epoch(0)
    assert hook.events == ["be"] + ["bs", "as"] * 3 + ["ae"]
    # warmup: step 0 -> 0.1, step 1 -> 0.55, step 2 -> 1.0
    np.testing.assert_allclose(lrs, [0.1, 0.55, 1.0], rtol=1e-6)


def test_epoch_lr_decay():
    solver = SolverBase()
    hook = EpochLRHook(drop_epochs=[2, 4], factor=0.1)
    expected = {0: 1.0, 1: 1.0, 2: 0.1, 3: 0.1, 4: 0.01}
    for epoch, want in expected.items():
        solver.epoch = epoch
        hook.before_epoch(solver)
        np.testing.assert_allclose(solver.epoch_lr_scale, want, rtol=1e-9)


def test_first_step_grad_health_with_padded_batch():
    """Regression (round-2 vdet3): a zero-init patch-embed bias made every
    fully-padded patch's embedding exactly zero; LayerNorm of a zero-variance
    row amplifies gradients by rsqrt(eps) ~= 316 per LN, compounding to a
    2.8e15 first-step grad norm that no-op'd detector pre-training under
    global clipping.  With the torch-default uniform conv-bias init the
    first-step global grad norm at a heavily padded batch must stay sane."""
    import optax

    from grit_tpu.config import default_detection_config
    from grit_tpu.detection.detector import build_detection_model
    from grit_tpu.utils.nested import ImageBatch

    config = default_detection_config().apply_overrides([
        "model.backbone=swin_test", "model.d_model=64", "model.num_classes=8",
        "model.detector.d_model=64", "model.detector.dim_feedforward=128",
        "model.detector.num_heads=4", "model.detector.num_layers=2",
        "model.detector.num_levels=2", "model.detector.num_points=2",
        "model.detector.num_queries=12", "model.detector.num_classes=8",
    ])
    model, criterion = build_detection_model(config)
    rng = np.random.RandomState(0)
    b = 2
    px = np.asarray(rng.rand(b, 128, 128, 3), np.float32)
    px[:, 64:, :] = 0.0
    px[:, :, 64:] = 0.0
    mask = np.ones((b, 128, 128), bool)
    mask[:, :64, :64] = False  # 3/4 of every image is zero padding
    images = ImageBatch(jnp.asarray(px), jnp.asarray(mask))
    targets = {
        "labels": jnp.asarray(rng.randint(0, 8, (b, 6)), jnp.int32),
        "boxes": jnp.asarray(rng.uniform(0.3, 0.5, (b, 6, 4)), jnp.float32),
        "valid": jnp.asarray(np.tile([True] * 3 + [False] * 3, (b, 1))),
    }
    params = jax.jit(lambda k, im: model.init(k, im, training=True))(
        jax.random.PRNGKey(42), images)

    def loss_fn(p):
        out = model.apply(p, images, training=True, deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(1)})
        return criterion.total_loss(criterion(out, targets))

    g = jax.grad(loss_fn)(params)
    gnorm = float(optax.global_norm(g))
    assert np.isfinite(gnorm) and gnorm < 1e3, f"first-step grad norm {gnorm:.3e}"
