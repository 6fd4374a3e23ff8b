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
        lrs.append(float(lr_scale))
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
