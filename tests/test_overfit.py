"""Overfit smoke test — the reference's integration-test pattern
(OVERFIT_SIZE truncation, SURVEY.md section 4.2): the captioner must be able
to memorize a tiny fixed batch.

Runs the cached-features XE path (precomputed visual features — the
reference's hdf5 'freezing' mode) so the test exercises grid-net + caption
generator + XE step end-to-end without the heavy backbone.
"""

import jax
import jax.numpy as jnp
import numpy as np

from grit_tpu.engine.optim import build_optimizer
from grit_tpu.engine.xe import TrainState, make_xe_train_step
from grit_tpu.models.cap_generator import CaptionGenerator
from grit_tpu.models.grid_net import GridFeatureNetwork

VOCAB, D, MAXLEN = 40, 32, 12
PAD, BOS, EOS = 1, 2, 3


class CachedFeatureCaptioner:
    """Thin harness: grid_net + cap_generator over fixed visual features."""

    def __init__(self):
        import flax.linen as nn

        class M(nn.Module):
            def setup(self):
                self.grid_net = GridFeatureNetwork(
                    n_layers=2, d_in=D, d_model=D, n_heads=4, d_ff=64,
                    dropout=0.1, name="grid_net",
                )
                self.cap_generator = CaptionGenerator(
                    vocab_size=VOCAB, max_len=MAXLEN, n_layers=2, pad_idx=PAD,
                    d_model=D, n_heads=4, d_ff=64, dropout=0.1,
                    name="cap_generator",
                )

            def __call__(self, vis, seq, *, deterministic=True):
                gri, _ = self.grid_net(
                    vis["gri_feat"], vis["gri_mask"], deterministic=deterministic
                )
                v = dict(vis)
                v["gri_feat"] = gri[:, -1]
                return self.cap_generator(seq, v, deterministic=deterministic)

        self.module = M()


def test_overfits_fixed_batch():
    m = CachedFeatureCaptioner().module
    rng = jax.random.PRNGKey(0)
    b, s = 4, 6
    vis = {
        "gri_feat": jax.random.normal(rng, (b, s, D)),
        "gri_mask": jnp.zeros((b, 1, 1, s), bool),
        "reg_feat": jax.random.normal(jax.random.PRNGKey(1), (b, 3, D)),
        "reg_mask": jnp.zeros((b, 1, 1, 3), bool),
    }
    caps = jnp.asarray([
        [BOS, 5, 6, 7, EOS, PAD],
        [BOS, 8, 9, EOS, PAD, PAD],
        [BOS, 10, 11, 12, 13, EOS],
        [BOS, 14, EOS, PAD, PAD, PAD],
    ], jnp.int32)
    params = m.init(rng, vis, caps)
    tx, labels = build_optimizer(params)
    state = TrainState.create(params, tx)
    sched = dict(num_epochs=1, num_its_per_epoch=10_000, init_lr=5e-3,
                 min_lr=5e-3, warmup_init_lr=5e-3, warmup_factor=1.0)
    step = make_xe_train_step(
        m, tx, labels, pad_idx=PAD, sched_cfg=sched, backbone_lr=0.0, donate=False,
    )
    batch = {"samples": vis, "captions": caps}
    first = None
    for i in range(150):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert last < 0.05, f"failed to memorize: first={first:.3f} last={last:.3f}"

    # greedy decode reproduces the memorized captions
    out = m.apply(state.params, vis, caps)
    pred = np.asarray(jnp.argmax(out[:, :-1], -1))
    tgt = np.asarray(caps[:, 1:])
    mask = tgt != PAD
    acc = (pred == tgt)[mask].mean()
    assert acc > 0.95


def test_detector_overfits_fixed_batch():
    """Detector-pre-training analogue of the caption overfit smoke: the full
    jitted det step (forward + Hungarian matching + focal/L1/GIoU + clip +
    two-group Adam) must be able to memorize a tiny fixed scene — pins the
    optimizer/matcher/loss integration the same way the reference's
    OVERFIT_SIZE runs do (SURVEY.md section 4.2)."""
    from grit_tpu.config import default_detection_config
    from grit_tpu.detection.detector import build_detection_model
    from grit_tpu.detection.solver import make_detector_train_step
    from grit_tpu.engine.optim import build_optimizer
    from grit_tpu.utils.nested import ImageBatch

    config = default_detection_config().apply_overrides([
        "model.backbone=swin_test", "model.d_model=64", "model.num_classes=8",
        "model.detector.d_model=64", "model.detector.dim_feedforward=128",
        "model.detector.num_heads=4", "model.detector.num_layers=2",
        "model.detector.num_levels=2", "model.detector.num_points=2",
        "model.detector.num_queries=12", "model.detector.num_classes=8",
    ])
    model, criterion = build_detection_model(config)
    rng = np.random.RandomState(3)
    b = 2
    images = ImageBatch(
        jnp.asarray(rng.rand(b, 128, 128, 3), np.float32),
        jnp.zeros((b, 128, 128), bool),
    )
    targets = {
        "labels": jnp.asarray(rng.randint(0, 8, (b, 4)), jnp.int32),
        "boxes": jnp.asarray(rng.uniform(0.2, 0.6, (b, 4, 4)), jnp.float32),
        "valid": jnp.asarray(np.tile([True, True, True, False], (b, 1))),
    }
    params = jax.jit(lambda k, im: model.init(k, im, training=True))(
        jax.random.PRNGKey(0), images)
    tx, labels = build_optimizer(params)
    state = TrainState.create(params, tx)
    step = make_detector_train_step(
        model, criterion, tx, labels, lr=1e-3, lr_backbone=1e-3,
        clip_max_norm=0.1,
    )
    first = None
    for i in range(120):
        state, metrics = step(state, images, targets,
                              jnp.asarray(1.0), jax.random.PRNGKey(i))
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(last)
    assert last < 0.5 * first, f"no memorization: first={first:.3f} last={last:.3f}"
    assert float(metrics["loss_bbox"]) < 0.1, float(metrics["loss_bbox"])
