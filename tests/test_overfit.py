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
