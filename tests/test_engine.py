"""Engine tests: LR schedule parity, XE step, SCST step, optimizer split."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grit_tpu.engine.optim import (
    apply_lr,
    build_optimizer,
    cosine_lr_schedule,
    frozen_mask,
    split_param_labels,
)
from grit_tpu.engine.xe import TrainState, make_eval_loss_step, make_xe_train_step, nll_loss

REF = "/root/reference"


class TestCosineSchedule:
    def test_matches_reference_scheduler_tick_for_tick(self):
        """Import the reference CosineLRScheduler and compare every tick."""
        sys.path.insert(0, REF)
        try:
            from utils.cap_scheduler import CosineLRScheduler
        finally:
            sys.path.remove(REF)

        class FakeOpt:
            param_groups = [{"lr": 0.0}]

        kw = dict(num_epochs=10, num_its_per_epoch=50, init_lr=1e-4,
                  min_lr=1e-5, warmup_init_lr=1e-6)
        ref = CosineLRScheduler(FakeOpt(), **kw)
        ours = []
        theirs = []
        for step in range(1, 400):
            theirs.append(ref.step())
            ours.append(float(cosine_lr_schedule(step, **kw)))
        np.testing.assert_allclose(ours, theirs, rtol=1e-6)


class TestNLL:
    def test_ignores_pad(self):
        logp = jnp.log(jnp.full((1, 4, 5), 0.2))
        caps = jnp.asarray([[2, 3, 4, 1]])  # last is pad
        loss, count = nll_loss(logp, caps, pad_idx=1)
        # targets = [3, 4, 1] -> two non-pad tokens
        assert int(count) == 2
        np.testing.assert_allclose(float(loss), -np.log(0.2), rtol=1e-5)


def tiny_model():
    import flax.linen as nn

    class Toy(nn.Module):
        vocab: int = 12

        @nn.compact
        def __call__(self, samples, seq, *, deterministic=True):
            # 'detector_proj' path exercises the backbone param-group split
            feat = nn.Dense(8, name="detector_proj")(samples)
            tok = nn.Embed(self.vocab, 8, name="tok")(seq)
            h = tok + feat[:, None, :]
            return nn.log_softmax(nn.Dense(self.vocab, name="head")(h))

        def compute_vis(self, samples, *, deterministic=True):
            return samples  # identity "visual features" for the SCST rescoring API

        def score_tokens(self, vis, seq, *, deterministic=True):
            return self(vis, seq, deterministic=deterministic)

    return Toy()


class TestXEStep:
    def test_loss_decreases_and_lr_schedule_applied(self):
        model = tiny_model()
        samples = jnp.ones((4, 6))
        caps = jnp.asarray([[2, 5, 6, 3]] * 4)
        params = model.init(jax.random.PRNGKey(0), samples, caps)
        tx, labels = build_optimizer(params)
        state = TrainState.create(params, tx)
        sched = dict(num_epochs=2, num_its_per_epoch=10, init_lr=1e-2,
                     min_lr=1e-3, warmup_init_lr=1e-3)
        step = make_xe_train_step(
            model, tx, labels, pad_idx=1, sched_cfg=sched, backbone_lr=1e-3,
            donate=False,
        )
        state = state.epoch_tick()
        batch = {"samples": samples, "captions": caps}
        losses = []
        for i in range(20):
            state, metrics = step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0] * 0.8
        assert int(state.global_steps) == 21

    def test_label_split(self):
        model = tiny_model()
        params = model.init(
            jax.random.PRNGKey(0), jnp.ones((1, 6)), jnp.ones((1, 3), jnp.int32)
        )
        labels = split_param_labels(params)
        flat = jax.tree_util.tree_flatten_with_path(labels)[0]
        by_name = {"/".join(str(getattr(p, "key", "")) for p in path): v
                   for path, v in flat}
        assert all(v == "backbone" for k, v in by_name.items() if "detector" in k)
        assert all(v == "model" for k, v in by_name.items() if "detector" not in k)

    def test_freeze_mask_zeroes_updates(self):
        model = tiny_model()
        samples = jnp.ones((2, 6))
        caps = jnp.asarray([[2, 5, 6, 3]] * 2)
        params = model.init(jax.random.PRNGKey(0), samples, caps)
        tx, labels = build_optimizer(params)
        freeze = frozen_mask(params, lambda p: "detector" in p)
        state = TrainState.create(params, tx)
        sched = dict(num_epochs=2, num_its_per_epoch=10, init_lr=1e-2,
                     min_lr=1e-3, warmup_init_lr=1e-3)
        step = make_xe_train_step(
            model, tx, labels, pad_idx=1, sched_cfg=sched, backbone_lr=1e-2,
            freeze=freeze, donate=False,
        )
        before = np.asarray(params["params"]["detector_proj"]["kernel"])
        state, _ = step(state, {"samples": samples, "captions": caps},
                        jax.random.PRNGKey(0))
        after = np.asarray(state.params["params"]["detector_proj"]["kernel"])
        np.testing.assert_array_equal(before, after)
        moved = np.asarray(state.params["params"]["head"]["kernel"])
        assert np.abs(moved - np.asarray(params["params"]["head"]["kernel"])).sum() > 0


class TestSCSTRescoring:
    def test_sequence_log_probs_mask_after_eos(self):
        from grit_tpu.engine.scst import sequence_log_probs

        model = tiny_model()
        samples = jnp.ones((2, 6))
        seq0 = jnp.ones((2, 4), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), samples, seq0)
        # sequences: [B=2, beam=1, T=4]; second sequence hits EOS(3) at t=1
        seqs = jnp.asarray([[[5, 6, 7, 8]], [[5, 3, 0, 0]]], jnp.int32)
        logp = sequence_log_probs(
            model, params, samples, seqs, bos_idx=2, eos_idx=3
        )
        arr = np.asarray(logp)
        assert arr.shape == (2, 1, 4)
        # sequence 2: positions after the EOS (t=2,3) contribute exactly 0
        assert arr[1, 0, 2] == 0.0 and arr[1, 0, 3] == 0.0
        # EOS step itself is included
        assert arr[1, 0, 1] != 0.0


class TestFrozenStages:
    """Reference _freeze_stages parity (swin_model.py:622-637, config fs=2):
    patch embed + Swin stages < fs-1 are frozen during finetune; deeper
    stages and the caption stack keep training."""

    def _setup(self):
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from tiny_models import tiny_captioner
        from grit_tpu.utils.nested import ImageBatch

        model = tiny_captioner(frozen_stages=2)
        images = ImageBatch(
            jnp.linspace(0, 1, 2 * 64 * 64 * 3).reshape(2, 64, 64, 3),
            jnp.zeros((2, 64, 64), bool),
        )
        caps = jnp.asarray([[2, 5, 6, 3]] * 2)
        params = model.init(jax.random.PRNGKey(0), images, caps)
        return model, params, images, caps

    def test_stop_gradient_zeroes_frozen_grads(self):
        """The Swin-side stop_gradient alone yields exactly-zero grads for
        patch_embed + stage 0 — backward never enters those stages."""
        model, params, images, caps = self._setup()

        def loss(p):
            out = model.apply(p, images, caps, deterministic=True)
            return jnp.sum(out ** 2)

        g = jax.grad(loss)(params)
        bb = g["params"]["detector"]["backbone"]
        for sub in ("patch_embed_proj", "patch_embed_norm", "layers_0"):
            leaves = jax.tree_util.tree_leaves(bb[sub])
            assert all(float(jnp.abs(l).max()) == 0.0 for l in leaves), sub
        # stage 1 (>= fs-1) must receive real gradients
        assert any(
            float(jnp.abs(l).max()) > 0
            for l in jax.tree_util.tree_leaves(bb["layers_1"])
        )

    def test_ft_xe_step_leaves_frozen_params_bit_unchanged(self):
        from grit_tpu.engine.optim import swin_frozen_stages_predicate

        model, params, images, caps = self._setup()
        tx, labels = build_optimizer(params)
        freeze = frozen_mask(params, swin_frozen_stages_predicate(2))
        state = TrainState.create(params, tx)
        sched = dict(num_epochs=2, num_its_per_epoch=10, init_lr=1e-2,
                     min_lr=1e-3, warmup_init_lr=1e-3)
        step = make_xe_train_step(
            model, tx, labels, pad_idx=1, sched_cfg=sched, backbone_lr=1e-2,
            freeze=freeze, donate=False,
        )
        state, _ = step(state, {"samples": images, "captions": caps},
                        jax.random.PRNGKey(0))
        bb0 = params["params"]["detector"]["backbone"]
        bb1 = state.params["params"]["detector"]["backbone"]
        for sub in ("patch_embed_proj", "patch_embed_norm", "layers_0"):
            for a, b in zip(jax.tree_util.tree_leaves(bb0[sub]),
                            jax.tree_util.tree_leaves(bb1[sub])):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        moved = sum(
            float(jnp.abs(a - b).sum())
            for a, b in zip(jax.tree_util.tree_leaves(bb0["layers_1"]),
                            jax.tree_util.tree_leaves(bb1["layers_1"]))
        )
        assert moved > 0
        cap_moved = sum(
            float(jnp.abs(a - b).sum())
            for a, b in zip(
                jax.tree_util.tree_leaves(params["params"]["cap_generator"]),
                jax.tree_util.tree_leaves(state.params["params"]["cap_generator"]),
            )
        )
        assert cap_moved > 0


class TestSCSTEstimatorEquivalence:
    """The SCST deviation's checkable half (engine/scst.py:14-22): with
    dropout off, re-scoring the sampled sequences teacher-forced must
    reproduce EXACTLY the per-step log-probs the beam search emitted
    (incl. zeros after EOS) — the REINFORCE estimator then differs from the
    reference's backprop-through-search only in dropout noise."""

    def test_rescored_logprobs_equal_beam_logprobs(self):
        from tiny_models import BOS, EOS, VOCAB, tiny_captioner

        from grit_tpu.engine.scst import make_generate_step, sequence_log_probs
        from grit_tpu.utils.nested import ImageBatch

        model = tiny_captioner()
        b, beam, t_max = 2, 3, 6
        rng = np.random.RandomState(0)
        images = ImageBatch(
            jnp.asarray(rng.rand(b, 32, 32, 3), jnp.float32),
            jnp.zeros((b, 32, 32), bool),
        )
        params = model.init(
            jax.random.PRNGKey(0), images, jnp.full((b, 4), BOS, jnp.int32)
        )

        generate = make_generate_step(
            model, beam_size=beam, max_len=t_max, bos_idx=BOS, eos_idx=EOS
        )
        seqs, beam_logp = generate(params, images, b, None)  # deterministic
        assert seqs.shape == (b, beam, t_max)

        rescored = sequence_log_probs(
            model, params, images, seqs, bos_idx=BOS, eos_idx=EOS, rng=None
        )
        beam_np, re_np = np.asarray(beam_logp), np.asarray(rescored)
        # positions after EOS must be exactly 0 in both
        post_eos = np.cumsum(np.asarray(seqs) == EOS, axis=-1) > 0
        post_eos = np.concatenate(
            [np.zeros_like(post_eos[..., :1]), post_eos[..., :-1]], axis=-1
        )
        np.testing.assert_array_equal(beam_np[post_eos], 0.0)
        np.testing.assert_array_equal(re_np[post_eos], 0.0)
        # and the live positions must agree to numerics (cached incremental
        # decode vs full teacher-forced attention)
        np.testing.assert_allclose(re_np, beam_np, rtol=2e-4, atol=2e-5)


class TestSCSTRaggedPadding:
    def test_padded_rows_leave_loss_and_grads_exact(self):
        """A ragged SC batch arrives zero-padded (mesh.shard_batch); with
        reward 0 == baseline 0 on the padded rows and the sum/n_valid
        normalization, the loss and update must equal the unpadded batch's."""
        from grit_tpu.engine.scst import make_scst_update_step

        model = tiny_model()
        samples = jnp.asarray(np.random.RandomState(0).rand(3, 6), jnp.float32)
        seqs = jnp.asarray(np.random.RandomState(1).randint(4, 11, (3, 2, 4)), jnp.int32)
        rewards = jnp.asarray([[0.9, 0.1], [0.5, 0.7], [0.2, 0.8]], jnp.float32)
        params = model.init(jax.random.PRNGKey(0), samples, seqs[:, 0])
        tx, labels = build_optimizer(params)
        upd = make_scst_update_step(
            model, tx, labels, bos_idx=2, eos_idx=3, model_lr=1e-2, backbone_lr=1e-2,
        )

        s0 = TrainState.create(jax.tree.map(jnp.copy, params), tx)
        ref_state, ref_metrics = upd(s0, samples, seqs, rewards,
                                     jnp.float32(3), jax.random.PRNGKey(5))

        pad_s = jnp.concatenate([samples, jnp.zeros((1, 6))], 0)
        pad_q = jnp.concatenate([seqs, jnp.full((1, 2, 4), 1, jnp.int32)], 0)
        pad_r = jnp.concatenate([rewards, jnp.zeros((1, 2))], 0)
        # the update step donates its state: fresh buffers for run 2
        s1 = TrainState.create(jax.tree.map(jnp.copy, params), tx)
        pad_state, pad_metrics = upd(s1, pad_s, pad_q, pad_r,
                                     jnp.float32(3), jax.random.PRNGKey(5))

        np.testing.assert_allclose(float(pad_metrics["loss"]),
                                   float(ref_metrics["loss"]), rtol=1e-6)
        np.testing.assert_allclose(float(pad_metrics["reward"]),
                                   float(ref_metrics["reward"]), rtol=1e-6)
        for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_flatten_with_path(ref_state.params)[0],
            jax.tree_util.tree_flatten_with_path(pad_state.params)[0],
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7, err_msg=str(p1))


class TestSCSTBatchLinearity:
    def test_b8_gradient_is_mean_of_b4_gradients(self):
        """VERDICT r4 item 7 (SCST batch size): with the per-image baseline
        (mean reward over the image's own beam) and the sum/(n_valid*beam)
        normalization, the SCST gradient is LINEAR in the batch: one b8
        step's loss/grad equals the average of the two b4 half-batches' at
        the same params.  Batch size therefore only changes gradient
        variance and steps/epoch — never the estimator — so the reference's
        ``batch//4`` rule is a memory convention, not a math constraint."""
        from grit_tpu.engine.scst import sequence_log_probs

        model = tiny_model()
        rng = np.random.RandomState(0)
        samples = jnp.asarray(rng.rand(8, 6), jnp.float32)
        seqs = jnp.asarray(rng.randint(4, 11, (8, 2, 4)), jnp.int32)
        rewards = jnp.asarray(rng.rand(8, 2), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), samples, seqs[:, 0])

        def loss_fn(p, s, q, r):
            logp = sequence_log_probs(model, p, s, q, bos_idx=2, eos_idx=3)
            mean_logp = logp.mean(-1)
            baseline = r.mean(-1, keepdims=True)
            return (-mean_logp * (r - baseline)).sum() / (q.shape[0] * q.shape[1])

        l8, g8 = jax.value_and_grad(loss_fn)(params, samples, seqs, rewards)
        la, ga = jax.value_and_grad(loss_fn)(
            params, samples[:4], seqs[:4], rewards[:4])
        lb, gb = jax.value_and_grad(loss_fn)(
            params, samples[4:], seqs[4:], rewards[4:])

        np.testing.assert_allclose(float(l8), (float(la) + float(lb)) / 2,
                                   rtol=1e-6)
        for (pth, h8), (_, ha), (_, hb) in zip(
            jax.tree_util.tree_flatten_with_path(g8)[0],
            jax.tree_util.tree_flatten_with_path(ga)[0],
            jax.tree_util.tree_flatten_with_path(gb)[0],
        ):
            np.testing.assert_allclose(
                np.asarray(h8), (np.asarray(ha) + np.asarray(hb)) / 2,
                rtol=2e-5, atol=1e-7, err_msg=str(pth))


class TestSCSTConvergence:
    """VERDICT r3 item 7: the estimator-equivalence and ragged tests pin the
    SCST math; this pins that the LOOP improves the reward it optimizes —
    a synthetic-corpus e2e: XE warm start (the real recipe's phase order),
    then SCST iterations with true CIDEr rewards must raise the mean reward."""

    def test_cider_reward_improves_on_synthetic_corpus(self):
        from tiny_models import BOS, EOS, PAD, tiny_captioner

        from grit_tpu.data.metrics import Cider
        from grit_tpu.engine.scst import make_generate_step, make_scst_update_step
        from grit_tpu.utils.nested import ImageBatch

        model = tiny_captioner()
        b, beam, t_max = 2, 3, 6
        rng = np.random.RandomState(0)
        images = ImageBatch(
            jnp.asarray(rng.rand(b, 32, 32, 3), jnp.float32),
            jnp.zeros((b, 32, 32), bool),
        )
        refs = ["w5 w6 w7 w8", "w9 w10 w11 w12"]
        ref_tokens = [[5, 6, 7, 8], [9, 10, 11, 12]]
        caps = jnp.asarray(
            [[BOS] + t + [EOS, PAD][: t_max - len(t) - 1] for t in ref_tokens],
            jnp.int32,
        )

        params = model.init(jax.random.PRNGKey(0), images, caps)
        tx, labels = build_optimizer(params)
        state = TrainState.create(params, tx)

        # XE warm start (SC phases start from an XE-trained model,
        # train_caption.py:131-133) — enough to make rewards non-degenerate,
        # not enough to saturate them (a saturated start leaves SCST nothing
        # to improve and the assertion below meaningless)
        sched = dict(num_epochs=1, num_its_per_epoch=100, init_lr=2e-3,
                     min_lr=2e-3, warmup_init_lr=2e-3)
        xe = make_xe_train_step(model, tx, labels, pad_idx=PAD,
                                sched_cfg=sched, backbone_lr=2e-3, donate=False)
        for i in range(5):
            state, _ = xe(state, {"samples": images, "captions": caps},
                          jax.random.PRNGKey(100 + i))

        generate = make_generate_step(model, beam_size=beam, max_len=t_max,
                                      bos_idx=BOS, eos_idx=EOS)
        # cold SCST LR (the reference's sc_lr is orders below its xe_lr —
        # coco_config.yaml; a hot policy-gradient step collapses the policy)
        upd = make_scst_update_step(model, tx, labels, bos_idx=BOS, eos_idx=EOS,
                                    model_lr=5e-4, backbone_lr=5e-4)

        def decode(row):
            words = []
            for t in row:
                if t == EOS:
                    break
                if t not in (PAD, BOS):
                    words.append(f"w{int(t)}")
            return " ".join(words)

        cider = Cider()
        rewards_per_iter = []
        key = jax.random.PRNGKey(7)
        for it in range(25):
            key, gen_k, upd_k = jax.random.split(key, 3)
            seqs, _ = generate(state.params, images, b, gen_k)
            rows = np.asarray(seqs).reshape(b * beam, t_max)
            gen = {i: [decode(r) or "w0"] for i, r in enumerate(rows)}
            gts = {i: [refs[i // beam]] for i in range(b * beam)}
            reward = cider.compute_score(gts, gen)[1].astype(np.float32)
            reward = reward.reshape(b, beam)
            rewards_per_iter.append(float(reward.mean()))
            state, metrics = upd(state, images, seqs, jnp.asarray(reward),
                                 jnp.float32(b), upd_k)
            assert np.isfinite(float(metrics["loss"]))

        first, last = np.mean(rewards_per_iter[:3]), np.mean(rewards_per_iter[-3:])
        assert last > first + 0.05, rewards_per_iter
