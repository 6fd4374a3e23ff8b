"""Ensemble decoding: averaging member log-probs inside one beam search."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grit_tpu.models.ensemble import make_ensemble_generator
from tiny_models import BOS, EOS, MAXLEN, tiny_captioner


@pytest.fixture(scope="module")
def setup():
    from grit_tpu.utils.nested import batch_images

    model = tiny_captioner()
    imgs = batch_images(
        [np.random.RandomState(0).rand(64, 64, 3).astype(np.float32)],
        bucket_hw=(64, 64), pad_multiple=16,
    )
    seq = jnp.full((1, 6), 4, jnp.int32)
    p1 = model.init(jax.random.PRNGKey(0), imgs, seq)
    p2 = model.init(jax.random.PRNGKey(1), imgs, seq)
    return model, p1, p2, imgs


class TestEnsemble:
    def test_single_member_matches_plain_beam(self, setup):
        from grit_tpu.engine.evaluator import make_caption_generator

        model, p1, _, imgs = setup
        ens = make_ensemble_generator(
            model, [p1], beam_size=3, max_len=MAXLEN, bos_idx=BOS, eos_idx=EOS
        )
        plain = make_caption_generator(
            model, beam_size=3, max_len=MAXLEN, bos_idx=BOS, eos_idx=EOS
        )
        res = ens(imgs, 1)
        seqs_plain = plain(p1, imgs, 1)
        np.testing.assert_array_equal(
            np.asarray(res.sequences[:, 0]), np.asarray(seqs_plain)
        )

    def test_two_member_runs_and_differs(self, setup):
        model, p1, p2, imgs = setup
        ens = make_ensemble_generator(
            model, [p1, p2], beam_size=3, max_len=MAXLEN, bos_idx=BOS, eos_idx=EOS
        )
        res = ens(imgs, 1)
        assert res.sequences.shape == (1, 1, MAXLEN)
        assert np.isfinite(np.asarray(res.scores)).all()
