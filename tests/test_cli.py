"""L5 CLI smoke tests: drive every eval/inference entry point in-process on
a synthetic tiny fixture (VERDICT r1 item 5 — previously these surfaces had
no automated coverage and a decode-shape bug in eval_caption_online /
eval_nocaps went unnoticed).

Each test runs the CLI's ``main(argv)`` with tiny-model overrides against a
synthetic Karpathy-format DATA_ROOT and asserts on the artifacts it writes.
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

from grit_tpu.data.vocab import Vocab

from synth_coco import WORDS, make_synth_coco  # noqa: E402


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    """Synthetic Karpathy COCO + vocab + online-eval + nocaps fixtures
    (generator shared with the 2-process e2e: tests/synth_coco.py)."""
    root = tmp_path_factory.mktemp("cli_coco")
    make_synth_coco(root)
    return root


def tiny_overrides(data_root):
    vocab = Vocab(vocab_path=str(data_root / "annotations" / "vocab.json"))
    return [
        "model.backbone=swin_test",
        "model.grid_feat_dim=64",
        "model.d_model=32",
        "model.n_heads=4",
        "model.grid_net.n_layers=1",
        "model.cap_generator.n_layers=1",
        "model.detector.d_model=32",
        "model.detector.dim_feedforward=64",
        "model.detector.num_heads=4",
        "model.detector.num_layers=1",
        "model.detector.num_levels=2",
        "model.detector.num_points=2",
        "model.detector.num_queries=6",
        "model.detector.num_classes=10",
        f"model.vocab_size={len(vocab.itos)}",
        "model.max_len=12",
        "model.beam_size=2",
        "model.beam_len=6",
        "dataset.transform_cfg.size=[64, 96]",
        "dataset.transform_cfg.randaug=false",
        "optimizer.batch_size=2",
    ]


@pytest.fixture(scope="module")
def ckpt_path(data_root, tmp_path_factory):
    """Random-init tiny captioner saved in the trainer's Orbax layout."""
    os.environ["DATA_ROOT"] = str(data_root)
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from grit_tpu.config import default_caption_config
    from grit_tpu.models.captioner import build_captioner
    from grit_tpu.utils.nested import ImageBatch

    config = default_caption_config().apply_overrides(tiny_overrides(data_root))
    model = build_captioner(config)
    images = ImageBatch(jnp.zeros((1, 64, 96, 3)), jnp.zeros((1, 64, 96), bool))
    variables = model.init(
        jax.random.PRNGKey(0), images, jnp.full((1, 4), 2, jnp.int32)
    )
    path = tmp_path_factory.mktemp("cli_ckpt") / "last"
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(str(path), {"params": variables})
    return str(path)


@pytest.fixture(autouse=True)
def _env(data_root, monkeypatch, tmp_path):
    monkeypatch.setenv("DATA_ROOT", str(data_root))
    monkeypatch.chdir(tmp_path)


def _assert_real_captions(results, expected_ids):
    assert [r["image_id"] for r in results] == expected_ids
    for r in results:
        assert isinstance(r["caption"], str)
        # decoded from the vocab, not single characters / token ids
        for w in r["caption"].split():
            assert w in WORDS or w in ("<unk>", "<pad>", "<bos>"), r["caption"]


class TestEvalCaption:
    def test_karpathy_eval_prints_scores(self, data_root, ckpt_path, capsys):
        import eval_caption

        eval_caption.main(tiny_overrides(data_root) + [f"exp.checkpoint={ckpt_path}"])
        out = capsys.readouterr().out
        assert "valid_dict:" in out and "test_dict:" in out
        assert "CIDEr" in out


class TestEvalCaptionOnline:
    def test_writes_submission_jsons(self, data_root, ckpt_path):
        import eval_caption_online

        eval_caption_online.main(
            tiny_overrides(data_root) + [f"exp.checkpoint={ckpt_path}"]
        )
        test_res = json.load(open("result_test.json"))
        valid_res = json.load(open("result_valid.json"))
        _assert_real_captions(test_res, [501, 502, 503])
        _assert_real_captions(valid_res, [11, 12, 13, 14])


class TestEvalNocaps:
    def test_writes_results_json(self, data_root, ckpt_path):
        import eval_nocaps

        # nocaps val annotations are COCO image-info format
        eval_nocaps.main([
            "--checkpoint", ckpt_path,
            "--ann", str(data_root / "annotations" / "image_info_test2014.json"),
            "--img-root", str(data_root / "test2014"),
            "--out", "nocaps_out.json",
            "--batch", "2",
        ] + tiny_overrides(data_root))
        res = json.load(open("nocaps_out.json"))
        _assert_real_captions(res, [501, 502, 503])


class TestInferenceCaption:
    def test_prints_caption(self, data_root, ckpt_path, capsys):
        import inference_caption

        img = str(data_root / "val2014" / "COCO_val2014_000000000011.jpg")
        inference_caption.main([
            "--image", img, "--checkpoint", ckpt_path, "--beam", "2",
        ] + tiny_overrides(data_root))
        assert "Caption:" in capsys.readouterr().out


class TestExtractFeatures:
    def test_writes_hdf5_for_all_unique_images(self, data_root, tmp_path):
        import h5py

        import tools.extract_features as xf

        h5_path = str(tmp_path / "feats.h5")
        xf.main(tiny_overrides(data_root) + [f"dataset.hdf5_path={h5_path}"])
        with h5py.File(h5_path) as f:
            ids = sorted(int(i) for i in f["image_ids"][:])
            # every unique image across train/valid/test dict splits
            assert ids == [1, 2, 11, 12, 13, 14]
            assert f["gri_feat"].shape[0] == 6
            assert f["reg_feat"].shape[:2] == (6, 6)  # num_queries=6


class TestArtemisExtractFeatures:
    def test_writes_hdf5_from_listing(self, data_root, tmp_path):
        import h5py

        import tools.artemis_extract_features as axf

        listing = tmp_path / "paintings.json"
        paths = sorted(p.name for p in (data_root / "val2014").iterdir())[:3]
        json.dump(paths, open(listing, "w"))
        out = str(tmp_path / "artemis.h5")
        axf.main([
            "--listing", str(listing), "--img-root", str(data_root / "val2014"),
            "--out", out, "--batch", "2",
        ] + tiny_overrides(data_root))
        with h5py.File(out) as f:
            assert f["gri_feat"].shape[0] == 3
            assert [p.decode() for p in f["paths"][:]] == paths


class TestTrainCaptionResume:
    def test_resume_restores_typed_opt_state_and_continues(self, data_root, capsys):
        """exp.resume=true must restore the optimizer state through a
        template: a templateless Orbax restore hands back plain lists/dicts
        and optax's NamedTuple states crash (`'dict' object has no attribute
        'mu'`) at the first post-resume step — which is exactly how this CLI
        shipped until this test.  Run 1 trains epoch 0; run 2 resumes and
        must actually TRAIN epoch 1 (reference train_caption.py:44 leaves
        resume unimplemented; ours works)."""
        import train_caption

        argv = tiny_overrides(data_root) + [
            "exp.name=vres",
            "optimizer.freezing_xe_epochs=0",
            "optimizer.freezing_sc_epochs=0",
            "optimizer.finetune_sc_epochs=0",
            "optimizer.batch_size=1",
        ]
        train_caption.main(argv + ["optimizer.finetune_xe_epochs=1"])
        capsys.readouterr()

        train_caption.main(argv + [
            "optimizer.finetune_xe_epochs=2", "exp.resume=true",
        ])
        out = capsys.readouterr().out
        assert "resumed from epoch 0" in out
        assert "resume skipped" not in out
        assert "epoch=1" in out
        # epoch-1 rows landed in result.csv (both eval splits)
        rows = [l for l in open("outputs/vres/result.csv")
                if l.startswith("vres") and ", 1, " in l]
        assert len(rows) == 2, rows


class TestTrainCaptionAutoExtract:
    def test_freezing_mode_auto_extracts_missing_hdf5(self, data_root, tmp_path,
                                                      monkeypatch, capsys):
        """Freezing-mode parity glue (reference train_caption.py:48-59): when
        the frozen-feature hdf5 is absent, train_caption must extract it with
        the loaded detector weights and then train on it — not crash at the
        loader."""
        import train_caption

        monkeypatch.chdir(tmp_path)
        h5 = tmp_path / "auto_feats.h5"
        assert not h5.exists()
        train_caption.main(tiny_overrides(data_root) + [
            "exp.name=vauto",
            f"dataset.hdf5_path={h5}",
            "optimizer.freezing_xe_epochs=1",
            "optimizer.freezing_sc_epochs=0",
            "optimizer.finetune_xe_epochs=0",
            "optimizer.finetune_sc_epochs=0",
            "optimizer.batch_size=1",
        ])
        out = capsys.readouterr().out
        assert "extracting features" in out
        assert h5.exists()
        rows = [l for l in open("outputs/vauto/result.csv") if l.startswith("vauto")]
        assert rows, "freezing epoch did not train/eval"
