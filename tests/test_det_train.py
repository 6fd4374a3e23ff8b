"""Detector pre-training parity tests (VERDICT r3 items 3-4).

Pins, against the reference's ``train_detector.py``:
- the 4-group + sp param grouping rules (:24-69);
- per-group AdamW math (lr / lr_backbone / sp_lr, decoupled decay on the
  decay groups only) against a live ``torch.optim.AdamW`` oracle;
- the MultiStepLR tick quirk (schedulers stepped once BEFORE the loop,
  :245-246, so milestone m applies from 0-indexed epoch m-1);
- the production loader: sharding, drop_last, static bucket, determinism
  across worker counts;
- kill-and-resume: the CLI restores params+optimizer+epoch through a typed
  template and continues BIT-EXACTLY as the uninterrupted run.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from grit_tpu.engine.optim import apply_detector_lr, detector_param_labels


def _tree(rng):
    return {
        "params": {
            "backbone": {
                "conv": {"kernel": rng.randn(4, 3).astype(np.float32),
                         "bias": rng.randn(3).astype(np.float32)},
                "norm": {"scale": rng.randn(3).astype(np.float32)},
            },
            "det_module": {
                "dense": {"kernel": rng.randn(3, 5).astype(np.float32),
                          "bias": rng.randn(5).astype(np.float32)},
                "query_embed": rng.randn(6, 4).astype(np.float32),
            },
            "attr_head": {
                "lin": {"kernel": rng.randn(2, 2).astype(np.float32),
                        "bias": rng.randn(2).astype(np.float32)},
            },
        }
    }


class TestParamGroups:
    def test_grouping_rules(self):
        """Reference train_detector.py:36-49: backbone split by name
        substring, no-decay = 1-D or bias, sp by sp_names substring;
        query_embed is 2-D and NOT exempted (the reference's skip list only
        matches a param whose last dotted component is 'query_embed', but
        nn.Embedding exposes 'query_embed.weight') -> head/decay."""
        labels = detector_param_labels(_tree(np.random.RandomState(0)),
                                       sp_names=["attr_head"])
        p = labels["params"]
        assert p["backbone"]["conv"]["kernel"] == "backbone_decay"
        assert p["backbone"]["conv"]["bias"] == "backbone_no_decay"
        assert p["backbone"]["norm"]["scale"] == "backbone_no_decay"
        assert p["det_module"]["dense"]["kernel"] == "head"
        assert p["det_module"]["dense"]["bias"] == "det_no_decay"
        assert p["det_module"]["query_embed"] == "head"
        assert p["attr_head"]["lin"]["kernel"] == "sp"
        assert p["attr_head"]["lin"]["bias"] == "sp"

    def test_sp_by_query_embed_name(self):
        labels = detector_param_labels(_tree(np.random.RandomState(0)),
                                       sp_names=["query_embed"])
        assert labels["params"]["det_module"]["query_embed"] == "sp"

    def test_adamw_matches_torch_oracle(self):
        """3 steps of our adam + apply_detector_lr vs torch.optim.AdamW over
        the reference's exact param_dicts (train_detector.py:51-88), with an
        lr-scale change mid-way standing in for the MultiStepLR drops."""
        import torch

        from grit_tpu.engine.optim import build_optimizer
        from grit_tpu.engine.xe import TrainState

        LR, LRB, SPLR, WD = 1e-2, 2e-2, 5e-2, 1e-1
        rng = np.random.RandomState(1)
        params = _tree(rng)
        grads_np = jax.tree.map(
            lambda p: rng.randn(*np.shape(p)).astype(np.float32), params)
        labels = detector_param_labels(params, sp_names=["attr_head"])

        # ---- torch side: 4 param_dicts + sp AdamW ----
        tparams = jax.tree.map(
            lambda p: torch.nn.Parameter(torch.tensor(np.asarray(p))), params)
        tleaves = jax.tree_util.tree_leaves_with_path(tparams)
        by_group: dict = {}
        flat_labels = {jax.tree_util.keystr(k): v for k, v in
                       jax.tree_util.tree_leaves_with_path(labels)}
        for k, t in tleaves:
            by_group.setdefault(flat_labels[jax.tree_util.keystr(k)], []).append(t)
        main_opt = torch.optim.AdamW([
            {"params": by_group["head"]},
            {"params": by_group["det_no_decay"], "weight_decay": 0.0, "lr": LR},
            {"params": by_group["backbone_no_decay"], "weight_decay": 0.0, "lr": LRB},
            {"params": by_group["backbone_decay"], "lr": LRB},
        ], lr=LR, weight_decay=WD)
        sp_opt = torch.optim.AdamW(by_group["sp"], lr=SPLR, weight_decay=WD)
        base_lrs = [g["lr"] for g in main_opt.param_groups]

        # ---- jax side ----
        tx, _ = build_optimizer(params, beta_2=0.999)
        state = TrainState.create(
            jax.tree.map(jnp.asarray, params), tx)
        grads = jax.tree.map(jnp.asarray, grads_np)
        tgrads = jax.tree.map(lambda g: torch.tensor(np.asarray(g)), grads_np)

        for step in range(3):
            main_scale, sp_scale = (1.0, 1.0) if step < 2 else (0.1, 0.5)
            for g, b in zip(main_opt.param_groups, base_lrs):
                g["lr"] = b * main_scale
            sp_opt.param_groups[0]["lr"] = SPLR * sp_scale
            for (_, t), (_, g) in zip(
                jax.tree_util.tree_leaves_with_path(tparams),
                jax.tree_util.tree_leaves_with_path(tgrads),
            ):
                t.grad = g.clone()
            main_opt.step()
            sp_opt.step()

            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            updates = apply_detector_lr(
                updates, state.params, labels,
                lr=LR, lr_backbone=LRB, sp_lr=SPLR, weight_decay=WD,
                lr_scale=main_scale, sp_lr_scale=sp_scale,
            )
            import optax
            state = TrainState(optax.apply_updates(state.params, updates),
                               opt_state, state.global_steps + 1)

        got = jax.tree.map(np.asarray, state.params)
        want = jax.tree.map(lambda t: t.detach().numpy(), tparams)
        # f32 + torch's different bias-correction factoring
        # (denom = sqrt(nu)/sqrt(bc2) + eps vs optax's sqrt(nu/bc2) + eps)
        # leave ~1e-6-scale rounding differences after 3 steps
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=2e-6),
            got, want)

    def test_freeze_mask_blocks_update_and_decay(self):
        params = _tree(np.random.RandomState(2))
        labels = detector_param_labels(params, sp_names=[])
        freeze = jax.tree.map(lambda _: False, params)
        freeze["params"]["backbone"]["conv"]["kernel"] = True
        ups = jax.tree.map(lambda p: np.ones_like(p), params)
        out = apply_detector_lr(
            jax.tree.map(jnp.asarray, ups), jax.tree.map(jnp.asarray, params),
            labels, lr=1e-2, lr_backbone=1e-2, sp_lr=0.0, weight_decay=0.1,
            lr_scale=1.0, sp_lr_scale=1.0, freeze=freeze,
        )
        assert float(jnp.abs(out["params"]["backbone"]["conv"]["kernel"]).max()) == 0.0
        assert float(jnp.abs(out["params"]["det_module"]["dense"]["kernel"]).max()) > 0.0


class TestSpSchedule:
    def test_epoch_lr_hook_attr(self):
        from grit_tpu.detection.hooks import EpochLRHook
        from grit_tpu.detection.solver import SolverBase

        solver = SolverBase()
        main = EpochLRHook([39], 0.1)                      # lr_drop_epochs=[40]
        sp = EpochLRHook([4], 0.1, attr="sp_epoch_lr_scale")  # sp=[5]
        for epoch, want_main, want_sp in [(0, 1, 1), (4, 1, 0.1),
                                          (38, 1, 0.1), (39, 0.1, 0.1)]:
            solver.epoch = epoch
            main.before_epoch(solver)
            sp.before_epoch(solver)
            assert solver.epoch_lr_scale == pytest.approx(want_main)
            assert solver.sp_epoch_lr_scale == pytest.approx(want_sp)


# ---------------------------------------------------------------------------
# loader + CLI
# ---------------------------------------------------------------------------

N_IMAGES = 16


@pytest.fixture(scope="module")
def det_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("det_train")
    rng = np.random.RandomState(0)
    images, anns = [], []
    for i in range(N_IMAGES):
        fname = f"img_{i}.jpg"
        w, h = 100 + 4 * (i % 3), 80
        Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8)).save(root / fname)
        images.append({"id": i, "file_name": fname, "height": h, "width": w})
        for j in range(2):
            anns.append({"id": 10 * i + j, "image_id": i,
                         "category_id": 1 + (i + j) % 4,
                         "bbox": [5 + 10 * j, 5, 30, 40], "area": 1200})
    ann_file = root / "ann.json"
    json.dump({"images": images, "annotations": anns}, open(ann_file, "w"))
    return root, str(ann_file)


def _loader(det_data, **kw):
    from grit_tpu.detection.datasets import DetectionDataset
    from grit_tpu.detection.det_transforms import make_transforms
    from grit_tpu.detection.loader import DetectionLoader

    root, ann = det_data
    ds = DetectionDataset(ann, str(root))
    kw.setdefault("transform", make_transforms("train", scales=[48], max_size=64))
    kw.setdefault("bucket_hw", (64, 64))
    kw.setdefault("max_boxes", 8)
    return DetectionLoader(ds, kw.pop("batch_size", 4), **kw)


class TestDetectionLoader:
    def test_shards_disjoint_and_drops_ragged(self, det_data):
        got = []
        for rank in (0, 1):
            ldr = _loader(det_data, batch_size=3, rank=rank, world=2)
            assert len(ldr) == (N_IMAGES // 2) // 3  # drop_last
            for b in ldr:
                assert b["samples"].images.shape == (3, 64, 64, 3)
                got.append(b)
        assert len(got) == 2 * ((N_IMAGES // 2) // 3)

    def test_deterministic_across_worker_counts(self, det_data):
        a = [b for b in _loader(det_data, num_workers=1, seed=7)]
        b = [b for b in _loader(det_data, num_workers=8, seed=7)]
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x["samples"].images),
                                          np.asarray(y["samples"].images))
            np.testing.assert_array_equal(x["targets"]["boxes"],
                                          y["targets"]["boxes"])

    def test_epoch_reshuffles(self, det_data):
        ldr = _loader(det_data, batch_size=4, shuffle=True, seed=3)
        ldr.set_epoch(0)
        a = np.asarray(next(iter(ldr))["samples"].images)
        ldr.set_epoch(1)
        b = np.asarray(next(iter(ldr))["samples"].images)
        assert not np.array_equal(a, b)

    def test_valid_mode_keeps_tail_and_metadata(self, det_data):
        from grit_tpu.detection.det_transforms import make_transforms

        ldr = _loader(det_data, batch_size=5, mode="valid",
                      transform=make_transforms("valid", max_size=64))
        batches = list(ldr)
        assert sum(len(b["image_id"]) for b in batches) == N_IMAGES
        assert batches[0]["orig_sizes"].shape[1] == 2


DET_OVERRIDES = [
    "model.backbone=swin_test",
    "model.d_model=32",
    "model.detector.d_model=32",
    "model.detector.dim_feedforward=64",
    "model.detector.num_heads=4",
    "model.detector.num_layers=2",
    "model.detector.num_levels=2",
    "model.detector.num_points=2",
    "model.detector.num_queries=6",
    "model.detector.num_classes=8",
    "model.num_classes=8",
    "dataset.scales=[48]",
    "dataset.max_size=64",
    "dataset.fixed_bucket=[64, 64]",
    "dataset.max_boxes=8",
    "optimizer.batch_size=1",          # x8 virtual devices = global 8
    "optimizer.num_workers=2",
    "optimizer.lr=1e-3",
    "optimizer.lr_backbone=1e-3",
]


class TestDetectorCLIResume:
    def test_cli_kill_and_resume_bit_exact(self, det_data, tmp_path,
                                           monkeypatch, capsys):
        """Run A trains epochs 0-1 straight.  Run B trains epoch 0, 'dies',
        then resumes (exp.resume=true) and trains epoch 1.  Their final
        params must be BIT-equal: the typed-template restore brings back
        params + Adam moments + step counter exactly, and the epoch-keyed
        host-aug/dropout streams replay epoch 1 identically."""
        import train_detector

        root, ann = det_data
        monkeypatch.chdir(tmp_path)
        base = DET_OVERRIDES + [f"dataset.roots.coco.ann_file={ann}",
                                f"dataset.roots.coco.img_root={root}"]

        train_detector.main(base + ["exp.name=detA", "optimizer.epochs=2"])
        train_detector.main(base + ["exp.name=detB", "optimizer.epochs=1"])
        capsys.readouterr()
        train_detector.main(base + ["exp.name=detB", "optimizer.epochs=2",
                                    "exp.resume=true"])
        out = capsys.readouterr().out
        assert "resumed detector training from epoch 0" in out
        assert "resume skipped" not in out

        from grit_tpu.engine import checkpoint as ckpt

        a = ckpt.restore_checkpoint("outputs/detA", "detector_last")
        b = ckpt.restore_checkpoint("outputs/detB", "detector_last")
        assert int(np.asarray(a["epoch"])) == int(np.asarray(b["epoch"])) == 1
        assert int(np.asarray(a["global_steps"])) == int(np.asarray(b["global_steps"]))
        flat_a = jax.tree_util.tree_leaves_with_path(a["params"])
        flat_b = {jax.tree_util.keystr(k): v for k, v in
                  jax.tree_util.tree_leaves_with_path(b["params"])}
        for k, va in flat_a:
            np.testing.assert_array_equal(
                np.asarray(va), np.asarray(flat_b[jax.tree_util.keystr(k)]),
                err_msg=jax.tree_util.keystr(k))
        # optimizer moments continued too (not re-initialized)
        mu_a = jax.tree.leaves(a["opt_state"])
        mu_b = jax.tree.leaves(b["opt_state"])
        for va, vb in zip(mu_a, mu_b):
            np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))

    def test_cli_warm_start_trims_query_embed(self, det_data, tmp_path,
                                              monkeypatch, capsys):
        """exp.checkpoint warm start (train_detector.py:134-153): loading a
        checkpoint trained with MORE queries trims query_embed rows when
        'query_embed' is in sp_names; merge is strict=False with counts."""
        import train_detector

        root, ann = det_data
        monkeypatch.chdir(tmp_path)
        base = DET_OVERRIDES + [f"dataset.roots.coco.ann_file={ann}",
                                f"dataset.roots.coco.img_root={root}"]
        # donor run with 10 queries
        train_detector.main(base + ["exp.name=donor", "optimizer.epochs=1",
                                    "model.detector.num_queries=10"])
        donor = os.path.abspath("outputs/donor/checkpoints/detector_last")
        capsys.readouterr()
        train_detector.main(base + [
            "exp.name=trimmed", "optimizer.epochs=1",
            f"exp.checkpoint={donor}",
            'optimizer.sp_names=["attr_head", "query_embed"]',
        ])
        out = capsys.readouterr().out
        assert "loaded" in out and "missing 0" in out

        from grit_tpu.engine import checkpoint as ckpt

        donor_tree = ckpt.restore_checkpoint("outputs/donor", "detector_last")

        def find_qe(t):
            for k, v in jax.tree_util.tree_leaves_with_path(t):
                if "query_embed" in jax.tree_util.keystr(k):
                    return np.asarray(v)
            raise AssertionError("no query_embed leaf")

        assert find_qe(donor_tree["params"]).shape[0] == 10
