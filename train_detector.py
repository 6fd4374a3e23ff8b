"""Detector pre-training CLI (reference train_detector.py).

Multi-dataset object-detection training of the Swin + deformable-decoder
detector, driven by the hook-based solver.  One process drives the local
mesh (the reference's 8-node x 8-GPU DDP becomes a data-parallel jax mesh).

  python train_detector.py exp.name=det1 dataset.roots.coco.ann_file=... ...
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    from grit_tpu.utils.misc import enable_compile_cache

    enable_compile_cache()
    from grit_tpu.config import Config, default_detection_config
    from grit_tpu.detection.datasets import build_train_dataset, pad_targets
    from grit_tpu.detection.det_transforms import make_transforms
    from grit_tpu.detection.detector import build_detection_model
    from grit_tpu.detection.hooks import (
        CheckpointHook,
        EpochLRHook,
        ProgressHook,
        ScalarWriterHook,
        TextLoggingHook,
        WarmupLRHook,
    )
    from grit_tpu.detection.solver import Trainer, make_detector_train_step
    from grit_tpu.engine.optim import build_optimizer
    from grit_tpu.engine.xe import TrainState
    from grit_tpu.parallel.mesh import make_mesh, replicate
    from grit_tpu.utils.nested import batch_images

    config = default_detection_config().apply_overrides(argv or sys.argv[1:])
    workdir = os.path.join("outputs", config.exp.name)
    os.makedirs(workdir, exist_ok=True)

    # host-side aug RNGs, seed + rank (reference train_detector.py:116-120)
    from grit_tpu.utils.misc import seed_host_rngs

    seed_host_rngs(config.exp.seed, per_process=True)
    mesh = make_mesh()
    model, criterion = build_detection_model(config)

    # batched loader over the concat dataset with fixed-bucket padding
    dataset = build_train_dataset(config)
    transform = make_transforms(
        "train", scales=list(config.dataset.scales), max_size=config.dataset.max_size
    )
    bs = config.optimizer.batch_size * jax.device_count()
    max_boxes = int(config.dataset.get("max_boxes", 100))

    def batches(epoch):
        import random as _random

        idx = list(range(len(dataset)))
        _random.Random(config.exp.seed + epoch).shuffle(idx)
        for s in range(0, len(idx) - bs + 1, bs):
            imgs, tgts = [], []
            for i in idx[s:s + bs]:
                img, tgt = dataset[i]
                arr, tgt = transform(img, tgt)
                imgs.append(arr)
                tgts.append(tgt)
            samples = batch_images(imgs, pad_multiple=64)
            targets = pad_targets(
                tgts, max_boxes,
                config.model.get("num_attr_classes", 0)
                if config.model.get("with_attributes") else 0,
            )
            yield {"samples": samples, "targets": targets}

    class LoaderShim:
        def __init__(self):
            self.epoch = 0

        def __len__(self):
            return max(1, len(dataset) // bs)

        def __iter__(self):
            return batches(self.epoch)

    # init
    dummy = batch_images([np.zeros((64, 64, 3), np.float32)])
    params = model.init(jax.random.PRNGKey(config.exp.seed), dummy, training=True)
    params = replicate(params, mesh)
    tx, labels = build_optimizer(
        params, weight_decay=config.optimizer.weight_decay
    )
    state = TrainState.create(params, tx)
    step_fn = make_detector_train_step(
        model, criterion, tx, labels,
        lr=config.optimizer.lr,
        lr_backbone=config.optimizer.lr_backbone,
        clip_max_norm=config.optimizer.clip_max_norm,
    )

    hooks = [
        WarmupLRHook(),
        EpochLRHook(list(config.optimizer.lr_drop_epochs), config.optimizer.lr_drop_factor),
        ProgressHook(),
        TextLoggingHook(os.path.join(workdir, "detector_log.txt")),
        ScalarWriterHook(os.path.join(workdir, "scalars.jsonl")),
        CheckpointHook(workdir),
    ]
    loader = LoaderShim()

    # validation: COCO-format val sets -> postprocess -> mAP evaluator
    validers = []
    from grit_tpu.detection.coco_eval import CocoEvaluator
    from grit_tpu.detection.datasets import DetectionDataset
    from grit_tpu.detection.solver import Valider

    for name, spec in config.dataset.get("valid_roots", Config({})).items():
        vds = DetectionDataset(spec["ann_file"], spec.get("img_root", ""))
        vtransform = make_transforms("valid", max_size=config.dataset.max_size)

        def val_batches(vds=vds, vtransform=vtransform):
            vb = max(1, config.optimizer.batch_size)
            for s in range(0, len(vds), vb):
                imgs, metas = [], []
                for i in range(s, min(s + vb, len(vds))):
                    img, tgt = vds[i]
                    arr, _ = vtransform(img, dict(tgt))
                    imgs.append(arr)
                    metas.append(tgt)
                yield {
                    "samples": batch_images(imgs, pad_multiple=64),
                    "orig_sizes": jnp.asarray([m["orig_size"] for m in metas]),
                    "image_id": [m["image_id"] for m in metas],
                }

        class VLoader:
            def __iter__(self):
                return val_batches()

        gt = {
            int(vds.ids[i]): {
                "boxes": np.asarray([
                    [a["bbox"][0], a["bbox"][1],
                     a["bbox"][0] + a["bbox"][2], a["bbox"][1] + a["bbox"][3]]
                    for a in vds.anns_by_image[vds.ids[i]]
                ]),
                "labels": np.asarray([
                    a["category_id"] for a in vds.anns_by_image[vds.ids[i]]
                ]),
            }
            for i in range(len(vds))
        }
        validers.append(Valider(
            model, lambda: trainer.state, VLoader(),
            evaluator_factory=lambda gt=gt: CocoEvaluator(gt),
        ))

    # validers run inside each trainer epoch, BEFORE the after_epoch hooks,
    # so checkpoint topk and the text/scalar logs see this epoch's mAP
    trainer = Trainer(step_fn, state, loader, rng=jax.random.PRNGKey(0),
                      hooks=hooks, mesh=mesh, validers=validers)

    with mesh:
        for epoch in range(config.optimizer.epochs):
            loader.epoch = epoch
            trainer.state = trainer.run_epoch(epoch)


if __name__ == "__main__":
    main()
