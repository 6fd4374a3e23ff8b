"""Frozen-detector feature pre-extraction -> hdf5 (reference tools/extract_features.py).

Runs the detector over every Karpathy-split image and stores
``gri_feat/gri_mask/reg_feat/reg_mask`` per image id in one hdf5 file — the
fast path for 'freezing' caption training (reference :48-154, incl. the
rank-sharded write + merge; here one process writes directly).

  python tools/extract_features.py exp.checkpoint=det.pth [overrides...]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def extract_vis_features(detector_apply, params, config, dataloaders, out_path):
    """One feature row per UNIQUE image across train/valid/test (the dict
    loaders iterate images, not annotations), so the hdf5 serves every split
    incl. test-dict evaluation."""
    import h5py

    seen: set = set()
    ids, gri_f, gri_m, reg_f, reg_m = [], [], [], [], []
    for name in ("train_dict", "valid_dict", "test_dict"):
        for batch in dataloaders[name]:
            vis = detector_apply(params, batch["samples"])
            keep = [i for i, img_id in enumerate(batch["image_id"])
                    if int(img_id) not in seen]
            if not keep:
                continue
            seen.update(int(batch["image_id"][i]) for i in keep)
            gri_f.append(np.asarray(vis["gri_feat"], np.float16)[keep])
            gri_m.append(np.asarray(vis["gri_mask"])[keep])
            if "reg_feat" in vis:
                reg_f.append(np.asarray(vis["reg_feat"], np.float16)[keep])
                reg_m.append(np.asarray(vis["reg_mask"])[keep])
            ids += [int(batch["image_id"][i]) for i in keep]

    with h5py.File(out_path, "w") as f:
        f.create_dataset("image_ids", data=np.asarray(ids))
        f.create_dataset("gri_feat", data=np.concatenate(gri_f))
        f.create_dataset("gri_mask", data=np.concatenate(gri_m))
        if reg_f:
            f.create_dataset("reg_feat", data=np.concatenate(reg_f))
            f.create_dataset("reg_mask", data=np.concatenate(reg_m))
    print(f"wrote {len(ids)} image features to {out_path}")


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from grit_tpu.config import default_caption_config
    from grit_tpu.convert import load_detector_checkpoint
    from grit_tpu.data.coco import build_coco_dataloaders
    from grit_tpu.engine import checkpoint as ckpt
    from grit_tpu.models.detector import build_detector
    from grit_tpu.utils.nested import ImageBatch

    config = default_caption_config().apply_overrides(argv or sys.argv[1:])
    detector = build_detector(config, dtype=jnp.bfloat16)

    h, w = config.dataset.transform_cfg.size
    dummy = ImageBatch(jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w), bool))
    params = detector.init(jax.random.PRNGKey(0), dummy)
    det_ckpt = config.model.detector.checkpoint
    if det_ckpt and os.path.exists(det_ckpt):
        loaded = load_detector_checkpoint(det_ckpt)
        merged, miss, unexp = ckpt.load_params_flexible(
            params["params"], loaded["params"]
        )
        params = {"params": merged}
        print(f"detector load: missing={miss} unexpected={unexp}")

    apply_fn = jax.jit(lambda p, imgs: detector.apply(p, imgs))
    dataloaders, _ = build_coco_dataloaders(config, mode="finetune")
    extract_vis_features(
        apply_fn, params, config, dataloaders, config.dataset.hdf5_path
    )


if __name__ == "__main__":
    main()
