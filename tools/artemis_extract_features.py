"""ArtEmis feature pre-extraction (reference tools/artemis_extract_features.py:29).

Same flow as tools/extract_features.py against the ArtEmis dataset layout:
a csv/json listing of painting image paths; emits the identical
``gri_feat/gri_mask/reg_feat/reg_mask`` hdf5.

  python tools/artemis_extract_features.py --listing paintings.json \
      --img-root /data/wikiart --out artemis_feats.h5 [overrides...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from grit_tpu.config import default_caption_config
    from grit_tpu.convert import load_detector_checkpoint
    from grit_tpu.data.transforms import get_transform
    from grit_tpu.engine import checkpoint as ckpt
    from grit_tpu.models.detector import build_detector
    from grit_tpu.utils.nested import ImageBatch, batch_images

    ap = argparse.ArgumentParser()
    ap.add_argument("--listing", required=True, help="json list of relative image paths")
    ap.add_argument("--img-root", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint", default="")
    ap.add_argument("--batch", type=int, default=16)
    args, overrides = ap.parse_known_args(argv)

    config = default_caption_config().apply_overrides(overrides)
    detector = build_detector(config, dtype=jnp.bfloat16)
    h, w = config.dataset.transform_cfg.size
    dummy = ImageBatch(jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w), bool))
    params = detector.init(jax.random.PRNGKey(0), dummy)
    if args.checkpoint and os.path.exists(args.checkpoint):
        loaded = load_detector_checkpoint(args.checkpoint)
        merged, miss, unexp = ckpt.load_params_flexible(params["params"], loaded["params"])
        params = {"params": merged}
        print(f"detector load: missing={miss} unexpected={unexp}")

    apply_fn = jax.jit(lambda p, imgs: detector.apply(p, imgs))
    transform = get_transform(config.dataset.transform_cfg)["valid"]
    paths = json.load(open(args.listing))

    import h5py
    from PIL import Image

    ids, gri_f, gri_m, reg_f, reg_m = [], [], [], [], []
    for s in range(0, len(paths), args.batch):
        chunk = paths[s:s + args.batch]
        arrs = []
        for rel in chunk:
            with Image.open(os.path.join(args.img_root, rel)) as im:
                arrs.append(transform(im))
        batch = batch_images(arrs, bucket_hw=(h, w))
        vis = apply_fn(params, batch)
        gri_f.append(np.asarray(vis["gri_feat"], np.float16))
        gri_m.append(np.asarray(vis["gri_mask"]))
        if "reg_feat" in vis:
            reg_f.append(np.asarray(vis["reg_feat"], np.float16))
            reg_m.append(np.asarray(vis["reg_mask"]))
        ids += list(range(s, s + len(chunk)))

    with h5py.File(args.out, "w") as f:
        f.create_dataset("image_ids", data=np.asarray(ids))
        f.create_dataset("paths", data=np.asarray(paths, dtype="S"))
        f.create_dataset("gri_feat", data=np.concatenate(gri_f))
        f.create_dataset("gri_mask", data=np.concatenate(gri_m))
        if reg_f:
            f.create_dataset("reg_feat", data=np.concatenate(reg_f))
            f.create_dataset("reg_mask", data=np.concatenate(reg_m))
    print(f"wrote {len(ids)} features to {args.out}")


if __name__ == "__main__":
    main()
