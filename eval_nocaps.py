"""NoCaps zero-shot evaluation CLI (reference eval_nocaps.py + nocaps.py).

Generates captions for the nocaps validation set and writes the submission
json.  The nocaps annotation file is COCO-image-info format.

  python eval_nocaps.py --checkpoint ckpt --ann nocaps_val.json --img-root dir
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


class NocapsDataset:
    """nocaps val images (reference datasets/caption/nocaps.py:12)."""

    def __init__(self, ann_file: str, img_root: str, transform):
        info = json.load(open(ann_file))
        self.images = info["images"]
        self.img_root = img_root
        self.transform = transform

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx):
        from PIL import Image

        info = self.images[idx]
        with Image.open(os.path.join(self.img_root, info["file_name"])) as im:
            return self.transform(im), info["id"]


def main(argv=None):
    from grit_tpu.utils.misc import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from grit_tpu.config import default_caption_config
    from grit_tpu.data.field import TextField
    from grit_tpu.data.transforms import get_transform
    from grit_tpu.engine.evaluator import make_caption_generator
    from grit_tpu.models.captioner import build_captioner
    from grit_tpu.utils.nested import batch_images
    from eval_caption import load_any_checkpoint

    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--ann", required=True)
    ap.add_argument("--img-root", required=True)
    ap.add_argument("--out", default="nocaps_val_results.json")
    ap.add_argument("--batch", type=int, default=16)
    args, overrides = ap.parse_known_args(argv)

    config = default_caption_config().apply_overrides(overrides)
    model = build_captioner(config, dtype=jnp.bfloat16)
    text_field = TextField(vocab_path=config.dataset.vocab_path)
    params = load_any_checkpoint(args.checkpoint, model, config)

    transform = get_transform(config.dataset.transform_cfg)["valid"]
    ds = NocapsDataset(args.ann, args.img_root, transform)
    generate = make_caption_generator(
        model, beam_size=config.model.beam_size, max_len=config.model.beam_len,
        bos_idx=config.model.bos_idx, eos_idx=config.model.eos_idx,
    )

    results = []
    for s in range(0, len(ds), args.batch):
        items = [ds[i] for i in range(s, min(s + args.batch, len(ds)))]
        imgs = batch_images(
            [it[0] for it in items], bucket_hw=tuple(config.dataset.transform_cfg.size)
        )
        out = generate(params, imgs, len(items))  # [B, T] top-1 beam
        caps = text_field.decode(np.asarray(out))
        results += [
            {"image_id": it[1], "caption": c} for it, c in zip(items, caps)
        ]
    with open(args.out, "w") as f:
        json.dump(results, f)
    print(f"wrote {len(results)} captions to {args.out}")


if __name__ == "__main__":
    main()
