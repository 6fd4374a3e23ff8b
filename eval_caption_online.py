"""COCO online-server evaluation CLI (reference eval_caption_online.py:19-71).

Generates ``result_test.json`` / ``result_valid.json`` from the COCO
test2014 / val2014 images for the leaderboard submission format.

  python eval_caption_online.py exp.checkpoint=ckpt [overrides...]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np


def main(argv=None):
    from grit_tpu.utils.misc import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from grit_tpu.config import default_caption_config
    from grit_tpu.data.field import TextField
    from grit_tpu.data.transforms import minmax_resize, to_normalized_array
    from grit_tpu.engine.evaluator import make_caption_generator
    from grit_tpu.models.captioner import build_captioner
    from grit_tpu.utils.nested import batch_images
    from eval_caption import load_any_checkpoint

    config = default_caption_config().apply_overrides(argv or sys.argv[1:])
    model = build_captioner(config, dtype=jnp.bfloat16)
    text_field = TextField(vocab_path=config.dataset.vocab_path)
    params = load_any_checkpoint(config.exp.checkpoint, model, config)
    generate = make_caption_generator(
        model, beam_size=config.model.beam_size, max_len=config.model.beam_len,
        bos_idx=config.model.bos_idx, eos_idx=config.model.eos_idx,
    )

    data_root = os.environ.get("DATA_ROOT", "")
    splits = {
        "test": (os.path.join(data_root, "test2014"),
                 os.path.join(data_root, "annotations/image_info_test2014.json")),
        "valid": (os.path.join(data_root, "val2014"),
                  os.path.join(data_root, "annotations/captions_val2014.json")),
    }

    from PIL import Image

    for split, (root, ann) in splits.items():
        images = json.load(open(ann))["images"]
        results = []
        batch = 16
        for s in range(0, len(images), batch):
            chunk = images[s:s + batch]
            arrs = []
            for info in chunk:
                with Image.open(os.path.join(root, info["file_name"])) as im:
                    # online eval uses minmax resize (reference TestDataset,
                    # datasets/caption/coco.py:134-135)
                    arr = to_normalized_array(minmax_resize(im.convert("RGB"), (384, 640)))
                arrs.append(arr)
            imgs = batch_images(arrs, bucket_hw=(640, 640))
            out = generate(params, imgs, len(chunk))  # [B, T] top-1 beam
            caps = text_field.decode(np.asarray(out))
            results += [
                {"image_id": info["id"], "caption": c}
                for info, c in zip(chunk, caps)
            ]
        with open(f"result_{split}.json", "w") as f:
            json.dump(results, f)
        print(f"wrote result_{split}.json ({len(results)} captions)")


if __name__ == "__main__":
    main()
