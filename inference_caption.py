"""Single-image caption inference CLI (reference inference_caption.py:32-69).

  python inference_caption.py --image path.jpg --checkpoint ckpt.pth [--beam 5]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def caption_image(image_path, checkpoint, config=None, beam_size=None):
    from PIL import Image

    from grit_tpu.config import default_caption_config
    from grit_tpu.data.field import TextField
    from grit_tpu.data.transforms import get_transform
    from grit_tpu.engine.evaluator import make_caption_generator
    from grit_tpu.models.captioner import build_captioner
    from grit_tpu.utils.nested import batch_images

    config = config or default_caption_config()
    beam = beam_size or config.model.beam_size
    model = build_captioner(config, dtype=jnp.bfloat16)
    text_field = TextField(vocab_path=config.dataset.vocab_path)

    transform = get_transform(config.dataset.transform_cfg)["valid"]
    with Image.open(image_path) as im:
        arr = transform(im)
    batch = batch_images([arr], bucket_hw=tuple(config.dataset.transform_cfg.size))

    from eval_caption import load_any_checkpoint

    params = load_any_checkpoint(checkpoint, model, config)
    generate = make_caption_generator(
        model, beam_size=beam, max_len=config.model.beam_len,
        bos_idx=config.model.bos_idx, eos_idx=config.model.eos_idx,
    )
    out = generate(params, batch, 1)  # [B, T] best beam
    return text_field.decode(np.asarray(out))[0]


def main(argv=None):
    from grit_tpu.utils.misc import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--beam", type=int, default=None)
    ap.add_argument("--vocab", default=None)
    args, overrides = ap.parse_known_args(argv)

    from grit_tpu.config import default_caption_config

    config = default_caption_config().apply_overrides(overrides)
    if args.vocab:
        config.dataset.vocab_path = args.vocab
    caption = caption_image(args.image, args.checkpoint, config, args.beam)
    print(f"Caption: {caption}")


if __name__ == "__main__":
    main()
