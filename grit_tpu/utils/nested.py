"""Padded image batches with validity masks.

TPU-first replacement for the reference ``NestedTensor`` (reference:
engine/utils.py:250-295).  The reference pads each batch to its max H/W —
a dynamic shape per batch, which would force an XLA recompile every step.
Here we pad to a *fixed bucket* (default: the transform's max size rounded up
to a multiple of 64 so every Swin stage divides evenly), giving one compiled
program for the whole run.

Layout is NHWC (channels last) — the natural layout for TPU convolutions.
``mask`` follows the reference convention: True on padded pixels.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np


class ImageBatch(NamedTuple):
    """A batch of padded images plus a pixel validity mask.

    images: float [B, H, W, 3]
    mask:   bool  [B, H, W] — True where the pixel is padding.
    """

    images: jnp.ndarray
    mask: jnp.ndarray

    @property
    def batch_size(self) -> int:
        return self.images.shape[0]


def round_up(x: int, multiple: int) -> int:
    return ((x + multiple - 1) // multiple) * multiple


def batch_images(
    images: Sequence[np.ndarray],
    bucket_hw: tuple[int, int] | None = None,
    pad_multiple: int = 64,
) -> ImageBatch:
    """Pad a list of HWC images to a common static shape with a pad mask.

    Unlike the reference's pad-to-max (engine/utils.py:278-295), the target
    shape is independent of batch content when ``bucket_hw`` is given, keeping
    XLA shapes static.  ``pad_multiple=64`` guarantees exact divisibility down
    to the Swin H/64 grid so no per-stage re-padding is needed.
    """
    if bucket_hw is None:
        h = max(im.shape[0] for im in images)
        w = max(im.shape[1] for im in images)
        bucket_hw = (round_up(h, pad_multiple), round_up(w, pad_multiple))
    bh, bw = bucket_hw
    batch = np.zeros((len(images), bh, bw, 3), dtype=np.float32)
    mask = np.ones((len(images), bh, bw), dtype=bool)
    for i, im in enumerate(images):
        h, w = im.shape[0], im.shape[1]
        if h > bh or w > bw:
            raise ValueError(f"image {im.shape} exceeds bucket {bucket_hw}")
        batch[i, :h, :w] = im
        mask[i, :h, :w] = False
    return ImageBatch(jnp.asarray(batch), jnp.asarray(mask))


def downsample_mask(mask: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Downsample a [B, H, W] pad mask to a [B, H/s, W/s] feature-level mask.

    The reference uses nearest ``F.interpolate`` on the float mask
    (models/caption/detector.py:49-51).  With H, W multiples of the stride
    this equals strided subsampling at the top-left corner of each cell,
    matching torch's nearest-neighbor index choice (floor of src index).
    """
    b, h, w = mask.shape
    # torch F.interpolate(nearest) picks src index floor(dst * scale), with
    # scale = h / (h // stride) == stride for divisible shapes.
    return mask[:, ::stride, ::stride]
