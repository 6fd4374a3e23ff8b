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


#: ImageNet normalization constants (reference datasets/caption/transforms
#: /__init__.py:6-7) — shared by the host transform pipeline and the
#: on-device normalization below.
IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


class ImageBatch(NamedTuple):
    """A batch of padded images plus a pixel validity mask.

    images: float [B, H, W, 3] ImageNet-normalized, OR uint8 [B, H, W, 3]
            raw RGB (the compact wire format — models normalize on device
            via ``device_normalize``; 4x less host->device transfer).
    mask:   bool  [B, H, W] — True where the pixel is padding.
    """

    images: jnp.ndarray
    mask: jnp.ndarray

    @property
    def batch_size(self) -> int:
        return self.images.shape[0]


def device_normalize(batch: ImageBatch) -> ImageBatch:
    """ImageNet-normalize a uint8 ImageBatch on device (f32 passes through).

    Reproduces the host pipeline exactly: ``(u8/255 - mean)/std`` in f32,
    then padded pixels forced to 0.0 — the reference normalizes BEFORE
    padding with zeros (engine/utils.py:278-295), so pad positions carry
    0.0 in normalized space, not normalize(0).  Dtype-gated at trace time:
    already-normalized float input (the historical wire format, still used
    by the parity tools and direct-tensor tests) is returned unchanged.
    """
    if batch.images.dtype != jnp.uint8:
        return batch
    x = batch.images.astype(jnp.float32) / 255.0
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    x = jnp.where(batch.mask[..., None], 0.0, x)
    return ImageBatch(x, batch.mask)


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
    # dtype follows the transform output: uint8 (device-normalized wire
    # format) or host-normalized float32
    dtype = images[0].dtype if len(images) else np.float32
    batch = np.zeros((len(images), bh, bw, 3), dtype=dtype)
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
