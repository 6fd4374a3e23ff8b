"""Box format conversions and (generalized) IoU.

Math parity: reference utils/box_ops.py:17-96.  All functions are pure jnp and
batch-polymorphic over leading dims; boxes are [..., 4].
"""

from __future__ import annotations

import jax.numpy as jnp


def box_cxcywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1)


def box_xyxy_to_cxcywh(b: jnp.ndarray) -> jnp.ndarray:
    x0, y0, x1, y1 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=-1)


def box_area(b: jnp.ndarray) -> jnp.ndarray:
    return (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pairwise IoU between [N, 4] and [M, 4] xyxy boxes -> ([N, M], union [N, M])."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    return inter / union, union


def generalized_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise GIoU [N, M] for xyxy boxes (reference utils/box_ops.py:41-69)."""
    iou, union = box_iou(boxes1, boxes2)
    lt = jnp.minimum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.maximum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / area


def masks_to_boxes(masks: jnp.ndarray) -> jnp.ndarray:
    """Tight xyxy boxes around binary masks [N, H, W] (utils/box_ops.py:72-96).

    Empty masks produce a zero box.
    """
    n, h, w = masks.shape
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    m = masks.astype(jnp.float32)
    big = 1e8
    x_min = jnp.min(jnp.where(m > 0, xs, big), axis=(1, 2))
    x_max = jnp.max(jnp.where(m > 0, xs, -big), axis=(1, 2))
    y_min = jnp.min(jnp.where(m > 0, ys, big), axis=(1, 2))
    y_max = jnp.max(jnp.where(m > 0, ys, -big), axis=(1, 2))
    any_px = m.sum((1, 2)) > 0
    box = jnp.stack([x_min, y_min, x_max, y_max], axis=1)
    return jnp.where(any_px[:, None], box, 0.0)


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """logit with the reference's clamping (utils/misc.py:516)."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1 - x, eps, None)
    return jnp.log(x1 / x2)
