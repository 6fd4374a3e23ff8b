"""Detection post-processing: top-100 sigmoid scores -> absolute xyxy boxes.

Parity: reference models/detection/od_losses.py:326-356 (PostProcess).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from grit_tpu.utils.boxes import box_cxcywh_to_xyxy


@jax.jit
def postprocess(pred_logits: jnp.ndarray, pred_boxes: jnp.ndarray, target_sizes: jnp.ndarray):
    """pred_logits [B, Q, C], pred_boxes [B, Q, 4] cxcywh in [0,1],
    target_sizes [B, 2] (h, w) -> dict of scores/labels/boxes [B, 100, ...]."""
    b, q, c = pred_logits.shape
    prob = jax.nn.sigmoid(pred_logits).reshape(b, q * c)
    # top-100 like the reference (od_losses.py:340), capped for small models
    # whose Q*C < 100 (tiny test configs) where a fixed k would be invalid
    scores, idx = jax.lax.top_k(prob, min(100, q * c))
    topk_boxes = idx // c
    labels = idx % c
    boxes = box_cxcywh_to_xyxy(pred_boxes)
    boxes = jnp.take_along_axis(boxes, topk_boxes[..., None], axis=1)
    img_h, img_w = target_sizes[:, 0], target_sizes[:, 1]
    scale = jnp.stack([img_w, img_h, img_w, img_h], axis=1)[:, None, :]
    return {"scores": scores, "labels": labels, "boxes": boxes * scale}
