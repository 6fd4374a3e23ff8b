"""Sinusoidal position encodings.

Math parity targets:
- ``sinusoid_encoding_table``: reference models/common/pos_embed.py:13-31
  (interleaved sin at even channels, cos at odd channels, row ``padding_idx``
  zeroed — the caption decoder uses padding_idx=0).
- ``masked_sin_pos_encoding``: reference models/common/swin_model.py:40-73
  (DETR-style normalized cumulative-sum 2-D encoding over the valid region).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def sinusoid_encoding_table(
    max_len: int, d_model: int, padding_idx: int | None = None
) -> jnp.ndarray:
    """[max_len, d_model] table: out[p, 2i] = sin(p / 10000^(2i/d)), out[p, 2i+1] = cos."""
    pos = np.arange(max_len, dtype=np.float32)[:, None]  # [L, 1]
    dim = np.arange(d_model // 2, dtype=np.float32)[None, :]  # [1, D/2]
    angle = pos / np.power(10000.0, 2 * dim / d_model)
    out = np.zeros((max_len, d_model), dtype=np.float32)
    out[:, 0::2] = np.sin(angle)
    out[:, 1::2] = np.cos(angle)
    if padding_idx is not None:
        out[padding_idx] = 0.0
    return jnp.asarray(out)


def masked_sin_pos_encoding(
    mask: jnp.ndarray,
    num_pos_feats: int,
    temperature: float = 10000.0,
    scale: float = 2 * math.pi,
) -> jnp.ndarray:
    """2-D sine encoding over the non-padded region.

    mask: bool [B, H, W], True = padding.  Returns [B, H, W, num_pos_feats]
    with the first half channels encoding y and the second half x.
    """
    half = num_pos_feats // 2
    not_mask = (~mask).astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    eps = 1e-6
    y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale

    dim_t = jnp.arange(half, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / half)

    pos_x = x_embed[:, :, :, None] / dim_t
    pos_y = y_embed[:, :, :, None] / dim_t
    # interleave sin/cos over channel pairs, matching the reference stack+flatten
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=4)
    pos_x = pos_x.reshape(*pos_x.shape[:3], -1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=4)
    pos_y = pos_y.reshape(*pos_y.shape[:3], -1)
    return jnp.concatenate([pos_y, pos_x], axis=3)
