"""Window helpers for shifted-window (Swin) attention.

Pure-jnp reshape/roll formulations that XLA fuses into the surrounding
attention graph; no kernel needed.  Semantics match the reference
(models/common/swin_model.py:76-105 window partition/reverse,
:423-441 shifted-window attention mask, :134-145 relative-position index).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def window_partition(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B * nH * nW, window*window, C] (H, W divisible by window)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window, window, w // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window * window, c)


def window_reverse(windows: jnp.ndarray, window: int, h: int, w: int) -> jnp.ndarray:
    """Inverse of ``window_partition``: [B*nW, window*window, C] -> [B, H, W, C]."""
    nwin = (h // window) * (w // window)
    b = windows.shape[0] // nwin
    c = windows.shape[-1]
    x = windows.reshape(b, h // window, w // window, window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def relative_position_index(window_hw: tuple[int, int]) -> np.ndarray:
    """[Wh*Ww, Wh*Ww] int index into the (2Wh-1)(2Ww-1) relative-bias table."""
    wh, ww = window_hw
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))  # [2, Wh, Ww]
    flat = coords.reshape(2, -1)  # [2, N]
    rel = flat[:, :, None] - flat[:, None, :]  # [2, N, N]
    rel = rel.transpose(1, 2, 0)  # [N, N, 2]
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)


def shifted_window_mask(hp: int, wp: int, window: int, shift: int) -> np.ndarray:
    """Additive attention mask [nW, window², window²] for SW-MSA on a padded grid.

    0 within a contiguous region, -100 across regions (the reference's exact
    constant, swin_model.py:441).  Static: computed once per (Hp, Wp) at trace
    time with numpy, so XLA sees a constant.
    """
    img = np.zeros((1, hp, wp, 1), dtype=np.float32)
    h_slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    w_slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    cnt = 0
    for hs in h_slices:
        for ws in w_slices:
            img[:, hs, ws, :] = cnt
            cnt += 1
    # partition into windows
    img = img.reshape(1, hp // window, window, wp // window, window, 1)
    img = img.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window)
    diff = img[:, None, :] - img[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)
