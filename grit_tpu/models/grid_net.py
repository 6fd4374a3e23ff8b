"""Grid feature network: self-attention encoder over Swin grid tokens.

Math parity: reference models/caption/grid_net.py:9-42.
Input projection 1024 -> 512 with ReLU + dropout + LN, then ``n_layers``
post-LN transformer layers; returns the per-layer outputs stacked on axis 1
(the captioner consumes the last: transformer.py:71).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from grit_tpu.models.attention import LN_EPS, FeedForward, MultiHeadAttention, dense


class TransformerLayer(nn.Module):
    d_model: int = 512
    n_heads: int = 8
    d_ff: int = 2048
    dropout: float = 0.1
    n_memories: int = 0
    dtype: Any = None

    def setup(self):
        self.mhatt = MultiHeadAttention(
            self.d_model, self.n_heads, self.dropout,
            n_memories=self.n_memories, dtype=self.dtype, name="mhatt",
        )
        self.pwff = FeedForward(self.d_model, self.d_ff, self.dropout, dtype=self.dtype, name="pwff")

    def __call__(self, q, k, v, mask=None, *, deterministic: bool = True):
        out = self.mhatt(q, k, v, mask, deterministic=deterministic)
        return self.pwff(out, deterministic=deterministic)


class GridFeatureNetwork(nn.Module):
    n_layers: int
    d_in: int = 1024
    d_model: int = 512
    n_heads: int = 8
    d_ff: int = 2048
    dropout: float = 0.1
    n_memories: int = 0
    dtype: Any = None

    def setup(self):
        self.fc = dense(self.d_model, "fc", dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout)
        self.layer_norm = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="layer_norm")
        self.layers = [
            TransformerLayer(
                self.d_model, self.n_heads, self.d_ff, self.dropout,
                n_memories=self.n_memories, dtype=self.dtype, name=f"layers_{i}",
            )
            for i in range(self.n_layers)
        ]

    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        *,
        deterministic: bool = True,
    ):
        """x: [B, S, d_in]; mask: bool [B, 1, 1, S] (True = pad).

        Returns (outs [B, n_layers, S, d_model], mask).
        """
        out = self.layer_norm(
            self.drop(nn.relu(self.fc(x)), deterministic=deterministic)
        )
        outs = []
        for layer in self.layers:
            out = layer(out, out, out, mask, deterministic=deterministic)
            outs.append(out[:, None])
        return jnp.concatenate(outs, axis=1), mask
