"""GRIT captioner: detector -> grid network -> caption generator.

Math parity: reference models/caption/transformer.py (class Transformer).

Training path (teacher forcing): detector features -> 3-layer grid
self-attention network (last layer's output, transformer.py:70-71) ->
caption generator log-probs.

Decoding runs through ``grit_tpu.decoding.beam_search`` — a ``lax.scan``
with fixed-shape KV caches instead of the reference's stateful-buffer
machinery (containers.py / transformer.py:75-132).

The model also accepts precomputed visual features (the reference's
``cached_features`` hdf5 path, transformer.py:64-67): pass a dict with
``gri_feat/gri_mask[/reg_feat/reg_mask]`` instead of an ``ImageBatch``.
"""

from __future__ import annotations

from typing import Any, Optional, Union

import flax.linen as nn
import jax.numpy as jnp

from grit_tpu.models.cap_generator import CaptionGenerator, DecodeCache
from grit_tpu.models.detector import Detector, build_detector
from grit_tpu.models.grid_net import GridFeatureNetwork
from grit_tpu.utils.nested import ImageBatch

VisInputs = dict


class GRITCaptioner(nn.Module):
    detector: Detector
    use_gri_feat: bool = True
    use_reg_feat: bool = True
    grid_feat_dim: int = 1024
    d_model: int = 512
    n_heads: int = 8
    vocab_size: int = 10201
    max_len: int = 54
    pad_idx: int = 1
    bos_idx: int = 2
    eos_idx: int = 3
    dropout: float = 0.2
    grid_net_layers: int = 3
    cap_gen_layers: int = 3
    decoder_name: str = "parallel"
    replicate_alpha_bug: bool = True
    dtype: Any = None

    def setup(self):
        self.grid_net = GridFeatureNetwork(
            n_layers=self.grid_net_layers,
            d_in=self.grid_feat_dim,
            d_model=self.d_model,
            n_heads=self.n_heads,
            dropout=self.dropout,
            dtype=self.dtype,
            name="grid_net",
        )
        self.cap_generator = CaptionGenerator(
            vocab_size=self.vocab_size,
            max_len=self.max_len,
            n_layers=self.cap_gen_layers,
            pad_idx=self.pad_idx,
            d_model=self.d_model,
            n_heads=self.n_heads,
            dropout=self.dropout,
            decoder_name=self.decoder_name,
            replicate_alpha_bug=self.replicate_alpha_bug,
            dtype=self.dtype,
            name="cap_generator",
        )

    def compute_vis(
        self,
        images: Union[ImageBatch, VisInputs],
        *,
        deterministic: bool = True,
    ) -> VisInputs:
        """Run detector (unless given cached features) + grid network."""
        if isinstance(images, ImageBatch):
            # uint8 wire format: normalization happens at the detector entry
            # (GRITDetector.__call__ -> utils.nested.device_normalize)
            vis = self.detector(images, deterministic=deterministic)
        else:
            vis = dict(images)
        if self.use_gri_feat:
            gri, _ = self.grid_net(
                vis["gri_feat"], vis["gri_mask"], deterministic=deterministic
            )
            vis["gri_feat"] = gri[:, -1]
        return vis

    def __call__(
        self,
        images: Union[ImageBatch, VisInputs],
        seq: jnp.ndarray,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Teacher-forced forward -> log-probs [B, L, V]."""
        vis = self.compute_vis(images, deterministic=deterministic)
        return self.cap_generator(seq, vis, deterministic=deterministic)

    def score_tokens(
        self,
        vis_inputs: VisInputs,
        seq: jnp.ndarray,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Teacher-forced log-probs over ALREADY-PROCESSED visual features
        (the output of ``compute_vis``) — unlike ``__call__``, which treats a
        dict input as raw cached detector features and re-runs grid_net."""
        return self.cap_generator(seq, vis_inputs, deterministic=deterministic)

    # ---- decoding interface (used under model.apply(..., method=...)) --------
    def precompute_vis_kv(self, vis_inputs: VisInputs):
        """Step-invariant projected visual K/V for fast decoding."""
        return self.cap_generator.precompute_vis_kv(vis_inputs)

    def decode_step(
        self,
        token: jnp.ndarray,
        t: jnp.ndarray,
        vis_inputs: VisInputs,
        cache: DecodeCache,
        *,
        deterministic: bool = True,
        vis_kv=None,
        vis_fold: int = 1,
    ):
        return self.cap_generator.decode_step(
            token, t, vis_inputs, cache, deterministic=deterministic,
            vis_kv=vis_kv, vis_fold=vis_fold,
        )

    def init_cache(self, batch: int, t_max: int) -> DecodeCache:
        return self.cap_generator.init_cache(batch, t_max)


def build_captioner(config, dtype=None) -> GRITCaptioner:
    detector = build_detector(config, dtype=dtype)
    return GRITCaptioner(
        detector=detector,
        use_gri_feat=config.model.use_gri_feat,
        use_reg_feat=config.model.use_reg_feat,
        grid_feat_dim=config.model.grid_feat_dim,
        d_model=config.model.d_model,
        n_heads=config.model.n_heads,
        vocab_size=config.model.vocab_size,
        max_len=config.model.max_len,
        pad_idx=config.model.pad_idx,
        bos_idx=config.model.bos_idx,
        eos_idx=config.model.eos_idx,
        dropout=config.model.dropout,
        grid_net_layers=config.model.grid_net.n_layers,
        cap_gen_layers=config.model.cap_generator.n_layers,
        decoder_name=config.model.cap_generator.decoder_name,
        replicate_alpha_bug=bool(config.model.get("replicate_alpha_bug", True)),
        dtype=dtype,
    )
