"""Caption-flavor detector: Swin backbone + deformable decoder -> dual features.

Math parity: reference models/caption/detector.py.

- grid features = the extra H/64 Swin map flattened: [B, (H/64)(W/64), 1024]
  with its pad mask broadcast to attention shape [B, 1, 1, S] (:54-55);
- region features = last decoder layer's 150 query states [B, 150, d_model]
  with an all-valid mask (:60-61);
- per-level 1x1 conv + GroupNorm(32) input projections (:28-33).

Per-level pad masks come from strided subsampling of the image mask
(equivalent to the reference's nearest interpolation for our multiple-of-64
padded inputs — see grit_tpu.utils.nested.downsample_mask).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from grit_tpu.models.det_module import DetectionModule
from grit_tpu.models.swin import SwinTransformer, swin_base_win12_384
from grit_tpu.utils.nested import (ImageBatch, device_normalize,
                                   downsample_mask)


class Detector(nn.Module):
    backbone: SwinTransformer
    det_module: DetectionModule | None = None
    use_gri_feat: bool = True
    use_reg_feat: bool = True
    hidden_dim: int = 512
    dtype: Any = None

    @nn.compact
    def __call__(self, images: ImageBatch, *, deterministic: bool = True) -> dict:
        # uint8 wire format: loaders ship raw RGB (4x less host->device
        # transfer); ImageNet normalize runs here on device.  Float input
        # (parity tools, direct-tensor tests) passes through unchanged.
        images = device_normalize(images)
        features = self.backbone(images.images, deterministic=deterministic)
        # feature strides: stage outputs 1..n-1 plus the extra merged map
        # (reference strides 8/16/32/64 for the 4-stage patch-4 backbone)
        n_stages = len(self.backbone.depths)
        patch = self.backbone.patch_size
        strides = [patch * 2 ** s for s in range(1, n_stages)] + [patch * 2 ** n_stages]
        masks = [downsample_mask(images.mask, s) for s in strides]

        b = images.images.shape[0]
        out = {}
        if self.use_gri_feat:
            gri = features[-1]
            out["gri_feat"] = gri.reshape(b, -1, gri.shape[-1])
            out["gri_mask"] = masks[-1].reshape(b, 1, 1, -1)

        if self.use_reg_feat:
            srcs = []
            for lvl, feat in enumerate(features):
                x = nn.Conv(
                    self.hidden_dim, (1, 1), name=f"input_proj_{lvl}_conv",
                    dtype=self.dtype,
                )(feat)
                x = nn.GroupNorm(
                    num_groups=32, epsilon=1e-5, dtype=self.dtype,
                    name=f"input_proj_{lvl}_norm",
                )(x)
                srcs.append(x)
            hs, _, _ = self.det_module(srcs, masks, deterministic=deterministic)
            out["reg_feat"] = hs[-1]
            out["reg_mask"] = jnp.zeros((b, 1, 1, hs[-1].shape[1]), bool)
        return out


def _on_tpu() -> bool:
    import jax

    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _default_msda_impl() -> str:
    """Pallas kernel on TPU (fastest measured); fused flat gather elsewhere
    (the kernel needs the Mosaic TPU compiler)."""
    return "pallas" if _on_tpu() else "flat"


def resolve_kernel_config(config) -> tuple[bool, str]:
    """Resolve the TPU-kernel knobs shared by the caption and detection
    builders: ``(fused_attn, msda_impl)``.

    One place on purpose: the two build paths drifted once (detector
    pre-training silently trained on the slow paths until commit 59f2b6f),
    so any new kernel knob must be resolved here and picked up by both.

    ``model.fused_win_attn`` accepts JSON booleans plus the usual CLI
    spellings (``true/false``, ``on/off``, ``yes/no``, ``1/0``, any case);
    empty string means auto (fused kernels on TPU).  A typo raises instead
    of silently force-enabling the kernels — ``bool("off")`` is True, and
    on a non-TPU host that "enable" crashes at first forward when the
    Mosaic kernels fail to lower.
    """
    fused = config.model.get("fused_win_attn", "")
    if isinstance(fused, str):
        s = fused.strip().lower()
        if s == "":
            fused_attn = _on_tpu()
        elif s in ("1", "true", "yes", "on"):
            fused_attn = True
        elif s in ("0", "false", "no", "off"):
            fused_attn = False
        else:
            raise ValueError(
                f"model.fused_win_attn={fused!r}: expected true/false "
                "(or empty for backend auto-selection)"
            )
    else:
        fused_attn = bool(fused)
    return fused_attn, config.model.get("msda_impl") or _default_msda_impl()


def build_detector(config, dtype=None) -> Detector:
    """Assemble backbone + det module from a caption config (detector.py:65-84)."""
    from grit_tpu.models.swin import build_swin

    fused_attn, msda_impl = resolve_kernel_config(config)
    backbone = build_swin(
        config.model.get("backbone", "swin_base_win7_384_22k"),
        dtype=dtype,
        use_checkpoint=bool(config.model.get("use_checkpoint", False)),
        # "" = auto: the fused VMEM-resident attention kernel on TPU
        fused_attn=fused_attn,
        # coco_config.yaml:29 (=2): patch embed + stage 0 frozen during
        # finetune (swin_model.py:622-637); optimizer-side mask in
        # engine/optim.py::swin_frozen_stages_predicate matches this
        frozen_stages=int(config.model.get("frozen_stages", -1)),
    )
    det_cfg = config.model.detector
    det_module = None
    if config.model.use_reg_feat:
        det_module = DetectionModule(
            d_model=det_cfg.d_model,
            n_heads=det_cfg.num_heads,
            num_layers=det_cfg.num_layers,
            dim_feedforward=det_cfg.dim_feedforward,
            dropout=det_cfg.dropout,
            num_levels=det_cfg.num_levels,
            num_points=det_cfg.num_points,
            num_classes=det_cfg.num_classes,
            num_queries=det_cfg.num_queries,
            with_box_refine=det_cfg.with_box_refine,
            msda_impl=msda_impl,
            dtype=dtype,
            name="det_module",
        )
    return Detector(
        backbone=backbone,
        det_module=det_module,
        hidden_dim=config.model.d_model,
        use_gri_feat=config.model.use_gri_feat,
        use_reg_feat=config.model.use_reg_feat,
        dtype=dtype,
        name="detector",
    )
