"""Shared tiny model builders for tests (small dims, real architecture)."""

from grit_tpu.models.captioner import GRITCaptioner
from grit_tpu.models.det_module import DetectionModule
from grit_tpu.models.detector import Detector
from grit_tpu.models.swin import SwinTransformer

VOCAB = 50
D = 32
MAXLEN = 12
PAD, BOS, EOS = 1, 2, 3


def tiny_captioner(frozen_stages: int = -1) -> GRITCaptioner:
    backbone = SwinTransformer(
        embed_dim=16, depths=(1, 1), num_heads=(2, 2), window=4,
        drop_path_rate=0.0, pos_dim=D, frozen_stages=frozen_stages,
    )
    det = DetectionModule(
        d_model=D, n_heads=4, num_layers=2, dim_feedforward=64,
        num_levels=2, num_points=2, num_classes=10, num_queries=6,
        name="det_module",
    )
    detector = Detector(backbone=backbone, det_module=det, hidden_dim=D)
    return GRITCaptioner(
        detector=detector,
        grid_feat_dim=D,
        d_model=D,
        n_heads=4,
        vocab_size=VOCAB,
        max_len=MAXLEN,
        pad_idx=PAD,
        bos_idx=BOS,
        eos_idx=EOS,
        dropout=0.1,
        grid_net_layers=2,
        cap_gen_layers=2,
    )
