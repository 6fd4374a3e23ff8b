"""Tests for config tree and padded image batching."""

import numpy as np

from grit_tpu.config import Config, default_caption_config
from grit_tpu.utils.nested import batch_images, downsample_mask


class TestConfig:
    def test_defaults_match_reference_schema(self):
        cfg = default_caption_config()
        assert cfg.model.vocab_size == 10201
        assert cfg.model.detector.num_queries == 150
        assert cfg.model.pad_idx == 1 and cfg.model.bos_idx == 2 and cfg.model.eos_idx == 3
        assert cfg.dataset.transform_cfg.size == [384, 640]

    def test_dotted_override_and_merge(self):
        cfg = default_caption_config()
        cfg.apply_overrides(["model.d_model=768", "exp.name=test", "model.use_reg_feat=false"])
        assert cfg.model.d_model == 768
        assert cfg.exp.name == "test"
        assert cfg.model.use_reg_feat is False
        cfg.merge({"optimizer": {"batch_size": 32}})
        assert cfg.optimizer.batch_size == 32
        assert cfg.optimizer.xe_lr == 1e-4  # untouched by merge

    def test_env_interpolation(self, monkeypatch):
        monkeypatch.setenv("DATA_ROOT", "/tmp/data")
        cfg = default_caption_config()
        assert cfg.dataset.ann_root == "/tmp/data/annotations"

    def test_roundtrip(self, tmp_path):
        cfg = default_caption_config()
        p = str(tmp_path / "c.yaml")
        cfg.to_yaml(p)
        cfg2 = Config.from_yaml(p)
        assert cfg2.model.detector.num_classes == 1849


class TestImageBatch:
    def test_pad_to_bucket(self):
        imgs = [np.ones((100, 200, 3), np.float32), np.ones((384, 640, 3), np.float32)]
        batch = batch_images(imgs, bucket_hw=(384, 640))
        assert batch.images.shape == (2, 384, 640, 3)
        assert batch.mask.shape == (2, 384, 640)
        m = np.asarray(batch.mask)
        assert not m[0, :100, :200].any() and m[0, 100:, :].all() and m[0, :, 200:].all()
        assert not m[1].any()

    def test_auto_bucket_rounds_to_64(self):
        imgs = [np.zeros((100, 130, 3), np.float32)]
        batch = batch_images(imgs)
        assert batch.images.shape == (1, 128, 192, 3)

    def test_downsample_mask(self):
        imgs = [np.ones((64, 128, 3), np.float32)]
        batch = batch_images(imgs, bucket_hw=(128, 192))
        m8 = downsample_mask(batch.mask, 8)
        assert m8.shape == (1, 16, 24)
        assert not np.asarray(m8)[0, :8, :16].any()
        assert np.asarray(m8)[0, 8:, :].all()
