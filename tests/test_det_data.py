"""Detection data-layer tests: synthetic COCO-format dataset, transforms,
target padding, concat/registry."""

import json

import numpy as np
import pytest
from PIL import Image

from grit_tpu.detection.datasets import (
    ConcatDataset,
    DetectionDataset,
    pad_targets,
)
from grit_tpu.detection.det_transforms import (
    Normalize,
    RandomHorizontalFlip,
    hflip,
    make_transforms,
    resize,
)


@pytest.fixture(scope="module")
def det_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("det")
    images, anns = [], []
    for i in range(3):
        fname = f"img_{i}.jpg"
        Image.new("RGB", (100, 80), (50 * i, 100, 150)).save(root / fname)
        images.append({"id": i, "file_name": fname, "height": 80, "width": 100})
        anns.append({"id": 10 * i, "image_id": i, "category_id": 1 + i % 2,
                     "bbox": [10, 10, 30, 20], "area": 600})
        anns.append({"id": 10 * i + 1, "image_id": i, "category_id": 2,
                     "bbox": [50, 40, 20, 20], "area": 400})
    ann_file = root / "ann.json"
    json.dump({"images": images, "annotations": anns}, open(ann_file, "w"))
    return root, str(ann_file)


class TestDataset:
    def test_loads_and_formats(self, det_root):
        root, ann = det_root
        ds = DetectionDataset(ann, str(root))
        assert len(ds) == 3
        img, tgt = ds[0]
        assert img.size == (100, 80)
        np.testing.assert_array_equal(tgt["boxes"][0], [10, 10, 40, 30])
        assert tgt["labels"].tolist() == [1, 2]

    def test_exclude_ids(self, det_root):
        root, ann = det_root
        ds = DetectionDataset(ann, str(root), exclude_image_ids={1})
        assert len(ds) == 2

    def test_concat_num_copies(self, det_root):
        root, ann = det_root
        ds = DetectionDataset(ann, str(root))
        cat = ConcatDataset([ds, ds], num_copies=[2, 1])
        assert len(cat) == 9
        _, t0 = cat[0]
        _, t6 = cat[6]
        assert t0["image_id"] == t6["image_id"] == 0


class TestTransforms:
    def test_hflip_boxes(self, det_root):
        root, ann = det_root
        ds = DetectionDataset(ann, str(root))
        img, tgt = ds[0]
        fimg, ftgt = hflip(img, tgt)
        # [10, 40] -> [100-40, 100-10]
        np.testing.assert_array_equal(ftgt["boxes"][0], [60, 10, 90, 30])

    def test_resize_scales_boxes_and_area(self, det_root):
        root, ann = det_root
        ds = DetectionDataset(ann, str(root))
        img, tgt = ds[0]
        rimg, rtgt = resize(img, tgt, 160, max_size=400)
        assert min(rimg.size) == 160
        scale = 160 / 80
        np.testing.assert_allclose(rtgt["boxes"][0], np.asarray([10, 10, 40, 30]) * scale)
        np.testing.assert_allclose(rtgt["area"][0], 600 * scale * scale)

    def test_train_preset_normalizes_cxcywh(self, det_root):
        root, ann = det_root
        ds = DetectionDataset(ann, str(root))
        img, tgt = ds[0]
        t = make_transforms("train", scales=[64, 96], max_size=200)
        arr, out = t(img, tgt)
        assert arr.ndim == 3 and arr.shape[2] == 3
        if len(out["boxes"]):
            b = out["boxes"]
            assert ((b >= 0) & (b <= 1)).all()

    def test_normalize_converts_format(self, det_root):
        root, ann = det_root
        ds = DetectionDataset(ann, str(root))
        img, tgt = ds[0]
        arr, out = Normalize()(img, tgt)
        # first box: xyxy [10,10,40,30] on 100x80 -> cxcywh (0.25, 0.25, 0.3, 0.25)
        np.testing.assert_allclose(out["boxes"][0], [0.25, 0.25, 0.3, 0.25], atol=1e-6)

    def test_uint8_wire_matches_host_normalized(self, det_root):
        """device_norm=True (the default) emits raw uint8; device_normalize
        reproduces the host-normalized float path exactly, boxes identical."""
        from grit_tpu.utils.nested import batch_images, device_normalize

        root, ann = det_root
        ds = DetectionDataset(ann, str(root))
        img, tgt = ds[0]
        a8, out8 = Normalize()(img, tgt)
        a32, out32 = Normalize(device_norm=False)(img, tgt)
        assert a8.dtype == np.uint8 and a32.dtype == np.float32
        np.testing.assert_array_equal(out8["boxes"], out32["boxes"])
        b8 = device_normalize(batch_images([a8], pad_multiple=32))
        b32 = batch_images([a32], pad_multiple=32)
        np.testing.assert_allclose(
            np.asarray(b8.images), np.asarray(b32.images), atol=1e-6)
        assert np.all(np.asarray(b8.images)[np.asarray(b8.mask)] == 0.0)


class TestPadTargets:
    def test_pads_to_fixed_shape(self):
        targets = [
            {"labels": np.asarray([1, 2]), "boxes": np.random.rand(2, 4)},
            {"labels": np.asarray([3]), "boxes": np.random.rand(1, 4)},
        ]
        out = pad_targets(targets, max_boxes=4)
        assert out["labels"].shape == (2, 4)
        assert out["boxes"].shape == (2, 4, 4)
        np.testing.assert_array_equal(out["valid"],
                                      [[1, 1, 0, 0], [1, 0, 0, 0]])

    def test_truncates_overflow(self):
        targets = [{"labels": np.arange(10), "boxes": np.random.rand(10, 4)}]
        out = pad_targets(targets, max_boxes=4)
        assert out["valid"].sum() == 4


class TestLMDB:
    """Drive the LMDB image-storage branch (datasets.py lazy txn,
    reference datasets/detection/base.py:33-61) through __getitem__.

    The real ``lmdb`` package is absent from this image, so the test
    injects a stub module exposing the exact interface the dataset uses
    (``lmdb.open(path, readonly, lock, readahead)`` -> env with
    ``begin(write=False)`` context manager -> ``txn.get(key) -> bytes``),
    keyed by str(image_id) like the reference LMDB layout.
    """

    def _install_fake_lmdb(self, monkeypatch, store, opened):
        import contextlib
        import sys
        import types

        class _Txn:
            def get(self, key):
                return store.get(key)

        class _Env:
            @contextlib.contextmanager
            def begin(self, write=False):
                assert write is False
                yield _Txn()

        fake = types.ModuleType("lmdb")

        def _open(path, readonly=True, lock=False, readahead=False):
            assert readonly and not lock
            opened.append(path)
            return _Env()

        fake.open = _open
        monkeypatch.setitem(sys.modules, "lmdb", fake)

    def _encoded(self, color):
        from io import BytesIO

        buf = BytesIO()
        Image.new("RGB", (100, 80), color).save(buf, format="JPEG")
        return buf.getvalue()

    def test_lmdb_getitem_lazy_open(self, det_root, monkeypatch):
        root, ann_file = det_root
        store = {str(i).encode(): self._encoded((i * 50, 100, 150))
                 for i in range(3)}
        opened = []
        self._install_fake_lmdb(monkeypatch, store, opened)

        ds = DetectionDataset(ann_file, lmdb_path="/fake/lmdb")
        assert opened == []  # lazy: nothing opened at construction
        img, target = ds[1]
        assert opened == ["/fake/lmdb"]  # opened exactly once, on first read
        assert img.size == (100, 80) and img.mode == "RGB"
        assert target["boxes"].shape == (2, 4)
        _ = ds[2]
        assert opened == ["/fake/lmdb"]  # env cached across items

    def test_lmdb_corrupt_sample_resamples(self, det_root, monkeypatch):
        """A corrupt LMDB value must trigger the resample-on-exception path
        (base.py:49-61) and still return a valid item."""
        import random as pyrandom

        root, ann_file = det_root
        store = {str(i).encode(): self._encoded((0, 100, 150))
                 for i in range(3)}
        store[b"1"] = b"not a jpeg"  # corrupt one entry
        self._install_fake_lmdb(monkeypatch, store, [])

        ds = DetectionDataset(ann_file, lmdb_path="/fake/lmdb")
        pyrandom.seed(0)  # make the resample index deterministic
        img, target = ds[1]  # corrupt -> resampled to some healthy id
        assert img.size == (100, 80)
        assert int(target["image_id"]) in (0, 2)

    def test_lmdb_all_corrupt_raises(self, det_root, monkeypatch):
        root, ann_file = det_root
        store = {str(i).encode(): b"garbage" for i in range(3)}
        self._install_fake_lmdb(monkeypatch, store, [])
        ds = DetectionDataset(ann_file, lmdb_path="/fake/lmdb")
        with pytest.raises(RuntimeError, match="corrupt"):
            _ = ds[0]
