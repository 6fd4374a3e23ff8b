"""Data-layer tests: vocab/field numericalization (against the shipped
vocab.json), caption padding, transforms, synthetic-COCO pipeline roundtrip."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from grit_tpu.data.coco import (
    CocoLoader,
    DictionaryDataset,
    PairedDataset,
    load_karpathy_examples,
    pad_captions,
)
from grit_tpu.data.field import TextField
from grit_tpu.data.transforms import get_transform, maxwh_resize, minmax_resize
from grit_tpu.data.vocab import Vocab
from grit_tpu.config import Config

REF_VOCAB = "/root/reference/data/vocab.json"


class TestVocab:
    @pytest.mark.skipif(not os.path.exists(REF_VOCAB), reason="no reference vocab")
    def test_loads_shipped_vocab(self):
        v = Vocab(vocab_path=REF_VOCAB)
        assert len(v) == 10201
        assert v.itos[:4] == ["<unk>", "<pad>", "<bos>", "<eos>"]
        assert v.stoi("<pad>") == 1
        assert v.stoi("definitely-not-a-word-xyz") == 0  # OOV -> <unk>

    def test_build_order_freq_then_alpha(self):
        from collections import Counter

        counter = Counter({"b": 3, "a": 3, "c": 5, "z": 1})
        v = Vocab(counter=counter)
        assert v.itos[4:] == ["c", "a", "b", "z"]  # freq desc, ties alphabetical


class TestTextField:
    @pytest.mark.skipif(not os.path.exists(REF_VOCAB), reason="no reference vocab")
    def test_numericalize_and_decode_roundtrip(self):
        tf = TextField(vocab_path=REF_VOCAB)
        ids = tf.process([tf.preprocess("A man riding a horse.")])
        toks = tf.decode(ids)
        assert toks[0].startswith("<bos> a man riding a horse") or \
            toks[0] == "<bos> a man riding a horse"

    def test_pad_layout(self):
        ids = pad_captions([[5, 6], [7]], max_len=4, pad_idx=1, bos_idx=2, eos_idx=3)
        np.testing.assert_array_equal(
            ids, [[2, 5, 6, 3, 1, 1], [2, 7, 3, 1, 1, 1]]
        )

    def test_truncation(self):
        ids = pad_captions([[5] * 10], max_len=4)
        assert ids.shape == (1, 6)
        np.testing.assert_array_equal(ids[0], [2, 5, 5, 5, 5, 3])


class TestResizes:
    def test_maxwh_fits_and_keeps_ar(self):
        img = Image.new("RGB", (1000, 500))
        out = maxwh_resize(img, (384, 640))
        assert out.size == (640, 320)  # scale = 0.64

    def test_minmax(self):
        img = Image.new("RGB", (800, 600))
        out = minmax_resize(img, (384, 640))
        w, h = out.size
        assert h % 32 == 0 and w % 32 == 0
        assert max(w, h) <= 640

    def test_transform_outputs_normalized_hwc(self):
        cfg = Config({"size": [64, 96], "resize_name": "maxwh", "randaug": True})
        t = get_transform(cfg)
        arr = t["train"](Image.new("RGB", (96, 64), (128, 128, 128)))
        assert arr.ndim == 3 and arr.shape[2] == 3
        arr_v = t["valid"](Image.new("RGB", (96, 64), (124, 116, 104)))
        np.testing.assert_allclose(arr_v.mean(axis=(0, 1)), 0.0, atol=0.05)


@pytest.fixture(scope="module")
def synthetic_coco(tmp_path_factory):
    """Minimal Karpathy-format dataset: 4 images x 2 captions."""
    root = tmp_path_factory.mktemp("coco")
    (root / "annotations").mkdir()
    (root / "train2014").mkdir()
    (root / "val2014").mkdir()

    def make_split(name, img_dir, img_ids, ann_start):
        images, anns = [], []
        for i, img_id in enumerate(img_ids):
            fname = f"{name}_{img_id:012d}.jpg"
            Image.new("RGB", (80 + 10 * i, 60), (i * 40, 100, 150)).save(
                root / img_dir / fname
            )
            images.append({"id": img_id, "file_name": fname,
                           "height": 60, "width": 80 + 10 * i})
            for j in range(2):
                anns.append({"id": ann_start + img_id * 10 + j, "image_id": img_id,
                             "caption": f"a thing number {img_id} doing stuff {j}"})
        return {"images": images, "annotations": anns}

    train = make_split("COCO_train2014", "train2014", [1, 2], 0)
    val = make_split("COCO_val2014", "val2014", [11, 12, 13, 14], 100000)
    json.dump(train, open(root / "annotations" / "captions_train2014.json", "w"))
    json.dump(val, open(root / "annotations" / "captions_val2014.json", "w"))

    np.save(root / "annotations" / "coco_train_ids.npy",
            np.asarray([a["id"] for a in train["annotations"]]))
    # valid = img 11, test = img 12, restval = imgs 13, 14
    np.save(root / "annotations" / "coco_dev_ids.npy",
            np.asarray([a["id"] for a in val["annotations"] if a["image_id"] == 11]))
    np.save(root / "annotations" / "coco_test_ids.npy",
            np.asarray([a["id"] for a in val["annotations"] if a["image_id"] == 12]))
    np.save(root / "annotations" / "coco_restval_ids.npy",
            np.asarray([a["id"] for a in val["annotations"]
                        if a["image_id"] in (13, 14)]))
    return root


class TestCocoPipeline:
    def _field(self):
        from collections import Counter

        words = "a thing number doing stuff 1 2 11 12 13 14 0".split()
        return TextField(vocab=Vocab(counter=Counter({w: 5 for w in words})))

    def test_karpathy_split_sizes(self, synthetic_coco):
        tf = self._field()
        ex = load_karpathy_examples(
            str(synthetic_coco / "annotations"), str(synthetic_coco), tf
        )
        assert len(ex["train"]) == 2 * 2 + 2 * 2  # train imgs + restval imgs
        assert len(ex["valid"]) == 2
        assert len(ex["test"]) == 2
        assert all(os.path.exists(e.image) for e in ex["train"])

    def test_loader_batches(self, synthetic_coco):
        tf = self._field()
        ex = load_karpathy_examples(
            str(synthetic_coco / "annotations"), str(synthetic_coco), tf
        )
        cfg = Config({"size": [64, 96], "resize_name": "maxwh", "randaug": False})
        transform = get_transform(cfg)["valid"]
        loader = CocoLoader(
            PairedDataset(ex["train"]), batch_size=4, transform=transform,
            mode="paired", max_len=10, bucket_hw=(64, 96), shuffle=True,
            drop_last=True,
        )
        batches = list(loader)
        assert len(batches) == 2
        b = batches[0]
        assert b["samples"].images.shape == (4, 64, 96, 3)
        assert b["captions"].shape == (4, 12)
        assert (b["captions"][:, 0] == 2).all()

    def test_dict_loader(self, synthetic_coco):
        tf = self._field()
        ex = load_karpathy_examples(
            str(synthetic_coco / "annotations"), str(synthetic_coco), tf
        )
        cfg = Config({"size": [64, 96], "resize_name": "maxwh", "randaug": False})
        loader = CocoLoader(
            DictionaryDataset(ex["valid"]), batch_size=1,
            transform=get_transform(cfg)["valid"], mode="dict",
            bucket_hw=(64, 96),
        )
        b = next(iter(loader))
        assert len(b["captions"][0]) == 2  # both refs of image 11

    def test_sharded_loader(self, synthetic_coco):
        tf = self._field()
        ex = load_karpathy_examples(
            str(synthetic_coco / "annotations"), str(synthetic_coco), tf
        )
        cfg = Config({"size": [64, 96], "resize_name": "maxwh", "randaug": False})
        transform = get_transform(cfg)["valid"]
        seen = []
        for rank in range(2):
            loader = CocoLoader(
                PairedDataset(ex["train"]), batch_size=2, transform=transform,
                mode="paired", bucket_hw=(64, 96), rank=rank, world=2,
            )
            for b in loader:
                seen += list(b["image_id"])
        assert len(seen) == len(ex["train"])  # disjoint cover


class TestDeviceNorm:
    """uint8 wire format: transform emits raw RGB, the captioner's
    device_normalize reproduces the host-normalized float path exactly
    (incl. pad-zero semantics and the f32 passthrough)."""

    def _img(self):
        from PIL import Image

        rng = np.random.RandomState(0)
        return Image.fromarray(rng.randint(0, 256, (50, 70, 3), np.uint8))

    def test_uint8_wire_matches_host_normalized(self):
        from grit_tpu.utils.nested import batch_images, device_normalize

        img = self._img()
        cfg8 = Config({"size": [64, 96], "resize_name": "maxwh",
                       "randaug": False, "device_norm": True})
        cfg32 = Config({"size": [64, 96], "resize_name": "maxwh",
                        "randaug": False, "device_norm": False})
        t8 = get_transform(cfg8)["valid"](img)
        assert t8.dtype == np.uint8
        b8 = device_normalize(batch_images([t8], bucket_hw=(64, 96)))
        t32 = get_transform(cfg32)["valid"](img)
        assert t32.dtype == np.float32
        b32 = batch_images([t32], bucket_hw=(64, 96))
        np.testing.assert_allclose(
            np.asarray(b8.images), np.asarray(b32.images), atol=1e-6)
        # pad region carries exact 0.0 (the reference normalizes BEFORE
        # zero-padding), and masks agree
        np.testing.assert_array_equal(np.asarray(b8.mask), np.asarray(b32.mask))
        assert np.all(np.asarray(b8.images)[np.asarray(b8.mask)] == 0.0)

    def test_float_passthrough(self):
        from grit_tpu.utils.nested import batch_images, device_normalize

        cfg32 = Config({"size": [64, 96], "resize_name": "maxwh",
                        "randaug": False})
        t32 = get_transform(cfg32)["valid"](self._img())
        b32 = batch_images([t32], bucket_hw=(64, 96))
        out = device_normalize(b32)
        np.testing.assert_array_equal(np.asarray(out.images), np.asarray(b32.images))

    def test_namespace_cfg_defaults_to_host_norm(self):
        # plain namespaces (parity tools) lack .get — must keep float output
        from types import SimpleNamespace

        cfg = SimpleNamespace(size=[64, 96], resize_name="maxwh", randaug=False)
        t = get_transform(cfg)["valid"](self._img())
        assert t.dtype == np.float32

    def test_ragged_pad_uint8_zero_fill(self):
        from grit_tpu.parallel.mesh import pad_to_multiple

        tree = {
            "img": np.full((3, 4, 4, 3), 7, np.uint8),
            "caps": np.full((3, 5), 4, np.int32),
        }
        out = pad_to_multiple(tree, 4, int_fill=1, int_first=2)
        assert out["img"].shape[0] == 4 and np.all(out["img"][3] == 0)
        assert np.all(out["caps"][3, 0] == 2) and np.all(out["caps"][3, 1:] == 1)
