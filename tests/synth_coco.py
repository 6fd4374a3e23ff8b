"""Shared synthetic Karpathy-format COCO generator for tests and drives.

One source of truth for the tiny fixture dataset: captions_{train,val}2014
json, Karpathy id .npy splits, vocab.json (19 tokens incl. specials),
images, and the online-eval image-info split.  Used by the CLI smoke tests
(tests/test_cli.py) and the 2-process e2e (tests/test_multiprocess.py) —
the latter used to SKIP when a pre-built /tmp/vdata was absent (the round-3
suite's one conditional skip); now every consumer builds its own copy.
"""

import json
import os
from collections import Counter

import numpy as np
from PIL import Image

from grit_tpu.data.vocab import Vocab

WORDS = "a thing number doing stuff red blue cat dog 1 2 11 12 13 14".split()


def make_synth_coco(root) -> int:
    """Populate ``root`` with the synthetic dataset; returns vocab size."""
    root = str(root)
    for d in ("annotations", "train2014", "val2014", "test2014"):
        os.makedirs(os.path.join(root, d), exist_ok=True)

    rng = np.random.RandomState(0)

    def make_split(name, img_dir, img_ids, ann_start):
        images, anns = [], []
        for i, img_id in enumerate(img_ids):
            fname = f"{name}_{img_id:012d}.jpg"
            Image.fromarray(
                rng.randint(0, 255, (60, 80 + 10 * i, 3), np.uint8)
            ).save(os.path.join(root, img_dir, fname))
            images.append({"id": img_id, "file_name": fname,
                           "height": 60, "width": 80 + 10 * i})
            for j in range(2):
                anns.append({
                    "id": ann_start + img_id * 10 + j, "image_id": img_id,
                    "caption": f"a {WORDS[5 + i % 4]} thing number {img_id} "
                               f"doing stuff {j}",
                })
        return {"images": images, "annotations": anns}

    ann = os.path.join(root, "annotations")
    train = make_split("COCO_train2014", "train2014", [1, 2], 0)
    val = make_split("COCO_val2014", "val2014", [11, 12, 13, 14], 100000)
    json.dump(train, open(os.path.join(ann, "captions_train2014.json"), "w"))
    json.dump(val, open(os.path.join(ann, "captions_val2014.json"), "w"))
    np.save(os.path.join(ann, "coco_train_ids.npy"),
            np.asarray([a["id"] for a in train["annotations"]]))
    np.save(os.path.join(ann, "coco_dev_ids.npy"),
            np.asarray([a["id"] for a in val["annotations"]
                        if a["image_id"] == 11]))
    np.save(os.path.join(ann, "coco_test_ids.npy"),
            np.asarray([a["id"] for a in val["annotations"]
                        if a["image_id"] == 12]))
    np.save(os.path.join(ann, "coco_restval_ids.npy"),
            np.asarray([a["id"] for a in val["annotations"]
                        if a["image_id"] in (13, 14)]))

    vocab = Vocab(counter=Counter({w: 5 for w in WORDS}))
    vocab.save(os.path.join(ann, "vocab.json"))

    # online-eval test2014 split (image-info format, no captions)
    test_imgs = []
    for i, img_id in enumerate([501, 502, 503]):
        fname = f"COCO_test2014_{img_id:012d}.jpg"
        Image.fromarray(rng.randint(0, 255, (60, 90, 3), np.uint8)).save(
            os.path.join(root, "test2014", fname))
        test_imgs.append({"id": img_id, "file_name": fname,
                          "height": 60, "width": 90})
    json.dump({"images": test_imgs},
              open(os.path.join(ann, "image_info_test2014.json"), "w"))
    return len(vocab.itos)
