"""Measured end-to-end recipe wall-clock (VERDICT r4 item 5).

Drives the REAL training CLI (train_caption.py: production loader with
threaded prefetch + host RandAugment, phase machine, rank-dual eval,
checkpointing) for one XE epoch + one SCST epoch on a synthetic COCO at
realistic image sizes and full model size, on the chip — then reports
measured phase walls next to the per-step projection so the README's
epoch arithmetic is anchored to a measured run instead of
jitted-step extrapolation (reference bar: README.md:75 "~16 h on
8 A100s" is a real run).

Also measures the host input pipeline alone (loader sustained img/s with
the device out of the loop) — the round-3 "host < 20% of step"
acceptance.

Usage:
  python tools/bench_epoch.py [--root /tmp/epoch_data] [--images 1600]
      [--wh 640 480] [--skip-train] [overrides...]

The dataset: --images unique train images (5 captions each), 64 val + 64
test dict images.  ~1600 images -> 8000 XE pairs = 500 b16 steps and 1600
SCST images = 400 b4 steps; scale --images up for longer steady states.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


WORDS = ("a the red blue green small large cat dog person car tree road sky "
         "water grass table chair light dark near far on under over with and "
         "running sitting standing looking holding").split()


def make_big_synth(root: str, n_images: int, wh: tuple[int, int]) -> int:
    """COCO-Karpathy-format synthetic dataset at realistic sizes.

    Images are smooth gradients + a few rectangles (compress well; jpeg
    decode cost is realistic), 5 captions each from a small vocab.
    """
    from PIL import Image

    from grit_tpu.data.vocab import Vocab
    from collections import Counter

    w, h = wh
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    os.makedirs(os.path.join(root, "train2014"), exist_ok=True)
    os.makedirs(os.path.join(root, "val2014"), exist_ok=True)

    rng = np.random.RandomState(0)

    def write_img(path, seed):
        r = np.random.RandomState(seed)
        yy, xx = np.mgrid[0:h, 0:w]
        base = (
            (xx * (r.rand() * 255 / w))[..., None] * np.asarray([1, 0.5, 0.25])
            + (yy * (r.rand() * 255 / h))[..., None] * np.asarray([0.25, 1, 0.5])
        )
        img = base.astype(np.float32)
        for _ in range(6):
            x0, y0 = r.randint(0, w - 40), r.randint(0, h - 40)
            dw, dh = r.randint(20, w // 3), r.randint(20, h // 3)
            img[y0:y0 + dh, x0:x0 + dw] = r.randint(0, 255, 3)
        Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(path, quality=85)

    def caption(r):
        n = r.randint(6, 12)
        return " ".join(WORDS[r.randint(0, len(WORDS))] for _ in range(n))

    def split(name, img_dir, ids, ann_start, n_caps=5):
        images, anns = [], []
        for i, img_id in enumerate(ids):
            fname = f"{name}_{img_id:012d}.jpg"
            write_img(os.path.join(root, img_dir, fname), img_id)
            images.append({"id": img_id, "file_name": fname,
                           "height": h, "width": w})
            r = np.random.RandomState(10_000 + img_id)
            for j in range(n_caps):
                anns.append({"id": ann_start + img_id * 10 + j,
                             "image_id": img_id, "caption": caption(r)})
        return {"images": images, "annotations": anns}

    t0 = time.time()
    train_ids = list(range(1, n_images + 1))
    val_ids = list(range(700_000, 700_000 + 128))
    train = split("COCO_train2014", "train2014", train_ids, 0)
    val = split("COCO_val2014", "val2014", val_ids, 50_000_000)
    ann = os.path.join(root, "annotations")
    json.dump(train, open(os.path.join(ann, "captions_train2014.json"), "w"))
    json.dump(val, open(os.path.join(ann, "captions_val2014.json"), "w"))
    np.save(os.path.join(ann, "coco_train_ids.npy"),
            np.asarray([a["id"] for a in train["annotations"]]))
    dev_ids = [a["id"] for a in val["annotations"]
               if a["image_id"] < 700_064]
    test_ids = [a["id"] for a in val["annotations"]
                if a["image_id"] >= 700_064]
    np.save(os.path.join(ann, "coco_dev_ids.npy"), np.asarray(dev_ids))
    np.save(os.path.join(ann, "coco_test_ids.npy"), np.asarray(test_ids))
    np.save(os.path.join(ann, "coco_restval_ids.npy"), np.asarray([], np.int64))

    vocab = Vocab(counter=Counter({wd: 5 for wd in WORDS}))
    vocab.save(os.path.join(ann, "vocab.json"))
    print(f"dataset: {n_images} train imgs ({w}x{h}), "
          f"{len(train['annotations'])} captions, built in {time.time()-t0:.0f}s")
    return len(vocab.itos)


def measure_loader(root: str, vocab_size: int, batch: int, overrides):
    """Host pipeline alone: sustained images/sec through the production
    train loader (transforms + collate + prefetch), device untouched."""
    os.environ["DATA_ROOT"] = root
    from grit_tpu.config import default_caption_config
    from grit_tpu.data.coco import build_coco_dataloaders

    config = default_caption_config().apply_overrides(
        [f"model.vocab_size={vocab_size}", f"optimizer.batch_size={batch}"]
        + list(overrides))
    loaders, _ = build_coco_dataloaders(config, mode="finetune", rank=0, world=1)
    def batches():
        while True:
            for b in loaders["train"]:
                yield b
    it = batches()
    # warm 3 batches, then time up to 30
    for _ in range(3):
        next(it)
    t0 = time.time()
    n = 0
    k = 30
    for _ in range(k):
        b = next(it)
        n += len(b["captions"])
    dt = time.time() - t0
    print(f"loader-only sustained: {n/dt:.1f} img/s host capacity "
          f"({dt/k*1000:.0f} ms/batch at b{batch})")
    return n / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/epoch_data")
    ap.add_argument("--images", type=int, default=1600)
    ap.add_argument("--wh", type=int, nargs=2, default=(640, 480))
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--loader-only", action="store_true")
    ap.add_argument("--skip-data", action="store_true")
    args, overrides = ap.parse_known_args()

    if not args.skip_data:
        v = make_big_synth(args.root, args.images, tuple(args.wh))
    else:
        from grit_tpu.data.vocab import Vocab
        v = len(Vocab(vocab_path=os.path.join(
            args.root, "annotations", "vocab.json")).itos)

    host_ips = measure_loader(args.root, v, args.batch, overrides)
    if args.loader_only:
        return

    env = dict(os.environ, DATA_ROOT=args.root)
    cmd = [
        sys.executable, "train_caption.py", "exp.name=epoch_bench",
        f"model.vocab_size={v}", f"optimizer.batch_size={args.batch}",
        "optimizer.freezing_xe_epochs=0", "optimizer.freezing_sc_epochs=0",
        "optimizer.finetune_xe_epochs=1", "optimizer.finetune_sc_epochs=1",
    ] + list(overrides)
    print("driving:", " ".join(cmd[1:]), flush=True)
    t0 = time.time()
    rc = subprocess.call(cmd, env=env,
                         cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
    wall = time.time() - t0
    print(f"TOTAL recipe wall (1 XE + 1 SCST epoch + dual eval + ckpts): "
          f"{wall/60:.1f} min (rc={rc}); host loader capacity {host_ips:.1f} img/s")


if __name__ == "__main__":
    main()
