"""Released-checkpoint fidelity harness (north star: BASELINE.md CIDEr 139.2).

Runs a GRIT caption checkpoint through BOTH stacks — the PyTorch reference
(imported from /root/reference, CPU, with a grid_sample-based stand-in for
its CUDA MSDeformAttn ext) and grit_tpu (converted weights, fp32) — on the
SAME preprocessed image tensor, and reports:

  * the decoded caption, token-for-token, greedy (beam=1) and beam=5;
  * max-abs activation deltas at module boundaries:
      detector.gri_feat / detector.reg_feat  (Swin + deformable decoder)
      grid_net output                        (3-layer self-attention encoder)
      teacher-forced log-probs on the decoded sequence (full stack)

Usage:
  python tools/checkpoint_parity.py --download            # fetch GRIT-4DS zoo ckpt
  python tools/checkpoint_parity.py --ckpt grit_4ds.pth [--image img.jpg]
  python tools/checkpoint_parity.py --random              # random full-size weights
                                                          # (no network needed)

``--random`` initializes the reference model with its own init scheme and
converts THOSE weights — a full-size end-to-end conversion-parity check
(the tests in tests/test_convert_parity.py cover the same property at tiny
sizes / per-module).  With a real ``.pth`` the identical code path proves
released-checkpoint fidelity.

Zoo gdrive ids (reference README.md:17-22):
  detector (A, VG):   1ZWPovkK5YhxtyCaVULCTNoPu8Jd-MKGh
  detector (B, 4DS):  1xERJN3CvQcUcwgRZd31CUsnep_xnELcs
  GRIT (A, VG):       12tsI3Meka2mNLON-tWTnVJnUzUOa-foW
  GRIT (B, 4DS):      1jgEqNFuKcKg_RcG4Nq8bhWvCgzi6bjuD
"""

from __future__ import annotations

import argparse
import os
import sys
import types
from types import SimpleNamespace as NS

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
ZOO = {
    "detector_vg": "1ZWPovkK5YhxtyCaVULCTNoPu8Jd-MKGh",
    "detector_4ds": "1xERJN3CvQcUcwgRZd31CUsnep_xnELcs",
    "grit_vg": "12tsI3Meka2mNLON-tWTnVJnUzUOa-foW",
    "grit_4ds": "1jgEqNFuKcKg_RcG4Nq8bhWvCgzi6bjuD",
}
sys.path.insert(0, REPO)


# --------------------------------------------------------------------------
# stubs so the reference imports on CPU without timm / the CUDA extension
# --------------------------------------------------------------------------
def _install_stubs():
    import torch
    import torch.nn.functional as F

    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")

        class DropPath(torch.nn.Module):
            def __init__(self, p=0.0):
                super().__init__()

            def forward(self, x):
                return x

        layers.DropPath = DropPath
        layers.to_2tuple = lambda x: x if isinstance(x, tuple) else (x, x)

        def trunc_normal_(tensor, std=1.0, **kw):
            with torch.no_grad():
                tensor.normal_(0, std).clamp_(-2 * std, 2 * std)
            return tensor

        layers.trunc_normal_ = trunc_normal_
        models.layers = layers
        timm.models = models
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models
        sys.modules["timm.models.layers"] = layers

    if "torchvision" not in sys.modules:
        # utils/misc.py only version-checks torchvision (lines 43-71)
        tv = types.ModuleType("torchvision")
        tv.__version__ = "0.15"
        sys.modules["torchvision"] = tv

    if "MultiScaleDeformableAttention" not in sys.modules:
        # forward-only stand-in with the documented semantics of the CUDA op
        # (reference functions/ms_deform_attn_func.py:41-61): per level,
        # grid_sample the value map at sampling_locations (zeros padding,
        # align_corners=False), weight by attention_weights, sum over L*P.
        msda = types.ModuleType("MultiScaleDeformableAttention")

        def ms_deform_attn_forward(value, shapes, lsi, loc, w, step):
            n, s, m, d = value.shape
            _, lq, _, l, p, _ = loc.shape
            splits = [int(h_ * w_) for h_, w_ in shapes.tolist()]
            vals = value.split(splits, dim=1)
            grids = 2 * loc - 1
            out = value.new_zeros(n, lq, m, d)
            for li, (h_, w_) in enumerate(shapes.tolist()):
                v = vals[li].transpose(1, 2).reshape(n * m, int(h_), int(w_), d)
                v = v.permute(0, 3, 1, 2)  # [N*M, D, H, W]
                g = grids[:, :, :, li].transpose(1, 2).reshape(n * m, lq, p, 2)
                s_ = F.grid_sample(
                    v, g, mode="bilinear", padding_mode="zeros",
                    align_corners=False,
                )  # [N*M, D, Lq, P]
                w_l = w[:, :, :, li].transpose(1, 2).reshape(n * m, 1, lq, p)
                out += (s_ * w_l).sum(-1).permute(0, 2, 1).reshape(n, m, lq, d).transpose(1, 2)
            return out.reshape(n, lq, m * d)

        msda.ms_deform_attn_forward = ms_deform_attn_forward

        def ms_deform_attn_backward(*a, **k):
            raise NotImplementedError("parity harness is inference-only")

        msda.ms_deform_attn_backward = ms_deform_attn_backward
        sys.modules["MultiScaleDeformableAttention"] = msda


def ref_config():
    """The reference coco_config.yaml model tree as attribute namespaces."""
    return NS(
        model=NS(
            use_gri_feat=True, use_reg_feat=True, grid_feat_dim=1024,
            frozen_stages=2, beam_size=5, beam_len=20, dropout=0.0,
            attn_dropout=0.0, vocab_size=10201, max_len=54, pad_idx=1,
            bos_idx=2, eos_idx=3, d_model=512, n_heads=8,
            grid_net=NS(n_memories=1, n_layers=3),
            cap_generator=NS(decoder_name="parallel", n_layers=3),
            detector=NS(
                checkpoint="", d_model=512, dim_feedforward=1024, num_heads=8,
                num_layers=6, num_levels=4, num_points=4, num_queries=150,
                num_classes=1849, dropout=0.0, activation="relu",
                return_intermediate=True, with_box_refine=True,
            ),
        ),
    )


def build_ref_model():
    _install_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import torch

    from models.caption.detector import build_detector as ref_build_detector
    from models.caption.transformer import Transformer as RefTransformer

    cfg = ref_config()
    torch.manual_seed(42)
    detector = ref_build_detector(cfg)
    model = RefTransformer(detector=detector, config=cfg)
    model.eval()
    return model


def load_image(path: str | None, size=(384, 640)) -> np.ndarray:
    """Preprocessed image [H, W, 3] float32 (maxwh resize + imagenet norm).

    Both stacks consume the SAME array, so any activation delta is
    model-side, never preprocessing-side.  Falls back to a deterministic
    synthetic image when no file is given/found.
    """
    from grit_tpu.data.transforms import get_transform

    cfg = NS(size=list(size), resize_name="maxwh", randaug=False)
    if path and os.path.exists(path):
        from PIL import Image

        with Image.open(path) as im:
            return np.asarray(get_transform(cfg)["valid"](im), np.float32)
    print(f"[image] {path!r} not found — using a seeded synthetic image")
    rng = np.random.RandomState(0)
    h, w = size
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack(
        [np.sin(yy / 23) * np.cos(xx / 31),
         np.cos(yy / 13) * np.sin(xx / 41),
         rng.rand(h, w).astype(np.float32)], -1)
    return ((img + 1) / 2 - 0.45).astype(np.float32) / 0.225


def fetch_checkpoint(name: str, dst_dir: str) -> str:
    from grit_tpu.utils.download import download_gdrive

    dst = os.path.join(dst_dir, f"{name}.pth")
    if os.path.exists(dst):
        return dst
    file_id = ZOO[name]
    url = f"https://docs.google.com/uc?export=download&id={file_id}"
    print(f"[download] {name}: {url}")
    try:
        return download_gdrive(file_id, dst)
    except Exception as e:
        print(
            f"[download] FAILED for {name} ({url}): {type(e).__name__}: {e}\n"
            "  Record this in docs/PARITY.md; rerun with --ckpt once the file "
            "is obtainable (zero-egress environments cannot fetch it).",
            file=sys.stderr,
        )
        raise SystemExit(2)


def main(argv=None):
    ap = argparse.ArgumentParser()
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--ckpt", help="local GRIT caption .pth checkpoint")
    g.add_argument("--download", action="store_true",
                   help="fetch the GRIT-4DS checkpoint from the gdrive zoo")
    g.add_argument("--random", action="store_true",
                   help="use the reference's random init (conversion check only)")
    ap.add_argument("--image", default="notebooks/COCO_val2014_000000000772.jpg")
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--max-len", type=int, default=20)
    ap.add_argument("--size", type=int, nargs=2, default=[384, 640],
                    help="input H W (maxwh bucket)")
    ap.add_argument("--f64", action="store_true",
                    help="run BOTH stacks in float64 — separates fp32 "
                         "accumulation noise from semantic divergence")
    args = ap.parse_args(argv)

    if args.f64:
        import jax

        jax.config.update("jax_enable_x64", True)

    import torch

    ref_model = build_ref_model()
    if args.download:
        args.ckpt = fetch_checkpoint("grit_4ds", os.path.join(REPO, "data"))
    if args.ckpt:
        sd = torch.load(args.ckpt, map_location="cpu")
        sd = sd.get("state_dict", sd)
        missing, unexpected = ref_model.load_state_dict(sd, strict=False)
        print(f"[ref] load: missing={len(missing)} unexpected={len(unexpected)}")

    if args.f64:
        ref_model = ref_model.double()

    img = load_image(args.image, size=tuple(args.size))
    if args.f64:
        img = img.astype(np.float64)
    h, w = img.shape[:2]

    # ---- torch reference: activations + captions --------------------------
    from engine.utils import NestedTensor

    t_img = torch.from_numpy(img).permute(2, 0, 1)[None]
    t_mask = torch.zeros(1, h, w, dtype=torch.bool)
    samples = NestedTensor(t_img, t_mask)

    acts: dict[str, np.ndarray] = {}
    ref_model.detector.register_forward_hook(
        lambda m, i, o: acts.update(
            ref_gri=o["gri_feat"].detach().numpy(),
            ref_reg=o["reg_feat"].detach().numpy(),
        )
    )
    ref_model.grid_net.register_forward_hook(
        lambda m, i, o: acts.update(ref_gnet=o[0][:, -1].detach().numpy())
    )

    def ref_decode(beam):
        with torch.no_grad():
            out, _ = ref_model(
                samples, seq=None, use_beam_search=True, max_len=args.max_len,
                eos_idx=3, beam_size=beam, out_size=1, return_probs=False,
            )
        return np.asarray(out)[:, 0] if out.ndim == 3 else np.asarray(out)

    print("[ref] beam decode...")
    ref_beam = ref_decode(args.beam)
    print("[ref] greedy decode...")
    ref_greedy = ref_decode(1)

    # ---- grit_tpu: convert + decode ---------------------------------------
    import jax
    import jax.numpy as jnp

    from grit_tpu.config import default_caption_config
    from grit_tpu.convert import state_dict_to_params
    from grit_tpu.engine import checkpoint as ckpt_lib
    from grit_tpu.engine.evaluator import make_caption_generator
    from grit_tpu.models.captioner import build_captioner
    from grit_tpu.utils.nested import ImageBatch

    config = default_caption_config()
    config.model.dropout = 0.0
    model = build_captioner(config, dtype=None)  # fp32 for activation parity

    sd_np = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    converted = state_dict_to_params(sd_np)

    batch = ImageBatch(jnp.asarray(img)[None], jnp.zeros((1, h, w), bool))
    seq0 = jnp.full((1, 8), 2, jnp.int32)
    init = model.init(jax.random.PRNGKey(0), batch, seq0)
    merged, miss, unexp = ckpt_lib.load_params_flexible(init["params"], converted)
    print(f"[ours] convert: missing={miss} unexpected={unexp}")
    params = {"params": merged}

    vis_raw = model.detector.apply(
        {"params": merged["detector"]}, batch, deterministic=True
    )
    vis = model.apply(params, batch, method="compute_vis", deterministic=True)

    def report(name, ours, ref):
        ours, ref = np.asarray(ours, np.float32), np.asarray(ref, np.float32)
        d = float(np.max(np.abs(ours - ref)))
        rel = d / (float(np.max(np.abs(ref))) + 1e-9)
        print(f"  {name:<28} max|Δ|={d:.3e}  rel={rel:.3e}")
        return d

    print("[activation deltas]")
    report("detector.gri_feat", vis_raw["gri_feat"], acts["ref_gri"])
    report("detector.reg_feat", vis_raw["reg_feat"], acts["ref_reg"])
    report("grid_net.out", vis["gri_feat"], acts["ref_gnet"])

    from grit_tpu.data.field import TextField

    vocab_path = config.dataset.vocab_path
    if not os.path.exists(vocab_path):
        vocab_path = os.path.join(REF, "data", "vocab.json")  # shipped 10201-token vocab
    text_field = TextField(vocab_path=vocab_path)

    def ours_decode(beam):
        gen = make_caption_generator(
            model, beam_size=beam, max_len=args.max_len, bos_idx=2, eos_idx=3,
        )
        return np.asarray(gen(params, batch, 1))

    print("[ours] beam decode...")
    ours_beam = ours_decode(args.beam)
    print("[ours] greedy decode...")
    ours_greedy = ours_decode(1)

    # teacher-forced log-prob delta on the reference beam sequence
    seq = jnp.asarray(ref_beam, jnp.int32)
    inputs = jnp.concatenate([jnp.full((1, 1), 2, jnp.int32), seq[:, :-1]], 1)
    ours_logp = model.apply(params, batch, inputs, deterministic=True)
    with torch.no_grad():
        ref_logp = ref_model(samples, torch.from_numpy(np.asarray(inputs)))
    report("teacher-forced log-probs", ours_logp, ref_logp.numpy())

    ok = True
    for tag, ours, ref in [("greedy", ours_greedy, ref_greedy),
                           ("beam", ours_beam, ref_beam)]:
        ours_txt = text_field.decode(ours)[0]
        ref_txt = text_field.decode(np.asarray(ref))[0]
        match = ours_txt == ref_txt
        ok &= match
        print(f"[{tag}] match={match}")
        print(f"  ref : {ref_txt}\n  ours: {ours_txt}")
        if not match:
            print(f"  ref ids : {np.asarray(ref).tolist()}")
            print(f"  ours ids: {np.asarray(ours).tolist()}")

    print("PARITY OK" if ok else "PARITY MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
