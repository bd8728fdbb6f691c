"""Generate the committed golden-descriptor pack for the real-data parity
gate (tests/goldens/gem_r50_1024_ms3.npz).

A torch oracle of the reference's GeM-R50 eval pipeline
(reference: networks/RetrievalNet.py:327-354 model;
utils/helpfunc.py:19-48 multi-scale extraction) runs at the REAL
operating point — imsize ~1024, ms=[1, 2^-1/2, 1/2], sum / kept then
re-L2-normalize — on a fixed procedural image set with fully
deterministic weights (every tensor filled from one seeded numpy
Generator, so the pack regenerates bit-identically on any torch
version; ``torch.manual_seed`` alone would not guarantee that).

Three golden variants are saved:

* ``desc_ms3_scalefactor`` — the reference-LITERAL call:
  ``F.interpolate(scale_factor=s, mode='bilinear', align_corners=False)``.
  torch uses the provided scale (not in/out) for coordinate mapping, so
  sample positions differ from a size-based resize by up to ~0.07 px at
  the 1024/2^-1/2 point; compared with a loose tolerance + cosine pin.
* ``desc_ms3_size`` — same kernel with ``size=floor(in*s)`` (torch then
  recomputes scale = in/out, matching this framework's mapping
  exactly); compared tightly.
* ``desc_single`` — single-scale (no resize anywhere); the tightest
  end-to-end whole-model check.

Run from the repo root:  python tools/make_goldens.py
The JAX-side test consuming the pack is tests/test_golden_descriptors.py.
"""

import math
import os
import sys

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as tF

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

from test_backbone import TorchResNet  # noqa: E402

SEED = 42
SIZES = [(768, 1024), (1024, 683), (512, 512)]
SCALES = (1.0, 2 ** -0.5, 0.5)
OUTPUTDIM = 2048
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def golden_images():
    """Deterministic procedural photos: smooth multi-frequency fields
    plus seeded noise, quantized to uint8 (what a decoded JPEG feeds
    the eval pipeline)."""
    rng = np.random.default_rng(SEED)
    imgs = []
    for h, w in SIZES:
        yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w),
                             indexing="ij")
        chans = []
        for c in range(3):
            f1, f2, p1, p2 = rng.uniform(2, 9, 4)
            field = (np.sin(2 * np.pi * (f1 * xx + p1))
                     + np.cos(2 * np.pi * (f2 * yy + p2))
                     + 0.3 * np.sin(2 * np.pi * (f1 * xx * yy + p2)))
            chans.append(field)
        img = np.stack(chans, axis=-1)
        img += 0.25 * rng.standard_normal(img.shape)
        img -= img.min()
        img /= img.max()
        imgs.append(np.round(img * 255).astype(np.uint8))
    return imgs


def seeded_weights(module: tnn.Module, rng: np.random.Generator) -> None:
    """Fill every parameter/buffer from the numpy rng, in sorted
    state-dict order (deterministic independent of torch's init)."""
    sd = module.state_dict()
    with torch.no_grad():
        for k in sorted(sd):
            t = sd[k]
            if k.endswith("num_batches_tracked"):
                continue
            v = rng.standard_normal(tuple(t.shape)).astype(np.float32)
            if k.endswith("running_var"):
                v = np.abs(v) + 0.5
            elif k.endswith("running_mean"):
                v = v * 0.1
            elif ".bn" in k or "downsample.1" in k or k.startswith("bn"):
                # BN affine: weight near 1, bias small
                v = (1.0 + 0.1 * v) if k.endswith("weight") else 0.1 * v
            else:
                # conv / linear: small fan-in-ish scale
                fan = int(np.prod(t.shape[1:])) if t.ndim > 1 else 1
                v = v / math.sqrt(max(fan, 1))
            t.copy_(torch.from_numpy(np.ascontiguousarray(v)))
    module.load_state_dict(sd)


class TorchGeMR50(tnn.Module):
    """Reference GeM-R50 extract path (RetrievalNet.py:327-354)."""

    def __init__(self):
        super().__init__()
        self.backbone = TorchResNet("resnet50")
        self.whiten = tnn.Linear(2048, OUTPUTDIM)

    def forward(self, x):
        f = self.backbone(x, taps=(5,))[5]
        g = f.clamp(min=1e-6).pow(3.0).mean(dim=(2, 3)).pow(1.0 / 3.0)
        v = self.whiten(g)
        return tF.normalize(v, p=2, dim=-1)


def reference_ms_extract(net, x, scales, resize_by_size: bool):
    """The reference multi-scale loop (utils/helpfunc.py:30-46)."""
    vec = torch.zeros(OUTPUTDIM)
    kept = 0
    for s in scales:
        if s == 1.0:
            xs = x.clone()
        elif resize_by_size:
            nh = int(math.floor(x.shape[2] * s))
            nw = int(math.floor(x.shape[3] * s))
            xs = tF.interpolate(x, size=(nh, nw), mode="bilinear",
                                align_corners=False)
        else:
            xs = tF.interpolate(x, scale_factor=s, mode="bilinear",
                                align_corners=False)
        if xs.shape[2] < 36 or xs.shape[3] < 36:
            continue
        vec = vec + net(xs).squeeze(0)
        kept += 1
    return tF.normalize(vec / kept, p=2, dim=0).numpy()


def main():
    out_dir = os.path.join(ROOT, "tests", "goldens")
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(SEED + 1)
    net = TorchGeMR50().eval()
    seeded_weights(net, rng)

    imgs = golden_images()
    norm = [((im.astype(np.float32) / 255.0 - IMAGENET_MEAN)
             / IMAGENET_STD) for im in imgs]

    # independent resize cross-check: torch size-based bilinear vs this
    # framework's antialias=False host kernel
    from research_image_retrieval_tpu.index import resize_bilinear_np

    x0 = norm[0]
    nh, nw = int(x0.shape[0] * 0.5), int(math.floor(x0.shape[1] * 2 ** -0.5))
    want = tF.interpolate(
        torch.from_numpy(x0.transpose(2, 0, 1)[None]), size=(nh, nw),
        mode="bilinear", align_corners=False)[0].numpy().transpose(1, 2, 0)
    got = resize_bilinear_np(x0, nh, nw, antialias=False)
    print(f"resize cross-check max|diff| = {np.abs(got - want).max():.2e}")

    ms_sf, ms_sz, single = [], [], []
    with torch.no_grad():
        for i, im in enumerate(norm):
            x = torch.from_numpy(im.transpose(2, 0, 1)[None])
            print(f"image {i} {tuple(im.shape[:2])}: single...", flush=True)
            single.append(net(x).squeeze(0).numpy())
            print("  ms3 (scale_factor)...", flush=True)
            ms_sf.append(reference_ms_extract(net, x, SCALES, False))
            print("  ms3 (size)...", flush=True)
            ms_sz.append(reference_ms_extract(net, x, SCALES, True))

    path = os.path.join(out_dir, "gem_r50_1024_ms3.npz")
    np.savez_compressed(
        path,
        desc_ms3_scalefactor=np.stack(ms_sf).astype(np.float32),
        desc_ms3_size=np.stack(ms_sz).astype(np.float32),
        desc_single=np.stack(single).astype(np.float32),
        sizes=np.asarray(SIZES, np.int32),
        scales=np.asarray(SCALES, np.float64),
        seed=np.asarray([SEED], np.int64),
    )
    print(f"wrote {path} ({os.path.getsize(path)} bytes)")


if __name__ == "__main__":
    main()
