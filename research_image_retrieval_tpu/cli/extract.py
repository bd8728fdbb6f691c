"""Descriptor-extraction CLI: images in, L2-normalized descriptors out.

The standalone counterpart of the extraction the reference embeds inside
its trainers/evaluators (reference: utils/helpfunc.py:18-48): point it at
an image directory, a packed record file (``.rirrec``), or a Revisited
dataset, and it writes an ``.npz`` index (``vecs`` [N, D] float32 plus
``names``/``labels``) ready for ``rir-search``.

    python -m research_image_retrieval_tpu.cli.extract --model gem_r50 \
        --images /data/jpegs --checkpoint ckpt/best --multiscale \
        --output gallery.npz
"""

from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="descriptor extraction")
    p.add_argument("--model", default="gem_r50")
    p.add_argument("--checkpoint", default=None)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--images", default=None,
                     help="directory of images (jpg/jpeg/png, recursive)")
    src.add_argument("--records", default=None,
                     help="packed .rirrec file (see docs/DATA.md)")
    src.add_argument("--dataset", default=None,
                     help="Revisited dataset name (needs --data-root)")
    p.add_argument("--data-root", default="")
    p.add_argument("--queries", action="store_true",
                   help="with --dataset: extract the query set (bbox-cropped)")
    p.add_argument("--imsize", type=int, default=1024,
                   help="max side for thumbnailing (0 = original size)")
    p.add_argument("--multiscale", action="store_true")
    p.add_argument("--host-scales", action="store_true",
                   help="multi-scale resizes on the host instead of the "
                        "on-device tap-table resize (debug/fallback)")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--fast-decode", action="store_true",
                   help="native DCT-prescaled JPEG decode (decodes at the "
                        "smallest 1/2^k scale still >= --imsize; big win "
                        "when sources are much larger than --imsize, not "
                        "the strict-parity decode path)")
    p.add_argument("--quantize-int8", action="store_true",
                   help="store the index as symmetric per-row int8 "
                        "(vecs_int8 + scales; 4x smaller on disk, half "
                        "the HBM stream in rir-search --engine int8)")
    p.add_argument("--output", required=True)
    return p


def _iter_image_files(root: str):
    exts = {".jpg", ".jpeg", ".png"}
    for dirpath, _, files in sorted(os.walk(root)):
        for f in sorted(files):
            if os.path.splitext(f)[1].lower() in exts:
                yield os.path.join(dirpath, f)


def main(argv=None):
    args = build_parser().parse_args(argv)

    from research_image_retrieval_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    import numpy as np

    from research_image_retrieval_tpu.data.eval_loader import (
        ImageFromList,
        PrefetchedImages,
    )
    from research_image_retrieval_tpu.evaluation.driver import (
        _load_model,
        _make_extract_fn,
    )
    from research_image_retrieval_tpu.index import extract_vectors
    from research_image_retrieval_tpu.utils.config import EvalConfig

    cfg = EvalConfig(model=args.model, checkpoint=args.checkpoint,
                     imsize=args.imsize)
    model, variables = _load_model(cfg)
    extract, bucket, multiple = _make_extract_fn(model, variables)
    scales = (1.0, 2 ** -0.5, 0.5) if args.multiscale else (1.0,)
    # device-scales mode ships RAW uint8 + fused normalization (4x fewer
    # H2D bytes); requires the bucketed masked path
    dev = not args.host_scales and bucket is not None
    norm = None
    if dev:
        from research_image_retrieval_tpu.data.transforms import (
            IMAGENET_MEAN,
            IMAGENET_STD,
        )

        norm = (IMAGENET_MEAN, IMAGENET_STD)

    names: list = []
    labels = None
    if args.images:
        paths = list(_iter_image_files(args.images))
        if not paths:
            raise SystemExit(f"no images under {args.images}")
        names = [os.path.relpath(p, args.images) for p in paths]
        loader = PrefetchedImages(
            ImageFromList(paths, imsize=args.imsize or None,
                          raw_uint8=dev, fast_decode=args.fast_decode))
    elif args.records:
        from research_image_retrieval_tpu.data import RecordDataset
        from research_image_retrieval_tpu.data.transforms import (
            imthumbnail,
            normalize,
        )

        # records decode to RGB uint8 (records.py RecordDataset._decode);
        # max_side only PRESCALES (1/2^k), so the exact thumbnail resize
        # still applies here, mirroring ImageFromList
        ds = RecordDataset(
            args.records,
            max_side=args.imsize if args.fast_decode else 0,
        )
        labels = ds.labels()
        names = [str(i) for i in range(len(ds))]

        def _record_images():
            for i in range(len(ds)):
                img = ds[i][0]
                if args.imsize:
                    img = imthumbnail(img, args.imsize)
                if dev:
                    yield np.ascontiguousarray(img, np.uint8)
                else:  # host path: normalized floats like ImageFromList
                    yield normalize(np.asarray(img, np.float32) / 255.0)

        loader = _record_images()
    else:
        from research_image_retrieval_tpu.data.revisited import RevisitedDataset

        ds = RevisitedDataset(args.dataset, args.data_root)
        if args.queries:
            names = list(ds.qimlist)
            loader = PrefetchedImages(ImageFromList(
                ds.qim_fnames,
                imsize=args.imsize or None,
                bbxs=[ds.query_bbx(i) for i in range(ds.nq)],
                raw_uint8=dev,
                fast_decode=args.fast_decode,
            ))
        else:
            names = list(ds.imlist)
            loader = PrefetchedImages(ImageFromList(
                ds.im_fnames, imsize=args.imsize or None,
                raw_uint8=dev, fast_decode=args.fast_decode))

    vecs = extract_vectors(extract, loader, scales=scales, bucket=bucket,
                           batch_size=args.batch_size, print_freq=100,
                           extent_multiple=multiple,
                           device_scales=dev, input_norm=norm)
    vecs = np.asarray(vecs, np.float32)
    if args.quantize_int8:
        from research_image_retrieval_tpu.ops import quantize_gallery_int8

        qv, scales_ = quantize_gallery_int8(vecs)
        out = {"vecs_int8": np.asarray(qv), "scales": np.asarray(scales_),
               "names": np.asarray(names)}
    else:
        out = {"vecs": vecs, "names": np.asarray(names)}
    if labels is not None:
        out["labels"] = np.asarray(labels)
    np.savez(args.output, **out)
    shape = out.get("vecs", out.get("vecs_int8")).shape
    kind = "int8 " if args.quantize_int8 else ""
    print(f"wrote {shape} {kind}descriptors -> {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
