"""End-to-end walkthrough: train -> extract -> index -> search -> QE ->
rerank -> Revisited mAP, all on the synthetic fixture (no downloads).

Run:  python examples/end_to_end.py [--imsize 48] [--epochs 3]

This is the reference user's complete journey through the framework; every
step uses public APIs only.  With real data, swap the synthetic dataset
for data.build_gldv2_train_val / data.RevisitedDataset and raise imsize.
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--imsize", type=int, default=48)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--steps-per-epoch", type=int, default=8)
    ap.add_argument("--workdir", default="/tmp/rir_example")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from research_image_retrieval_tpu.data import (
        SyntheticRetrievalDataset,
        make_synthetic_gnd,
    )
    from research_image_retrieval_tpu.evaluation import compute_map_and_print
    from research_image_retrieval_tpu.index import (
        alpha_query_expansion,
        extract_vectors,
        rank_full,
        search_topk,
    )
    from research_image_retrieval_tpu.models import get_model
    from research_image_retrieval_tpu.train.driver import train
    from research_image_retrieval_tpu.utils.config import get_preset

    # ---- 1. train -------------------------------------------------------
    cfg = get_preset(
        "gem_r50",
        num_epochs=args.epochs,
        batch_size=8,
        imsize=args.imsize,
        num_workers=0,
        directory=os.path.join(args.workdir, "ckpt"),
        model_overrides={"backbone_name": "resnet18", "outputdim": 64},
    )
    print("== training ==")
    state, history = train(cfg, max_steps_per_epoch=args.steps_per_epoch)

    # ---- 2. extract gallery + query descriptors -------------------------
    print("== extraction ==")
    model = get_model(
        "gem_r50", backbone_name="resnet18", outputdim=64,
        num_classes=16,
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    extract = lambda x, v=None: model.apply(variables, x, v, method="extract")

    ds = SyntheticRetrievalDataset(
        num_classes=10, samples_per_class=8, image_size=args.imsize, seed=5
    )
    imgs, labels = ds.as_arrays()
    vecs = extract_vectors(extract, list(imgs), scales=(1.0, 2**-0.5))
    q_idx = np.arange(0, len(ds), 8)
    qvecs = vecs[q_idx]

    # ---- 3. first-stage search ------------------------------------------
    print("== search ==")
    scores, idx = search_topk(qvecs, vecs, k=10)
    print("top-3 for query 0:", np.asarray(idx)[0, :3])

    # ---- 4. alphaQE ------------------------------------------------------
    qe_vecs = np.asarray(alpha_query_expansion(qvecs, vecs, k=5, alpha=3.0))

    # ---- 5. Revisited-protocol evaluation -------------------------------
    print("== evaluation ==")
    gnd = make_synthetic_gnd(labels, q_idx)
    base = compute_map_and_print(
        "roxford5k", "global", "base", rank_full(qvecs, vecs), gnd
    )
    qe = compute_map_and_print(
        "roxford5k", "global", "alphaQE", rank_full(qe_vecs, vecs), gnd
    )
    print(f"base E/M/H: {base}  |  alphaQE E/M/H: {qe}")


if __name__ == "__main__":
    main()
