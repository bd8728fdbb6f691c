"""Evaluation driver: extract -> rank -> Revisited protocol mAP.

The composition the reference leaves implicit across utilities
(reference: SURVEY.md section 3.2 — RoxfordAndRparis + ImageFromList +
extract_vectors + ranks + compute_map_and_print), with optional alphaQE.
Falls back to a synthetic fixture when the dataset directory is missing
(the reference's mock-data mode, iris_evaluate.py:296-336 — but labeled
as synthetic here instead of silently faking real datasets).
"""

from __future__ import annotations

import os

import jax
import numpy as np

from research_image_retrieval_tpu.data import (
    ImageFromList,
    RevisitedDataset,
    SyntheticRetrievalDataset,
    make_synthetic_gnd,
)
from research_image_retrieval_tpu.evaluation.revisited import (
    compute_map_and_print,
)
from research_image_retrieval_tpu.index import (
    alpha_query_expansion,
    extract_vectors,
    rank_full,
)
from research_image_retrieval_tpu.models import get_model
from research_image_retrieval_tpu.utils.config import EvalConfig

__all__ = ["evaluate", "evaluate_synthetic"]


def _load_model(cfg: EvalConfig, num_classes: int = 81313):
    import jax.numpy as jnp

    overrides = dict(cfg.model_overrides)
    overrides.setdefault("num_classes", num_classes)
    model = get_model(cfg.model, **overrides)
    size = min(cfg.imsize, 224)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)),
        labels=jnp.zeros((1,), jnp.int32), train=False,
    )
    if cfg.checkpoint:
        import orbax.checkpoint as ocp

        restored = ocp.StandardCheckpointer().restore(
            os.path.abspath(cfg.checkpoint)
        )
        # accept the train driver's payload ({"state": TrainState, "it",
        # "loop_epoch"}), a bare TrainState-like dict, or raw variables
        if "state" in restored:
            restored = restored["state"]
        if "params" in restored:
            variables = {
                "params": restored["params"],
                "batch_stats": restored.get("batch_stats", {}) or {},
            }
            if restored.get("model_state"):
                variables["model_state"] = restored["model_state"]
        else:
            raise ValueError(
                f"unrecognized checkpoint layout at {cfg.checkpoint}: "
                f"keys {sorted(restored)}"
            )
    return model, variables


def _make_extract_fn(model, variables):
    """Extraction fn + bucket mode for ``extract_vectors``.

    Probes (via abstract evaluation, no compute) whether the model's
    extract path accepts a ``valid_hw`` extent array; if so, bucketed
    masked extraction is used (O(buckets) compiles on aspect-preserving
    datasets), otherwise exact-shape grouping.
    """
    import jax.numpy as jnp

    masked = lambda x, valid_hw: model.apply(
        variables, x, valid_hw, method="extract"
    )
    try:
        jax.eval_shape(
            masked,
            jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32),
            jax.ShapeDtypeStruct((1, 2), jnp.int32),
        )
        return masked, 32
    except Exception:
        return (lambda x: model.apply(variables, x, method="extract")), None


def evaluate(cfg: EvalConfig):
    """Evaluate on the configured Revisited datasets; returns result dict."""
    model, variables = _load_model(cfg)
    extract, bucket = _make_extract_fn(model, variables)

    results = {}
    for dataset in cfg.datasets:
        gnd_file = os.path.join(cfg.data_root, dataset, f"gnd_{dataset}.pkl")
        if not os.path.exists(gnd_file):
            print(f">> {dataset}: dataset not found at {cfg.data_root}; "
                  "using the SYNTHETIC fixture (clearly not real data)")
            results[dataset] = evaluate_synthetic(model, variables, cfg)
            continue

        ds = RevisitedDataset(dataset, cfg.data_root)
        db_loader = ImageFromList(ds.im_fnames, imsize=cfg.imsize)
        q_loader = ImageFromList(
            ds.qim_fnames, imsize=cfg.imsize,
            bbxs=[ds.query_bbx(i) for i in range(ds.nq)],
        )
        vecs = extract_vectors(extract, db_loader, scales=cfg.multiscale,
                               print_freq=100, bucket=bucket)
        qvecs = extract_vectors(extract, q_loader, scales=cfg.multiscale,
                                print_freq=100, bucket=bucket)
        if cfg.alpha_qe:
            qvecs = np.asarray(
                alpha_query_expansion(qvecs, vecs, k=cfg.qe_k, alpha=cfg.qe_alpha)
            )
        ranks = rank_full(qvecs, vecs)
        if cfg.superglobal:
            ranks = _superglobal_ranks(qvecs, vecs, ranks, cfg)
        results[dataset] = compute_map_and_print(
            dataset, "global", "test", ranks, ds.gnd, kappas=list(cfg.kappas)
        )
    return results


def _superglobal_ranks(qvecs, vecs, ranks, cfg: EvalConfig):
    """Refine the top-M of each query with SuperGlobal reranking and
    splice the reordered shortlist back into the full [db, nq] ranks."""
    from research_image_retrieval_tpu.index import (
        search_topk,
        superglobal_rerank,
    )

    M = min(cfg.sg_m, vecs.shape[0])
    s, i = map(np.asarray, search_topk(qvecs, vecs, k=M))
    _, ni = superglobal_rerank(np.asarray(qvecs), np.asarray(vecs), s, i)
    ranks = np.asarray(ranks).copy()
    for qi in range(ranks.shape[1]):
        head = ni[qi]
        in_head = np.zeros(ranks.shape[0], bool)
        in_head[head] = True
        tail = ranks[:, qi][~in_head[ranks[:, qi]]]
        ranks[:, qi] = np.concatenate([head, tail])
    return ranks


def evaluate_synthetic(model, variables, cfg: EvalConfig):
    """Deterministic synthetic evaluation (pipeline smoke metric)."""
    ds = SyntheticRetrievalDataset(
        num_classes=12, samples_per_class=8,
        image_size=min(cfg.imsize, 128), seed=7,
    )
    imgs, labels = ds.as_arrays()
    extract, bucket = _make_extract_fn(model, variables)
    vecs = extract_vectors(extract, list(imgs), scales=cfg.multiscale,
                           bucket=bucket)
    q_idx = np.arange(0, len(ds), 8)
    qvecs = vecs[q_idx]
    if cfg.alpha_qe:
        qvecs = np.asarray(
            alpha_query_expansion(qvecs, vecs, k=cfg.qe_k, alpha=cfg.qe_alpha)
        )
    gnd = make_synthetic_gnd(labels, q_idx)
    ranks = rank_full(qvecs, vecs)
    if cfg.superglobal:
        ranks = _superglobal_ranks(qvecs, vecs, ranks, cfg)
    return compute_map_and_print(
        "roxford5k", "global", "synthetic", ranks, gnd, kappas=list(cfg.kappas)
    )
