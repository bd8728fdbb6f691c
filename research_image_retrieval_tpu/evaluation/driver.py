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
import jax.numpy as jnp
import numpy as np

from research_image_retrieval_tpu.data import (
    ImageFromList,
    PrefetchedImages,
    RevisitedDataset,
    SyntheticRetrievalDataset,
    make_synthetic_gnd,
)
from research_image_retrieval_tpu.data.transforms import (
    IMAGENET_MEAN,
    IMAGENET_STD,
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


def _make_extract_fn(model, variables, bucket: int = 128):
    """Extraction fn + bucket mode + extent alignment for
    ``extract_vectors``.

    Probes (via abstract evaluation, no compute) whether the model's
    extract path accepts a ``valid_hw`` extent array; if so, bucketed
    masked extraction is used (O(buckets) compiles on aspect-preserving
    datasets), otherwise exact-shape grouping.  Returns
    ``(fn, bucket, extent_multiple)`` — patch/window models advertise a
    grid multiple (``model.extent_multiple``) and extract_vectors snaps
    image extents to it, keeping their ``valid_hw // patch`` exact.
    """
    masked = lambda x, valid_hw: model.apply(
        variables, x, valid_hw, method="extract"
    )
    multiple = int(getattr(model, "extent_multiple", 1))
    probe = 64 * max(1, -(-multiple // 64))  # probe size obeys alignment
    try:
        jax.eval_shape(
            masked,
            jax.ShapeDtypeStruct((1, probe, probe, 3), jnp.float32),
            jax.ShapeDtypeStruct((1, 2), jnp.int32),
        )
        return masked, bucket, multiple
    except Exception:
        return (
            (lambda x: model.apply(variables, x, method="extract")),
            None,
            1,
        )


def evaluate(cfg: EvalConfig):
    """Evaluate on the configured Revisited datasets; returns result dict."""
    model, variables = _load_model(cfg)
    extract, bucket, multiple = _make_extract_fn(model, variables,
                                                 bucket=cfg.bucket)

    results = {}
    for dataset in cfg.datasets:
        gnd_file = os.path.join(cfg.data_root, dataset, f"gnd_{dataset}.pkl")
        if not os.path.exists(gnd_file):
            print(f">> {dataset}: dataset not found at {cfg.data_root}; "
                  "using the SYNTHETIC fixture (clearly not real data)")
            results[dataset] = evaluate_synthetic(model, variables, cfg)
            continue

        ds = RevisitedDataset(dataset, cfg.data_root)
        # device_scales: ship RAW uint8 (4x fewer H2D bytes) and fuse
        # normalization + scale resizes into the device programs
        dev = cfg.device_scales and bucket is not None
        norm = (IMAGENET_MEAN, IMAGENET_STD) if dev else None
        # split decode (host entropy -> device iDCT) for the gallery;
        # bbox'd queries fall back to RGB per item inside the stream
        dct_k = int(getattr(cfg, "dct_decode", 0)) if dev else 0
        db_loader = PrefetchedImages(
            ImageFromList(ds.im_fnames, imsize=cfg.imsize, raw_uint8=dev,
                          dct_coeffs=dct_k))
        q_loader = PrefetchedImages(ImageFromList(
            ds.qim_fnames, imsize=cfg.imsize,
            bbxs=[ds.query_bbx(i) for i in range(ds.nq)],
            raw_uint8=dev, dct_coeffs=dct_k,
        ))
        vecs = extract_vectors(extract, db_loader, scales=cfg.multiscale,
                               print_freq=100, bucket=bucket,
                               extent_multiple=multiple,
                               device_scales=dev, input_norm=norm,
                               dct_decode=dct_k > 0)
        qvecs = extract_vectors(extract, q_loader, scales=cfg.multiscale,
                                print_freq=100, bucket=bucket,
                                extent_multiple=multiple,
                                device_scales=dev, input_norm=norm,
                                dct_decode=dct_k > 0)
        if cfg.pca_whiten:
            vecs, qvecs = _whiten(vecs, qvecs, cfg)
        if cfg.alpha_qe:
            qvecs = np.asarray(
                alpha_query_expansion(qvecs, vecs, k=cfg.qe_k, alpha=cfg.qe_alpha)
            )
        if cfg.iqe:
            ranks = _iqe_ranks(qvecs, vecs, cfg)
        else:
            ranks = rank_full(qvecs, vecs)
        if cfg.superglobal:
            ranks = _superglobal_ranks(qvecs, vecs, ranks, cfg)
        if cfg.cvnet_rerank:
            ranks = _cvnet_rerank_ranks(qvecs, vecs, ranks, q_loader,
                                        db_loader, cfg)
        if cfg.local_rerank:
            ranks = _local_rerank_ranks(model, variables, qvecs, vecs,
                                        ranks, q_loader, db_loader, cfg)
        results[dataset] = compute_map_and_print(
            dataset, "global", "test", ranks, ds.gnd, kappas=list(cfg.kappas)
        )
    return results


def _whiten(vecs, qvecs, cfg: EvalConfig):
    """Learn PCA whitening on the GALLERY descriptors and apply to both
    sides, re-L2-normalizing (reference flow: pcawhitenlearn_shrinkage on
    index descriptors -> ConvDimReduction, networks/spca.py:205-227)."""
    from research_image_retrieval_tpu.ops import l2_normalize
    from research_image_retrieval_tpu.ops.whiten import (
        apply_whitening,
        pca_whiten_learn,
    )

    m, P = pca_whiten_learn(np.asarray(vecs), s=cfg.pca_shrinkage)
    dim = cfg.pca_dim or None
    vecs = np.asarray(l2_normalize(apply_whitening(vecs, m, P, out_dim=dim)))
    qvecs = np.asarray(l2_normalize(apply_whitening(qvecs, m, P, out_dim=dim)))
    return vecs, qvecs


def _splice_ranks(ranks: np.ndarray, heads: np.ndarray) -> np.ndarray:
    """Put each query's reordered shortlist first, then the remaining
    gallery in its original rank order.  ``ranks`` is [db, nq]; ``heads``
    is [nq, k] gallery ids."""
    ranks = np.asarray(ranks).copy()
    for qi in range(ranks.shape[1]):
        head = heads[qi]
        in_head = np.zeros(ranks.shape[0], bool)
        in_head[head] = True
        tail = ranks[:, qi][~in_head[ranks[:, qi]]]
        ranks[:, qi] = np.concatenate([head, tail])
    return ranks


def _square_images(loader, idxs, size: int) -> np.ndarray:
    """Load + bilinear-resize images to one [len(idxs), size, size, 3]
    batch (fixed shapes so featuremap extraction compiles once)."""
    from research_image_retrieval_tpu.index import resize_bilinear_np

    out = np.empty((len(idxs), size, size, 3), np.float32)
    item = getattr(loader, "rgb_item", loader.__getitem__)
    for j, i in enumerate(idxs):
        out[j] = resize_bilinear_np(np.asarray(item(int(i))), size, size)
    return out


def _cvnet_rerank_ranks(qvecs, vecs, ranks, q_loader, db_loader,
                        cfg: EvalConfig):
    """CVNet correlation re-verification of the top-k shortlist.

    Mirrors the reference's cached-featuremap rerank flow
    (reference: CVNet_Rerank_model.py:64-74) with the batched scorer:
    featuremaps are extracted once for the queries and the UNION of all
    shortlisted gallery images, then every (query, candidate) pair scores
    through one fixed-shape jitted program (index/rerank.py).
    """
    from research_image_retrieval_tpu.index import (
        make_cvnet_batch_scorer,
        rerank_shortlist_batched,
        search_topk,
    )
    from research_image_retrieval_tpu.models.cvnet import CVNetRerank

    model = CVNetRerank(backbone_name=cfg.rerank_backbone,)
    S = cfg.rerank_imsize
    probe = jnp.zeros((1, S, S, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), probe, probe)
    if not cfg.rerank_checkpoint:
        print(">> WARNING: CVNet reranker running from RANDOM init "
              "(no --rerank-checkpoint) — scores are untrained")
    if cfg.rerank_checkpoint:
        import orbax.checkpoint as ocp

        from research_image_retrieval_tpu.train.checkpoint import partial_load

        restored = ocp.StandardCheckpointer().restore(
            os.path.abspath(cfg.rerank_checkpoint)
        )
        if "state" in restored:
            restored = restored["state"]
        variables, report = partial_load(variables, restored)
        print(f">> CVNet rerank checkpoint: {len(report['loaded'])} arrays "
              f"loaded, {len(report['shape_mismatch'])} shape-mismatched")

    k = min(cfg.rerank_k, vecs.shape[0])
    scores, indices = map(np.asarray, search_topk(qvecs, vecs, k=k))

    fmap_fn = jax.jit(
        lambda x: model.apply(variables, x, method="extract_featuremap")
    )

    def fmaps_for(loader, ids):
        out = None
        for lo in range(0, len(ids), 8):
            chunk = ids[lo : lo + 8]
            imgs = _square_images(loader, chunk, S)
            pad = 8 - len(chunk)
            if pad:
                imgs = np.concatenate([imgs, np.zeros((pad,) + imgs.shape[1:],
                                                      np.float32)])
            f = np.asarray(fmap_fn(jnp.asarray(imgs)))[: len(chunk)]
            if out is None:
                out = np.empty((len(ids),) + f.shape[1:], np.float32)
            out[lo : lo + len(chunk)] = f
        return out

    q_fmaps = fmaps_for(q_loader, np.arange(len(qvecs)))
    union = np.unique(indices.reshape(-1))
    g_fmaps = fmaps_for(db_loader, union)
    remap = {int(g): j for j, g in enumerate(union)}
    local_idx = np.vectorize(remap.get)(indices)

    scorer = make_cvnet_batch_scorer(model, variables, q_fmaps, g_fmaps)
    _, new_local = rerank_shortlist_batched(
        scores, local_idx, scorer, blend=cfg.rerank_blend
    )
    new_global = union[new_local]
    return _splice_ranks(ranks, new_global)


def _local_rerank_ranks(model, variables, qvecs, vecs, ranks, q_loader,
                        db_loader, cfg: EvalConfig):
    """DELG-style local-feature geometric reranking.

    Locals + attention are extracted once for queries and the union of
    shortlisted gallery images (fixed square resize -> one compile); per
    pair, the top-attention locals go through mutual-NN matching +
    affine-RANSAC (index/rerank.py) and the inlier count reorders the
    shortlist above the non-verified tail (the reference's intended DELG
    flow — models/delg.py:109-124 exposes the locals but the rerank stage
    was never built there).
    """
    from research_image_retrieval_tpu.index import (
        geometric_verification_batch,
        rerank_shortlist_batched,
        search_topk,
    )

    if not hasattr(model, "extract_local"):
        raise ValueError(
            f"--local-rerank needs a model exposing extract_local (the "
            f"delg family); {cfg.model} does not"
        )
    S = cfg.rerank_imsize

    local_fn = jax.jit(
        lambda x: model.apply(variables, x, method="extract_local")
    )
    # derive the local-feature grid from the model itself (stride varies
    # by backbone/dilation) — square inputs give a square grid
    n_locals = jax.eval_shape(
        local_fn, jax.ShapeDtypeStruct((1, S, S, 3), jnp.float32)
    )[1].shape[1]
    grid = int(round(n_locals ** 0.5))

    def locals_for(loader, ids, top):
        descs, coords = [], []
        yy, xx = np.meshgrid(np.arange(grid), np.arange(grid), indexing="ij")
        all_coords = np.stack([yy.ravel(), xx.ravel()], 1).astype(np.float32)
        for lo in range(0, len(ids), 8):
            chunk = ids[lo : lo + 8]
            imgs = _square_images(loader, chunk, S)
            pad = 8 - len(chunk)
            if pad:
                imgs = np.concatenate(
                    [imgs, np.zeros((pad,) + imgs.shape[1:], np.float32)]
                )
            lf, att = map(np.asarray, local_fn(jnp.asarray(imgs)))
            for b in range(len(chunk)):
                keep = np.argsort(-att[b])[:top]
                descs.append(lf[b][keep])
                coords.append(all_coords[keep])
        return descs, coords

    k = min(cfg.rerank_k, vecs.shape[0])
    scores, indices = map(np.asarray, search_topk(qvecs, vecs, k=k))
    q_desc, q_xy = locals_for(q_loader, np.arange(len(qvecs)),
                              cfg.lr_top_attn)
    union = np.unique(indices.reshape(-1))
    g_desc, g_xy = locals_for(db_loader, union, cfg.lr_top_attn)
    remap = {int(g): j for j, g in enumerate(union)}
    local_idx = np.vectorize(remap.get)(indices)

    # all locals are attention-top-K of a fixed square grid, so the
    # per-image lists stack to fixed [*, L, D] / [*, L, 2] blocks and
    # every pair scores through the vectorized RANSAC program
    qd, qc2 = np.stack(q_desc), np.stack(q_xy)
    gd, gc2 = np.stack(g_desc), np.stack(g_xy)

    def scorer(qids, gids):
        qids = np.asarray(qids)
        gids = np.asarray(gids)
        inliers = geometric_verification_batch(
            qd[qids], qc2[qids], gd[gids], gc2[gids]
        )
        return inliers / float(cfg.lr_top_attn)

    _, new_local = rerank_shortlist_batched(
        scores, local_idx, scorer, blend=cfg.rerank_blend
    )
    return _splice_ranks(ranks, union[new_local])


def _iqe_ranks(qvecs, vecs, cfg: EvalConfig) -> np.ndarray:
    """Rank with the learned Iterative Query Expansion: the IQE MLP
    expands each query from its top-k neighbors and blends initial with
    expanded scores, recursively (index/qe.py; reference
    manus/1_SPARSE/sparse_model.py:334-426).  Returns the [db, nq] rank
    matrix from the blended final scores."""
    from research_image_retrieval_tpu.index.qe import IterativeQueryExpansion

    model = IterativeQueryExpansion(
        embed_dim=int(qvecs.shape[1]), top_k=cfg.iqe_k,
        max_iterations=cfg.iqe_iterations, gamma=cfg.iqe_gamma,
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(qvecs[:1]), jnp.asarray(vecs[:2])
    )
    if cfg.iqe_checkpoint:
        import orbax.checkpoint as ocp

        from research_image_retrieval_tpu.train.checkpoint import partial_load

        restored = ocp.StandardCheckpointer().restore(
            os.path.abspath(cfg.iqe_checkpoint)
        )
        if "state" in restored:
            restored = restored["state"]
        variables, report = partial_load(variables, restored)
        print(f">> IQE checkpoint: {len(report['loaded'])} arrays loaded, "
              f"{len(report['shape_mismatch'])} shape-mismatched")
    else:
        print(">> WARNING: IQE expansion running from RANDOM init "
              "(no iqe_checkpoint) — the expansion MLP is untrained")
    out = jax.jit(model.apply)(
        variables, jnp.asarray(qvecs, jnp.float32),
        jnp.asarray(vecs, jnp.float32),
    )
    return np.asarray(jnp.argsort(-out["final_scores"], axis=1)).T


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
    return _splice_ranks(ranks, ni)


def evaluate_synthetic(model, variables, cfg: EvalConfig):
    """Deterministic synthetic evaluation (pipeline smoke metric)."""
    ds = SyntheticRetrievalDataset(
        num_classes=12, samples_per_class=8,
        image_size=min(cfg.imsize, 128), seed=7,
    )
    imgs, labels = ds.as_arrays()
    extract, bucket, multiple = _make_extract_fn(model, variables,
                                                 bucket=cfg.bucket)
    vecs = extract_vectors(extract, list(imgs), scales=cfg.multiscale,
                           bucket=bucket, extent_multiple=multiple)
    q_idx = np.arange(0, len(ds), 8)
    qvecs = vecs[q_idx]
    # same pipeline order as evaluate(): whiten first, then expand queries
    if cfg.pca_whiten:
        vecs, qvecs = _whiten(vecs, qvecs, cfg)
    if cfg.alpha_qe:
        qvecs = np.asarray(
            alpha_query_expansion(qvecs, vecs, k=cfg.qe_k, alpha=cfg.qe_alpha)
        )
    gnd = make_synthetic_gnd(labels, q_idx)
    ranks = _iqe_ranks(qvecs, vecs, cfg) if cfg.iqe else rank_full(qvecs, vecs)
    if cfg.superglobal:
        ranks = _superglobal_ranks(qvecs, vecs, ranks, cfg)
    return compute_map_and_print(
        "roxford5k", "global", "synthetic", ranks, gnd, kappas=list(cfg.kappas)
    )
