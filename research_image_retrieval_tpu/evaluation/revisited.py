"""Revisited Oxford/Paris protocol metrics.

Semantics-exact re-derivation of the reference evaluation protocol
(reference: src/benchmark/utils/evaluate.py:4-194) implemented with
vectorized NumPy instead of the reference's Python two-pointer loops.
Every behavioral detail of the protocol is preserved because mAP parity
against the reference is the framework's fidelity gate:

* trapezoidal average precision: for the i-th positive found at zero-based
  rank r,  AP += ((i/r if r>0 else 1) + (i+1)/(r+1)) / (2 * n_positives)
* junk removal by rank shifting: each positive's rank is reduced by the
  number of junk images ranked strictly before it
* Easy/Medium/Hard ground-truth remapping:
    E: ok=easy,       junk=junk+hard
    M: ok=easy+hard,  junk=junk
    H: ok=hard,       junk=junk+easy
* queries with an empty ``ok`` list get AP=+inf and are excluded from the
  mean (reference: evaluate.py:65-68,105)
* precision@k uses kp = min(max(rank_1based), k) as the denominator
  (reference: evaluate.py:99-103)
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np

__all__ = [
    "compute_ap",
    "compute_map",
    "compute_map_and_print",
    "evaluate_revisited",
    "RevisitedResult",
]


def compute_ap(ranks: np.ndarray, nres: int) -> float:
    """Average precision from zero-based ranks of the positive images.

    ``ranks`` must be sorted ascending; ``nres`` is the number of positives
    for the query (recall denominator).  Trapezoidal interpolation between
    the precision just before and just after each positive is used, exactly
    as in the reference protocol (reference: utils/evaluate.py:4-34).
    """
    ranks = np.asarray(ranks, dtype=np.float64)
    n_found = ranks.shape[0]
    if n_found == 0:
        return 0.0
    idx = np.arange(n_found, dtype=np.float64)
    # precision before this positive: i/rank (1.0 when rank == 0)
    precision_0 = np.where(ranks == 0, 1.0, idx / np.maximum(ranks, 1e-12))
    # precision including this positive
    precision_1 = (idx + 1.0) / (ranks + 1.0)
    return float(np.sum(precision_0 + precision_1) / (2.0 * nres))


def _positions_of(ranked_ids: np.ndarray, id_set: np.ndarray) -> np.ndarray:
    """Zero-based positions in the ranking whose image id is in ``id_set``."""
    if id_set.size == 0:
        return np.empty(0, dtype=np.int64)
    mask = np.isin(ranked_ids, id_set)
    return np.flatnonzero(mask).astype(np.int64)


def _shift_junk(pos: np.ndarray, junk: np.ndarray) -> np.ndarray:
    """Subtract from each positive rank the number of junk ranked before it.

    Vectorized equivalent of the reference's two-pointer walk
    (reference: utils/evaluate.py:82-91): for sorted ``pos`` and ``junk``
    position arrays, each positive at position p moves up by
    ``count(junk < p)`` (junk positions never collide with positives).
    """
    if junk.size == 0 or pos.size == 0:
        return pos
    shift = np.searchsorted(junk, pos, side="left")
    return pos - shift


def compute_map(
    ranks,
    gnd: Sequence[dict],
    keeps: Sequence[int] | None = None,
    li: bool = False,
):
    """Mean average precision (and precision@k) for ranked retrieval lists.

    Args:
      ranks: ``[db_size, num_queries]`` array of image ids, best first per
        column; or, with ``li=True``, a per-query list of ranked id lists.
      gnd: per-query dicts with ``ok`` and optional ``junk`` id arrays.
      keeps: optional list of k values for precision@k.
      li: list-of-lists ranks layout (one ranked list per query).

    Returns:
      ``(mAP, aps)`` without ``keeps``; ``(mAP, aps, pr, prs)`` with.
      Queries with no positives get ``aps[i] = +inf`` and are excluded
      from the means, matching the reference protocol.
    """
    num_queries = len(gnd)
    aps = np.zeros(num_queries)
    n_keep = len(keeps) if keeps else 0
    prs = np.zeros((num_queries, n_keep))
    empty = 0

    if not li:
        ranks = np.asarray(ranks)

    for i in range(num_queries):
        ok_ids = np.asarray(gnd[i]["ok"]).ravel()
        if ok_ids.shape[0] == 0:
            aps[i] = np.inf
            if n_keep:
                prs[i, :] = np.inf
            empty += 1
            continue
        junk_ids = np.asarray(gnd[i].get("junk", np.empty(0))).ravel()

        ranked_ids = np.asarray(ranks[i]) if li else ranks[:, i]
        pos = _positions_of(ranked_ids, ok_ids)
        junk = _positions_of(ranked_ids, junk_ids)
        pos = _shift_junk(pos, junk)

        aps[i] = compute_ap(pos, len(ok_ids))

        if n_keep:
            pos1 = pos + 1  # 1-based ranks
            max_pos = pos1.max() if pos1.size else 0
            for k, kval in enumerate(keeps):
                kp = min(max_pos, kval)
                prs[i, k] = float((pos1 <= kp).sum()) / kp if kp > 0 else 0.0

    n_valid = max(num_queries - empty, 1)
    finite = np.isfinite(aps)
    mAP = float(aps[finite].sum()) / n_valid
    if not keeps:
        return mAP, aps
    pr = prs[finite].sum(axis=0) / n_valid if finite.any() else np.zeros(n_keep)
    return mAP, aps, pr, prs


@dataclasses.dataclass
class RevisitedResult:
    """E/M/H evaluation summary (percent, rounded to 2 decimals)."""

    dataset: str
    map_easy: float
    map_medium: float
    map_hard: float
    mp_easy: np.ndarray
    mp_medium: np.ndarray
    mp_hard: np.ndarray
    kappas: tuple
    aps_easy: np.ndarray | None = None
    aps_medium: np.ndarray | None = None
    aps_hard: np.ndarray | None = None

    def as_dict(self) -> dict:
        return {
            "dataset": self.dataset,
            "mAP": {"E": self.map_easy, "M": self.map_medium, "H": self.map_hard},
            "mP@k": {
                "kappas": list(self.kappas),
                "E": self.mp_easy.tolist(),
                "M": self.mp_medium.tolist(),
                "H": self.mp_hard.tolist(),
            },
        }


def _remap_gnd(gnd: Sequence[dict], ok_keys: Sequence[str], junk_keys: Sequence[str]):
    out = []
    for g in gnd:
        out.append(
            {
                "ok": np.concatenate([np.asarray(g[k]).ravel() for k in ok_keys])
                if ok_keys
                else np.empty(0),
                "junk": np.concatenate([np.asarray(g[k]).ravel() for k in junk_keys])
                if junk_keys
                else np.empty(0),
            }
        )
    return out


def evaluate_revisited(
    ranks,
    gnd: Sequence[dict],
    dataset: str = "roxford5k",
    kappas: Sequence[int] = (1, 5, 10),
    li: bool = False,
) -> RevisitedResult:
    """Full Easy/Medium/Hard evaluation under the Revisited protocol.

    Mirrors the E/M/H ground-truth remapping of the reference
    (reference: utils/evaluate.py:161-185) and returns a structured result
    with mAP and mP@k in rounded percent.
    """
    mapE, apsE, mprE, _ = compute_map(
        ranks, _remap_gnd(gnd, ["easy"], ["junk", "hard"]), list(kappas), li=li
    )
    mapM, apsM, mprM, _ = compute_map(
        ranks, _remap_gnd(gnd, ["easy", "hard"], ["junk"]), list(kappas), li=li
    )
    mapH, apsH, mprH, _ = compute_map(
        ranks, _remap_gnd(gnd, ["hard"], ["junk", "easy"]), list(kappas), li=li
    )
    r = lambda x: float(np.around(x * 100, decimals=2))
    return RevisitedResult(
        dataset=dataset,
        map_easy=r(mapE),
        map_medium=r(mapM),
        map_hard=r(mapH),
        mp_easy=np.around(mprE * 100, decimals=2),
        mp_medium=np.around(mprM * 100, decimals=2),
        mp_hard=np.around(mprH * 100, decimals=2),
        kappas=tuple(kappas),
        aps_easy=apsE,
        aps_medium=apsM,
        aps_hard=apsH,
    )


def compute_map_and_print(
    dataset: str,
    featuretype: str,
    mode: str,
    ranks,
    gnd: Sequence[dict],
    kappas: Sequence[int] = (1, 5, 10),
    verbose: bool = False,
    li: bool = False,
):
    """Reference-compatible entry point: prints and returns (E, M, H) mAP %.

    Matches the reference signature and return contract
    (reference: utils/evaluate.py:153-194).  Old-protocol datasets
    (oxford5k / paris6k without the gnd easy/hard split) are evaluated with
    a single ok/junk pass.
    """
    if dataset.startswith("oxford5k") or dataset.startswith("paris6k"):
        mAP, _ = compute_map(ranks, gnd, li=li)
        print(f">> {dataset}: mAP {np.around(mAP * 100, decimals=2):.2f}")
        return np.around(mAP * 100, decimals=2)

    res = evaluate_revisited(ranks, gnd, dataset=dataset, kappas=kappas, li=li)
    print(f">> Test Dataset: {dataset} *** Feature Type: {featuretype} >>")
    print(
        f">> mAP Easy: {res.map_easy}, Medium: {res.map_medium}, "
        f"Hard: {res.map_hard}"
    )
    print(
        f">> mP@k{list(kappas)} Easy: {res.mp_easy}, Medium: {res.mp_medium}, "
        f"Hard: {res.mp_hard}"
    )
    if verbose:
        print(
            ">> Query aps: >>\nEasy: {}\nMedium: {}\nHard: {}".format(
                np.around(res.aps_easy * 100, decimals=2),
                np.around(res.aps_medium * 100, decimals=2),
                np.around(res.aps_hard * 100, decimals=2),
            )
        )
    return res.map_easy, res.map_medium, res.map_hard
