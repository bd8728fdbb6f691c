"""Golden + property tests for the Revisited-protocol metrics.

The oracle here is an independent brute-force implementation that removes
junk images from the ranking entirely (the textbook definition) rather than
rank-shifting, so the two paths agree only if the vectorized junk-shift is
correct.
"""

import numpy as np
import pytest

from research_image_retrieval_tpu.evaluation import (
    compute_ap,
    compute_map,
    compute_map_and_print,
    evaluate_revisited,
)


def brute_force_ap(ranked_ids, ok_ids, junk_ids):
    """Textbook trapezoidal AP with junk images deleted from the ranking."""
    ok, junk = set(ok_ids), set(junk_ids)
    clean = [r for r in ranked_ids if r not in junk]
    ap, found = 0.0, 0
    for rank, img in enumerate(clean):
        if img in ok:
            p0 = 1.0 if rank == 0 else found / rank
            p1 = (found + 1) / (rank + 1)
            ap += (p0 + p1) / 2.0
            found += 1
    return ap / len(ok)


class TestComputeAP:
    def test_perfect_ranking(self):
        # positives at ranks 0,1,2 out of 3 -> AP = 1.0
        assert compute_ap(np.array([0, 1, 2]), 3) == pytest.approx(1.0)

    def test_single_positive_rank0(self):
        assert compute_ap(np.array([0]), 1) == pytest.approx(1.0)

    def test_single_positive_rank1(self):
        # p0 = 0/1, p1 = 1/2 -> AP = 0.25
        assert compute_ap(np.array([1]), 1) == pytest.approx(0.25)

    def test_hand_computed(self):
        # positives at ranks 0 and 2, nres=2:
        # i=0: p0=1, p1=1 -> 1.0 ; i=1: p0=1/2, p1=2/3 -> 7/12
        # AP = (1.0 + 7/12)/2
        expected = (1.0 + (0.5 + 2 / 3) / 2) / 2
        assert compute_ap(np.array([0, 2]), 2) == pytest.approx(expected)

    def test_missing_positives_counted_in_recall(self):
        # only 1 of 2 positives retrieved at rank 0 -> AP = 0.5
        assert compute_ap(np.array([0]), 2) == pytest.approx(0.5)

    def test_empty(self):
        assert compute_ap(np.array([]), 3) == 0.0


class TestComputeMap:
    def test_junk_shifting(self):
        # db ids 0..4; ranking [3, 1, 4, 0, 2]; ok={4}, junk={3, 1}
        # junk occupies ranks 0,1 before positive at rank 2 -> shifted rank 0
        ranks = np.array([[3], [1], [4], [0], [2]])
        gnd = [{"ok": np.array([4]), "junk": np.array([3, 1])}]
        mAP, aps = compute_map(ranks, gnd)
        assert mAP == pytest.approx(1.0)

    def test_empty_query_excluded(self):
        ranks = np.array([[0, 0], [1, 1]])
        gnd = [
            {"ok": np.array([0]), "junk": np.array([])},
            {"ok": np.array([]), "junk": np.array([])},
        ]
        mAP, aps = compute_map(ranks, gnd)
        assert np.isinf(aps[1])
        assert mAP == pytest.approx(1.0)  # only query 0 counts

    def test_precision_at_k_denominator(self):
        # positive at rank 0 only, k=5: kp = min(max_pos=1, 5) = 1 -> P = 1.0
        ranks = np.array([[7], [1], [2], [3], [4]])
        gnd = [{"ok": np.array([7]), "junk": np.array([])}]
        mAP, aps, pr, prs = compute_map(ranks, gnd, keeps=[1, 5])
        assert pr[0] == pytest.approx(1.0)
        assert pr[1] == pytest.approx(1.0)  # kp saturates at max rank

    def test_list_input(self):
        ranks_li = [[3, 1, 4, 0, 2]]
        gnd = [{"ok": np.array([4]), "junk": np.array([3, 1])}]
        mAP, _ = compute_map(ranks_li, gnd, li=True)
        assert mAP == pytest.approx(1.0)

    def test_against_brute_force_random(self, rng):
        db_size, nq = 200, 25
        ranks = np.stack(
            [rng.permutation(db_size) for _ in range(nq)], axis=1
        )
        gnd = []
        for _ in range(nq):
            ids = rng.permutation(db_size)
            n_ok = int(rng.integers(1, 20))
            n_junk = int(rng.integers(0, 30))
            gnd.append(
                {"ok": ids[:n_ok], "junk": ids[n_ok : n_ok + n_junk]}
            )
        mAP, aps = compute_map(ranks, gnd)
        expected = [
            brute_force_ap(ranks[:, i], gnd[i]["ok"], gnd[i]["junk"])
            for i in range(nq)
        ]
        np.testing.assert_allclose(aps, expected, rtol=1e-12)
        assert mAP == pytest.approx(np.mean(expected))


class TestRevisitedProtocol:
    def _toy(self):
        # 6 db images; 2 queries
        ranks = np.array(
            [
                [0, 5],
                [1, 4],
                [2, 3],
                [3, 2],
                [4, 1],
                [5, 0],
            ]
        )
        gnd = [
            {
                "easy": np.array([0]),
                "hard": np.array([1]),
                "junk": np.array([2]),
            },
            {
                "easy": np.array([5]),
                "hard": np.array([]),
                "junk": np.array([]),
            },
        ]
        return ranks, gnd

    def test_emh_remapping(self):
        ranks, gnd = self._toy()
        res = evaluate_revisited(ranks, gnd, dataset="roxford5k")
        # Easy: q0 ok={0} at rank 0 -> 1.0; q1 ok={5} at rank 0 -> 1.0
        assert res.map_easy == pytest.approx(100.0)
        # Medium: q0 ok={0,1} ranks 0,1 -> 1.0; q1 ok={5} rank 0 -> 1.0
        assert res.map_medium == pytest.approx(100.0)
        # Hard: q0 ok={1}, junk={2,0} -> positive at shifted rank 0 -> 1.0
        # q1 ok empty -> excluded
        assert res.map_hard == pytest.approx(100.0)

    def test_hard_junk_shift(self):
        # ranking [0, 3, 1]: hard ok={1}, junk+easy={0}
        # junk at rank 0 -> positive shifts 2 -> 1: AP = (1/2*... )
        ranks = np.array([[0], [3], [1]])
        gnd = [{"easy": np.array([0]), "hard": np.array([1]), "junk": np.array([])}]
        res = evaluate_revisited(ranks, gnd)
        # after deleting easy id 0: ranking [3, 1]; positive at rank 1
        # AP = (0/1 + 1/2)/2 = 0.25
        assert res.map_hard == pytest.approx(25.0)

    def test_compute_map_and_print_contract(self, capsys):
        ranks, gnd = self._toy()
        e, m, h = compute_map_and_print("roxford5k", "global", "test", ranks, gnd)
        assert (e, m, h) == (100.0, 100.0, 100.0)
        out = capsys.readouterr().out
        assert "roxford5k" in out and "mAP" in out
