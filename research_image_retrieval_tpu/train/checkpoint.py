"""Checkpointing with the reference's retention policy, on Orbax.

Reference behavior (spca_train.py:289-300, helpfunc.py:128-207): save every
``save_freq`` epochs, delete older checkpoints keeping every 5th, keep a
separate best copy; resume restores model + optimizer and fast-forwards the
schedule.  Here the whole TrainState (params, batch_stats, opt_state, step)
is one pytree, so resume is exact by construction; saves are async
(preemption-friendly) via Orbax.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Mapping

import numpy as np
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager", "partial_load"]


def partial_load(
    target: Mapping,
    source: Mapping,
    rename: Mapping[str, str] | Callable[[str], str] | None = None,
    verbose: bool = False,
):
    """Shape-filtered partial merge of a foreign checkpoint into a pytree.

    The fine-tune-from-mismatched-checkpoint flow of the reference
    (reference: utils/helpfunc.py:342-368 — ``'globalmodel.'`` key remap +
    size-filtered ``load_state_dict``): every source leaf whose (renamed)
    path exists in ``target`` with the SAME shape replaces the target
    value; everything else keeps the target's value (e.g. a classifier
    head with a different class count, or newly added modules).

    Args:
      target: nested dict to merge into (e.g. ``variables`` or params).
      source: nested dict from a foreign checkpoint.
      rename: path rewriting applied to source keys before matching —
        either a {prefix: replacement} mapping over "/"-joined paths
        (e.g. ``{"globalmodel/": ""}``) or a callable str -> str.
      verbose: print a per-key load report.

    Returns:
      (merged, report) — merged has target's exact structure; report is
      {"loaded": [...], "shape_mismatch": [...], "unmatched_source": [...],
       "kept_target": [...]} with "/"-joined key names.
    """
    from flax import traverse_util

    tflat = traverse_util.flatten_dict(dict(target), sep="/")
    sflat = traverse_util.flatten_dict(dict(source), sep="/")

    if rename is not None:
        if callable(rename):
            sflat = {rename(k): v for k, v in sflat.items()}
        else:
            def apply(k: str) -> str:
                for old, new in rename.items():
                    if k.startswith(old):
                        return new + k[len(old):]
                return k

            sflat = {apply(k): v for k, v in sflat.items()}

    report = {"loaded": [], "shape_mismatch": [], "unmatched_source": [],
              "kept_target": []}
    merged = dict(tflat)
    for k, v in sflat.items():
        if k not in tflat:
            report["unmatched_source"].append(k)
            continue
        if np.shape(v) != np.shape(tflat[k]):
            report["shape_mismatch"].append(k)
            continue
        merged[k] = v
        report["loaded"].append(k)
    report["kept_target"] = sorted(set(tflat) - set(report["loaded"]))

    if verbose:
        for name, keys in report.items():
            for k in keys:
                print(f"partial_load[{name}]: {k}")
    return traverse_util.unflatten_dict(merged, sep="/"), report


class CheckpointManager:
    """Epoch-keyed checkpoints with rolling retention + best tracking.

    Args:
      directory: checkpoint root (created if missing).
      keep_every: retention anchor — epochs divisible by this are kept
        forever (reference keeps every 5th: spca_train.py:293-300).
      keep_last: how many most-recent epochs survive rolling deletion.
    """

    def __init__(self, directory: str, keep_every: int = 5, keep_last: int = 1):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.keep_every = keep_every
        self.keep_last = keep_last
        self._ckptr = ocp.StandardCheckpointer()
        self._best_metric: float | None = None

    def _path(self, epoch: int) -> str:
        return os.path.join(self.directory, f"epoch_{epoch:05d}")

    def save(self, epoch: int, state: Any, metric: float | None = None,
             lower_is_better: bool = True):
        """Save state for ``epoch``; update 'best' if metric improves."""
        self._ckptr.save(self._path(epoch), state, force=True)
        self._ckptr.wait_until_finished()
        if metric is not None:
            if self._best_metric is None or (
                metric < self._best_metric if lower_is_better else metric > self._best_metric
            ):
                self._best_metric = metric
                best = os.path.join(self.directory, "best")
                self._ckptr.save(best, state, force=True)
                self._ckptr.wait_until_finished()
        self._rolling_delete(epoch)

    def _rolling_delete(self, current: int):
        for e in self._list_epochs():
            if e == current or e % self.keep_every == 0:
                continue
            if e < current - (self.keep_last - 1):
                path = self._path(e)
                import shutil

                shutil.rmtree(path, ignore_errors=True)

    def _list_epochs(self) -> list[int]:
        out = []
        for name in os.listdir(self.directory):
            if name.startswith("epoch_"):
                try:
                    out.append(int(name.split("_")[1]))
                except (IndexError, ValueError):
                    pass
        return sorted(out)

    def latest_epoch(self) -> int | None:
        es = self._list_epochs()
        return es[-1] if es else None

    def restore(self, state_template: Any, epoch: int | None = None,
                best: bool = False) -> tuple[Any, int]:
        """Restore (state, epoch).  ``state_template`` provides the pytree
        structure/shardings (an abstract or concrete TrainState)."""
        if best:
            path = os.path.join(self.directory, "best")
            epoch = -1
        else:
            if epoch is None:
                epoch = self.latest_epoch()
                if epoch is None:
                    raise FileNotFoundError(f"no checkpoints in {self.directory}")
            path = self._path(epoch)
        restored = self._ckptr.restore(path, target=state_template)
        return restored, epoch
