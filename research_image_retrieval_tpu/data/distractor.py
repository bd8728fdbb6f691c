"""Distractor / index-set dataset with partitioning.

Behavioral contract of the reference Distractor_lmdb
(reference: dataset/configdataset.py:306-354): a label-free image pool
(the GLDv2 index/distractor set) with an optional split-derived pool and
a [start, end) partition window — the mechanism for building the 1.4M
gallery in shards across workers/hosts.  Works over any record source
(LMDB when available, file directories otherwise).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from research_image_retrieval_tpu.data.transforms import imthumbnail

__all__ = ["DistractorDataset", "partition_for_host"]


def partition_for_host(n: int, host: int, n_hosts: int) -> tuple[int, int]:
    """[start, end) slice of an n-item pool for one of n_hosts workers."""
    per = -(-n // n_hosts)
    start = min(host * per, n)
    return start, min(start + per, n)


class DistractorDataset:
    """Unlabeled image pool for gallery building.

    Args:
      source: random-access dataset returning ``(image, label)`` or a bare
        image at each index (GLDv2FileDataset / GLDv2LmdbDataset /
        SyntheticRetrievalDataset all work).
      pool: optional index subset (the reference's split-derived pool).
      partition: optional (start, end) window into the pool — each worker
        extracts only its shard of the gallery.
      imsize: optional max-side thumbnail.
      transform: optional callable applied to the image.
    """

    def __init__(
        self,
        source,
        pool: Sequence[int] | None = None,
        partition: tuple[int, int] | None = None,
        imsize: int | None = None,
        transform=None,
    ):
        self.source = source
        pool = list(range(len(source))) if pool is None else list(pool)
        if partition is not None:
            start, end = partition
            pool = pool[start:end]
        self.pool = pool
        self.imsize = imsize
        self.transform = transform

    def __len__(self) -> int:
        return len(self.pool)

    def __getitem__(self, i: int) -> np.ndarray:
        item = self.source[self.pool[i]]
        img = item[0] if isinstance(item, tuple) else item
        if self.imsize is not None:
            img = imthumbnail(np.asarray(img), self.imsize)
        if self.transform is not None:
            img = self.transform(img)
        return np.asarray(img)

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]
