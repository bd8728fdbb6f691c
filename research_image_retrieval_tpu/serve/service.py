"""Resident top-k search service with query micro-batching.

TPU serving is throughput-from-batching: a single descriptor query uses
a sliver of the MXU, and XLA programs are compiled per shape.  The
service therefore

* keeps the gallery on the device ONCE (bf16 for the float engines —
  the measured operating point in BENCH.md — or int8 + scales for the
  quantized engine),
* compiles one engine program per power-of-two query-batch bucket
  (1, 2, 4, ... max_batch — at most log2(max_batch)+1 programs, padded
  queries masked out by slicing), and
* coalesces concurrent requests into one engine call inside a batching
  window (``window_ms``), the standard production pattern the
  per-request reference loop (iris_evaluate.py:383-386,
  adaptive_hybrid_retrieval_complete.py:384-433) cannot express.

All engine calls run on one worker thread — callers block on an event,
so the service is safe to drive from any number of request threads.
"""

from __future__ import annotations

import collections
import dataclasses
import queue
import threading
import time

import numpy as np

__all__ = ["SearchService", "ImageExtractor"]


@dataclasses.dataclass
class _Request:
    vecs: np.ndarray  # [n, D] fp32
    k: int
    done: threading.Event
    scores: np.ndarray | None = None
    indices: np.ndarray | None = None
    error: BaseException | None = None


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


class SearchService:
    """Device-resident gallery + micro-batched streaming top-k.

    Args:
      gallery: [N, D] float descriptors (exact/approx engines), or None
        when serving a prequantized index.
      names: optional [N] identifier array returned alongside indices.
      vecs_int8 / scales: prequantized gallery (rir-extract
        --quantize-int8 layout); implies ``engine="int8"`` by default.
      engine: "exact" (grouped bit-exact stream), "approx"
        (``lax.approx_max_k``), or "int8" (quantized stream).
      k: server-wide top-k (per-request k may be <= this).
      max_batch: largest coalesced query batch (power of two enforced).
      window_ms: how long the worker waits to coalesce more queries
        after the first one arrives.
      store_dtype: device storage dtype for the float engines
        ("bfloat16" halves stream bytes — the BENCH.md operating point;
        "float32" for bit-parity serving).
      exact_fp32_scores: score the exact engine at Precision.HIGHEST.
      selection: int8 engine selector ("exact" group-max or "approx").
      mesh: optional ``jax.sharding.Mesh`` — shard the gallery row-wise
        over ``mesh_axis`` and serve through ONE reusable shard_map
        program per query bucket (``parallel.make_sharded_stream_fn``).
        The index lives sharded in HBM for the life of the daemon;
        per-shard streams merge via an all_gather of [Q, k] candidates
        over ICI.  This is the 8-chip layout the <10 ms BASELINE budget
        assumes (BENCH.md: ~1.7 ms/chip at N/8 shards + merge).
        Engines: "exact" and "int8" (the approx selector composes via
        ``selection="approx"`` on int8).
    """

    def __init__(
        self,
        gallery: np.ndarray | None = None,
        names=None,
        *,
        vecs_int8: np.ndarray | None = None,
        scales: np.ndarray | None = None,
        engine: str | None = None,
        k: int = 100,
        max_batch: int = 32,
        window_ms: float = 2.0,
        store_dtype: str = "bfloat16",
        exact_fp32_scores: bool = False,
        selection: str = "exact",
        recall_target: float = 0.99,
        mesh=None,
        mesh_axis: str = "data",
    ):
        import jax.numpy as jnp

        if engine is None:
            engine = "int8" if vecs_int8 is not None else "exact"
        if engine not in ("exact", "approx", "int8"):
            raise ValueError(f"unknown engine {engine!r}")
        if mesh is not None and engine == "approx":
            raise ValueError(
                "the sharded service supports engine='exact' or 'int8' "
                "(use engine='int8', selection='approx' for the fast "
                "serving point)")
        self.engine = engine
        self.selection = selection
        self.recall_target = recall_target
        self.exact_fp32_scores = exact_fp32_scores
        self._mesh = mesh
        self._mesh_axis = mesh_axis

        if engine == "int8":
            if vecs_int8 is None:
                if gallery is None:
                    raise ValueError("int8 engine needs vecs_int8 or gallery")
                from research_image_retrieval_tpu.ops import (
                    quantize_gallery_int8,
                )

                vecs_int8, scales = quantize_gallery_int8(
                    np.asarray(gallery, np.float32))
            n, d = np.shape(vecs_int8)  # no host copy for device arrays
            if mesh is not None:
                from research_image_retrieval_tpu.parallel import (
                    place_sharded_gallery,
                )

                self._qg, self._gscales, _ = place_sharded_gallery(
                    np.asarray(vecs_int8, np.int8), mesh, mesh_axis,
                    g_scales=scales)
            else:
                self._qg = jnp.asarray(vecs_int8, jnp.int8)
                self._gscales = jnp.asarray(scales, jnp.float32)
            self._gallery = None
        else:
            if gallery is None:
                if vecs_int8 is None:
                    raise ValueError("float engines need a gallery")
                gallery = (np.asarray(vecs_int8, np.float32)
                           * np.asarray(scales, np.float32)[:, None])
            n, d = np.shape(gallery)  # no host copy for device arrays
            if mesh is not None:
                from research_image_retrieval_tpu.parallel import (
                    place_sharded_gallery,
                )

                self._gallery, self._gscales, _ = place_sharded_gallery(
                    np.asarray(gallery, jnp.dtype(store_dtype)), mesh,
                    mesh_axis)
                self._qg = None
            else:
                self._gallery = jnp.asarray(gallery, jnp.dtype(store_dtype))
                self._qg = self._gscales = None
        self.n_gallery, self.dim = int(n), int(d)
        self.names = None if names is None else np.asarray(names)
        self.k = min(int(k), self.n_gallery)
        self.max_batch = _next_pow2(int(max_batch))
        self.window_s = float(window_ms) / 1e3

        self._runs: dict[int, object] = {}  # bucket -> jitted engine
        self._queue: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        self._lock = threading.Lock()
        self._latencies = collections.deque(maxlen=4096)
        self._counts = collections.Counter()
        self._t0 = time.monotonic()
        self._worker = threading.Thread(target=self._worker_loop,
                                        name="rir-serve-worker", daemon=True)
        self._worker.start()

    # ------------------------------------------------------------- engine

    def _make_run(self, bucket: int):
        """Build + jit the engine program for a [bucket, D] query batch."""
        import jax

        from research_image_retrieval_tpu.ops import (
            approx_streaming_topk,
            int8_streaming_topk,
            scan_streaming_topk,
        )

        k = self.k
        if self._mesh is not None:
            # ONE reusable shard_map program (jit caches per query shape,
            # so every bucket still compiles exactly once); the sharded
            # gallery arrays are jit ARGUMENTS — device-resident, never
            # baked into the compiled program
            from research_image_retrieval_tpu.parallel import (
                make_sharded_stream_fn,
            )

            int8 = self.engine == "int8"
            g = self._qg if int8 else self._gallery
            s = self._gscales
            shard_n = g.shape[0] // self._mesh.shape[self._mesh_axis]
            on_tpu = jax.devices()[0].platform in ("tpu", "axon")
            chunk = (min(max(-(-shard_n // 4), 8192), shard_n)
                     if on_tpu else min(4096, shard_n))
            run = make_sharded_stream_fn(
                self._mesh, self.n_gallery, shard_n, k=k, chunk=chunk,
                engine=self.engine, axis=self._mesh_axis,
                exact_fp32_scores=self.exact_fp32_scores,
                selection=self.selection, recall_target=self.recall_target,
            )
            return lambda q: run(q, g, s)
        # gallery arrays are jit ARGUMENTS on every path: closing them
        # into the jitted function bakes the (multi-GB) gallery into the
        # lowered program as a CONSTANT — re-serialized per batch bucket
        # (observed: 2.87 GB per program, minutes of extra compile).
        on_tpu = jax.devices()[0].platform in ("tpu", "axon")
        if self.engine == "int8":
            sel, rt = self.selection, self.recall_target
            n = self._qg.shape[0]
            # same tuned ~N/4 chunking as the exact stream
            chunk = min(max(-(-n // 4), 8192), n) if on_tpu else 4096
            jitted = jax.jit(
                lambda q, qg, gs: int8_streaming_topk(
                    q, qg, gs, k=k, chunk=chunk, selection=sel,
                    recall_target=rt)
            )
            qg, gs = self._qg, self._gscales
            return lambda q: jitted(q, qg, gs)
        if self.engine == "approx":
            rt = self.recall_target
            jitted = jax.jit(
                lambda q, g: approx_streaming_topk(q, g, k=k,
                                                   recall_target=rt)
            )
            g = self._gallery
            return lambda q: jitted(q, g)
        n = self._gallery.shape[0]
        # tuned operating point (BENCH.md round-3 matrix): ~N/4 chunks
        chunk = min(max(-(-n // 4), 8192), n) if on_tpu else 4096
        fp32 = self.exact_fp32_scores
        jitted = jax.jit(
            lambda q, g: scan_streaming_topk(q, g, k=k, chunk=chunk,
                                             exact_fp32_scores=fp32)
        )
        g = self._gallery
        return lambda q: jitted(q, g)

    def _run_for(self, bucket: int):
        fn = self._runs.get(bucket)
        if fn is None:
            fn = self._make_run(bucket)
            with self._lock:  # stats() iterates the dict from other threads
                self._runs[bucket] = fn
        return fn

    def warmup(self):
        """Compile every query bucket up front (cold-start cost off the
        request path; the persistent compile cache makes this one-time
        per machine)."""
        q = np.zeros((self.max_batch, self.dim), np.float32)
        b = 1
        while b <= self.max_batch:
            s, i = self._run_for(b)(q[:b])
            np.asarray(s)  # block until compiled + executed
            b *= 2
        return self

    # ------------------------------------------------------------- worker

    def _worker_loop(self):
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.05)
            except queue.Empty:
                continue
            if first is None:
                break
            batch = [first]
            rows = first.vecs.shape[0]
            deadline = time.monotonic() + self.window_s
            while rows < self.max_batch:
                wait = deadline - time.monotonic()
                if wait <= 0:
                    break
                try:
                    req = self._queue.get(timeout=wait)
                except queue.Empty:
                    break
                if req is None:
                    self._stop.set()
                    break
                batch.append(req)
                rows += req.vecs.shape[0]
            self._execute(batch)
        # drain: fail any requests left behind at shutdown
        while True:
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                return
            if req is not None:
                req.error = RuntimeError("service closed")
                req.done.set()

    def _execute(self, batch: list[_Request]):
        try:
            allq = (batch[0].vecs if len(batch) == 1
                    else np.concatenate([r.vecs for r in batch], axis=0))
            total = allq.shape[0]
            scores = np.empty((total, self.k), np.float32)
            indices = np.empty((total, self.k), np.int32)
            calls = 0
            for start in range(0, total, self.max_batch):
                sub = allq[start:start + self.max_batch]
                bucket = _next_pow2(sub.shape[0])
                if sub.shape[0] < bucket:  # pad to the compiled bucket
                    sub = np.concatenate(
                        [sub, np.zeros((bucket - sub.shape[0], self.dim),
                                       np.float32)], axis=0)
                s, i = self._run_for(bucket)(sub)
                n = min(self.max_batch, total - start)
                scores[start:start + n] = np.asarray(s, np.float32)[:n]
                indices[start:start + n] = np.asarray(i, np.int32)[:n]
                calls += 1
            row = 0
            for req in batch:
                n = req.vecs.shape[0]
                req.scores = scores[row:row + n, :req.k]
                req.indices = indices[row:row + n, :req.k]
                row += n
                req.done.set()
            with self._lock:
                self._counts["engine_calls"] += calls
                self._counts["coalesced_batches"] += 1
                self._counts["queries"] += total
        except BaseException as e:  # deliver failures to the callers
            for req in batch:
                if not req.done.is_set():
                    req.error = e
                    req.done.set()

    # ---------------------------------------------------------------- api

    def search(self, vecs, k: int | None = None):
        """Blocking top-k search.  ``vecs`` is [n, D] (or [D]); returns
        ``(scores [n, k], indices [n, k])`` fp32/int32 numpy arrays."""
        if self._stop.is_set():
            raise RuntimeError("service closed")
        v = np.asarray(vecs, np.float32)
        if v.ndim == 1:
            v = v[None]
        if v.ndim != 2 or v.shape[1] != self.dim:
            raise ValueError(f"expected [n, {self.dim}] queries, "
                             f"got {v.shape}")
        kk = self.k if k is None else int(k)
        if not 0 < kk <= self.k:
            raise ValueError(f"k must be in [1, {self.k}], got {kk}")
        req = _Request(np.ascontiguousarray(v), kk, threading.Event())
        t0 = time.monotonic()
        self._queue.put(req)
        # Bounded waits, re-checking liveness: close() may set _stop and
        # drain the queue between the _stop check above and the put — the
        # worker would then never answer this request (ADVICE r3).
        while not req.done.wait(timeout=0.1):
            if self._stop.is_set() and not self._worker.is_alive():
                raise RuntimeError("service closed")
        if req.error is not None:
            raise req.error
        with self._lock:
            self._counts["requests"] += 1
            self._latencies.append((time.monotonic() - t0) * 1e3)
        return req.scores, req.indices

    def match_names(self, indices) -> np.ndarray:
        if self.names is None:
            return np.asarray(indices)
        return self.names[np.asarray(indices)]

    def stats(self) -> dict:
        with self._lock:
            lat = sorted(self._latencies)
            counts = dict(self._counts)
            buckets = sorted(self._runs)
        out = {
            "engine": self.engine,
            "shards": (None if self._mesh is None
                       else int(self._mesh.shape[self._mesh_axis])),
            "gallery_size": self.n_gallery,
            "dim": self.dim,
            "k": self.k,
            "max_batch": self.max_batch,
            "uptime_s": round(time.monotonic() - self._t0, 3),
            "compiled_buckets": buckets,
            **{key: counts.get(key, 0)
               for key in ("requests", "queries", "engine_calls",
                           "coalesced_batches")},
        }
        if lat:
            out["latency_ms"] = {
                "mean": round(sum(lat) / len(lat), 3),
                "p50": round(lat[len(lat) // 2], 3),
                "p99": round(lat[min(len(lat) - 1, int(len(lat) * 0.99))], 3),
            }
        return out

    def close(self):
        self._stop.set()
        self._queue.put(None)
        self._worker.join(timeout=10)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ------------------------------------------------------------ loading

    @classmethod
    def from_npz(cls, path: str, **kw) -> "SearchService":
        """Build a service from a ``rir-extract`` index (.npz with either
        ``vecs`` or prequantized ``vecs_int8`` + ``scales``)."""
        data = np.load(path, allow_pickle=False)
        names = data["names"] if "names" in data else None
        if "vecs_int8" in data:
            engine = kw.pop("engine", None) or "int8"
            if engine == "int8":
                return cls(vecs_int8=data["vecs_int8"], scales=data["scales"],
                           names=names, engine=engine, **kw)
            gallery = (data["vecs_int8"].astype(np.float32)
                       * data["scales"][:, None])
            return cls(gallery, names=names, engine=engine, **kw)
        if "vecs" not in data:
            raise ValueError(f"{path} has neither 'vecs' nor 'vecs_int8' "
                             f"(keys: {sorted(data.keys())})")
        return cls(data["vecs"], names=names, **kw)


class ImageExtractor:
    """Image -> L2-normalized descriptor for the /search/image endpoint.

    Wraps the evaluation stack's model loading + bucketed masked
    extraction (evaluation/driver._make_extract_fn + index.extract
    .extract_vectors) behind a callable usable from request handlers.
    Thread-safe: extraction calls are serialized on a lock (they share
    one device anyway).
    """

    def __init__(self, model: str, checkpoint: str | None = None,
                 imsize: int = 1024, multiscale: bool = False,
                 batch_size: int = 8):
        from research_image_retrieval_tpu.evaluation.driver import (
            _load_model,
            _make_extract_fn,
        )
        from research_image_retrieval_tpu.utils.config import EvalConfig

        cfg = EvalConfig(model=model, checkpoint=checkpoint, imsize=imsize)
        net, variables = _load_model(cfg)
        self._extract, self._bucket, self._multiple = _make_extract_fn(
            net, variables)
        self.model = model
        self.imsize = imsize
        self.scales = (1.0, 2 ** -0.5, 0.5) if multiscale else (1.0,)
        self.batch_size = batch_size
        self._lock = threading.Lock()
        if self._bucket is not None:
            from research_image_retrieval_tpu.data.transforms import (
                IMAGENET_MEAN,
                IMAGENET_STD,
            )

            self._norm = (IMAGENET_MEAN, IMAGENET_STD)
        else:
            self._norm = None

    def __call__(self, images) -> np.ndarray:
        """[H, W, 3] uint8 RGB images (list) -> [n, D] fp32 descriptors."""
        from research_image_retrieval_tpu.data.transforms import (
            imthumbnail,
            normalize,
        )
        from research_image_retrieval_tpu.index import extract_vectors

        prepped = []
        dev = self._bucket is not None
        for img in images:
            img = np.asarray(img)
            if self.imsize:
                img = imthumbnail(img, self.imsize)
            if dev:  # fused on-device normalization path
                prepped.append(np.ascontiguousarray(img, np.uint8))
            else:
                prepped.append(normalize(np.asarray(img, np.float32) / 255.0))
        with self._lock:
            vecs = extract_vectors(
                self._extract, prepped, scales=self.scales,
                bucket=self._bucket, batch_size=self.batch_size,
                extent_multiple=self._multiple, device_scales=dev,
                input_norm=self._norm,
            )
        return np.asarray(vecs, np.float32)
