"""Production serving: resident search service + HTTP front end.

The reference's only "serving" is the AdaptiveHybrid prototype's in-RAM
gallery loop (manus/7_AdaptiveHybridModel/modified/
adaptive_hybrid_retrieval_complete.py:347-433: python list + per-call
matmul + torch.topk).  This package is the production counterpart, built
TPU-first: the gallery is device-resident once, the streaming engines of
ops/topk_stream.py are jitted per query-batch bucket (powers of two —
a bounded number of compiled programs), and concurrent requests are
coalesced into single engine calls by a micro-batching worker.
"""

from research_image_retrieval_tpu.serve.service import (
    ImageExtractor,
    SearchService,
)
from research_image_retrieval_tpu.serve.http import make_http_server

__all__ = ["SearchService", "ImageExtractor", "make_http_server"]
