"""TPU-native image-retrieval framework.

A brand-new JAX / XLA / Pallas / pjit framework with the capabilities of the
reference research benchmark ``Mak-GIBA/research_image_retrieval``: training
global-descriptor retrieval models (GeM, SpCa, Token, DOLG, SOLAR, DELG,
ULTRON, ...) on GLDv2-clean with margin-based classification losses
(ArcFace / MadaCos), multi-scale descriptor extraction, ICI-sharded
similarity search, query expansion and reranking, and Revisited
Oxford/Paris protocol evaluation.

Layering (each layer only depends on the ones above it):

    ops         pure-function descriptor ops and Pallas kernels
    models      backbones + model zoo (dual train/extract API) + registry
    data        input pipelines (GLDv2, Revisited test sets, synthetic)
    train       pjit train loop, schedules, checkpointing, metrics
    parallel    mesh/sharding helpers and sharded classifier
    index       extraction, search, query expansion, gallery serving
    evaluation  Revisited-protocol mAP (the fidelity gate)
"""

__version__ = "0.1.0"
