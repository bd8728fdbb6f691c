"""Model zoo: backbones, heads, and retrieval models with a dual API.

Every model preserves the reference's behavioral contract
(reference: networks/spca.py:54-95 and models/wrappers.py):

  model.apply(variables, images, labels, train=...) -> (loss, logits)
  model.apply(variables, images, method="extract")  -> L2-normalized descriptor

so trainers and the extraction/eval stack are model-agnostic.
"""

from research_image_retrieval_tpu.models.backbone import (
    ResNet,
    convert_torch_resnet,
    convert_features_resnet,
    convert_pycls_resnet,
    RESNET_STAGE_DEPTHS,
)
from research_image_retrieval_tpu.models.registry import (
    MODEL_REGISTRY,
    get_model,
    list_available_models,
    get_model_info,
    register_model,
)

# import model modules for their registration side effects
from research_image_retrieval_tpu.models.gem import GeMModel  # noqa: E402
from research_image_retrieval_tpu.models.token import TokenModel  # noqa: E402
from research_image_retrieval_tpu.models.dolg import DOLGModel  # noqa: E402
from research_image_retrieval_tpu.models.solar import SOLARModel  # noqa: E402
from research_image_retrieval_tpu.models.delg import DELGModel  # noqa: E402
from research_image_retrieval_tpu.models.how import HOWModel  # noqa: E402
from research_image_retrieval_tpu.models.sosnet import SoSNetModel  # noqa: E402
from research_image_retrieval_tpu.models.spoc import SpoCModel  # noqa: E402
from research_image_retrieval_tpu.models.senet_g2 import SENetG2Model  # noqa: E402
from research_image_retrieval_tpu.models.spca import SpCaModel  # noqa: E402
from research_image_retrieval_tpu.models.ultron import ULTRONRetrievalModel  # noqa: E402
from research_image_retrieval_tpu.models.adaptive_hybrid import (  # noqa: E402
    AdaptiveHybridModel,
    QAFF,
)
from research_image_retrieval_tpu.models.vit import ViTGlobalModel  # noqa: E402
from research_image_retrieval_tpu.models.clip import CLIPGlobalModel  # noqa: E402
from research_image_retrieval_tpu.models.clip_convert import (  # noqa: E402
    build_clip_from_torch,
    convert_torch_clip,
)
from research_image_retrieval_tpu.models.iris import IRISModel  # noqa: E402
from research_image_retrieval_tpu.models.sparse import SparseRetrievalModel  # noqa: E402
from research_image_retrieval_tpu.models.hamlet import HAMLETModel  # noqa: E402
from research_image_retrieval_tpu.models.spectrum import SPECTRUMModel  # noqa: E402
from research_image_retrieval_tpu.models.cvnet import CVNetRerank  # noqa: E402

__all__ = [
    "ResNet",
    "convert_torch_resnet",
    "convert_features_resnet",
    "convert_pycls_resnet",
    "RESNET_STAGE_DEPTHS",
    "MODEL_REGISTRY",
    "get_model",
    "list_available_models",
    "get_model_info",
    "register_model",
]
