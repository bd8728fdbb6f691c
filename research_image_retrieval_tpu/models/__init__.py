"""Model zoo: backbones, heads, and retrieval models with a dual API.

Every model preserves the reference's behavioral contract
(reference: networks/spca.py:54-95 and models/wrappers.py):

  apply_train(variables, images, labels)  -> (loss, logits, aux)
  apply_extract(variables, images)        -> L2-normalized descriptor

so trainers and the extraction/eval stack are model-agnostic.
"""

from research_image_retrieval_tpu.models.backbone import (
    ResNet,
    convert_torch_resnet,
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

__all__ = [
    "ResNet",
    "convert_torch_resnet",
    "RESNET_STAGE_DEPTHS",
    "MODEL_REGISTRY",
    "get_model",
    "list_available_models",
    "get_model_info",
    "register_model",
]
