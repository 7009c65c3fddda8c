from image_caption_tpu.models.captioner import (  # noqa: F401
    CaptioningModel,
    GridCaptioningModel,
    ViTCaptioningModel,
    lengths_to_padding_mask,
)
from image_caption_tpu.models.decoder import TransformerDecoder  # noqa: F401
from image_caption_tpu.models.encoders import (  # noqa: F401
    GridFeatureEncoder,
    VisionTransformerEncoder,
)
from image_caption_tpu.models.resnet import ResNet, resnet50, resnet101  # noqa: F401
from image_caption_tpu.models.runtime import Captioner, build_model, build_module  # noqa: F401
from image_caption_tpu.models.vit import ViT, vit_b_16  # noqa: F401
