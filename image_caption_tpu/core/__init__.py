from image_caption_tpu.core.config import (  # noqa: F401
    default_vit_config,
    default_grid_config,
    get_optimized_config,
)
from image_caption_tpu.core.dtypes import DTypePolicy, default_policy  # noqa: F401
