from image_caption_tpu.data.vocab import Vocab, tokenize_caption  # noqa: F401
from image_caption_tpu.data.prepare import create_deepfashion_dataset  # noqa: F401
from image_caption_tpu.data.dataset import (  # noqa: F401
    BatchLoader,
    CaptionDataset,
    create_data_loaders,
)
from image_caption_tpu.data.transforms import (  # noqa: F401
    IMAGENET_MEAN,
    IMAGENET_STD,
    normalize_images,
    train_augment,
    eval_preprocess,
)
