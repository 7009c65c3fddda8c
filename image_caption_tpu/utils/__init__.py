from image_caption_tpu.utils.checkpoint import save_checkpoint, load_checkpoint  # noqa: F401
from image_caption_tpu.utils.logging import AverageMeter, MetricsHistory, Logger  # noqa: F401
