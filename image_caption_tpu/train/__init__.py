from image_caption_tpu.train.losses import (  # noqa: F401
    cross_entropy_loss,
    label_smoothing_loss,
    focal_loss,
    r_drop_kl,
)
from image_caption_tpu.train.schedules import (  # noqa: F401
    warmup_cosine_schedule,
    transformer_schedule,
    ReduceLROnPlateau,
)
from image_caption_tpu.train.optim import (  # noqa: F401
    EMA,
    EarlyStopping,
    make_optimizer,
    global_norm_clip,
)
