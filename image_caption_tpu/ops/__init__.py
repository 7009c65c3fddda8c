from image_caption_tpu.ops.attention import mha_attention  # noqa: F401
