from image_caption_tpu.decode.engine import (  # noqa: F401
    greedy_decode,
    sample_decode,
    beam_search_decode,
    sequence_lengths,
)
