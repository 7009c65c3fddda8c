from image_caption_tpu.eval.tokenizer import ptb_tokenize, ptb_tokenize_corpus  # noqa: F401
from image_caption_tpu.eval.cider import CiderD  # noqa: F401
from image_caption_tpu.eval.bleu import Bleu  # noqa: F401
from image_caption_tpu.eval.rouge import RougeL  # noqa: F401
from image_caption_tpu.eval.meteor import Meteor  # noqa: F401
from image_caption_tpu.eval.evaluator import COCOScoreEvaluator  # noqa: F401
