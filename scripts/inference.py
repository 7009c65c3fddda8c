"""Caption a single image — the argparse CLI.

TPU-native counterpart of /root/reference/scripts/inference.py (:104-144):
``--image --model --vocab``; the model is rebuilt from the config embedded in the
checkpoint (:20-32).  Accepts both our ``.ckpt`` checkpoints and reference
``.pth`` files (ported on the fly via utils/port_torch.py).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_model(model_path: str, vocab_size: int):
    """Checkpoint -> (Captioner, config). Reference load_model (:14-39)."""
    from image_caption_tpu.models.runtime import Captioner, build_module
    from image_caption_tpu.utils.checkpoint import load_checkpoint, restore_into

    if model_path.endswith(".pth"):
        from image_caption_tpu.utils.port_torch import load_reference_checkpoint
        from image_caption_tpu.utils.precision import bf16_inference_variables

        cap, config, _ = load_reference_checkpoint(model_path)
        cap.variables = bf16_inference_variables(cap.variables)
        return cap, config
    ck = load_checkpoint(model_path)
    config = ck.get("config", {})
    module = build_module(vocab_size, config)
    import jax
    import jax.numpy as jnp

    rng = jax.random.PRNGKey(0)
    template = module.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 224, 224, 3)), jnp.zeros((1, 4), jnp.int32), jnp.array([4], jnp.int32),
    )
    variables = {
        "params": restore_into(template["params"], ck["params"]),
        "batch_stats": restore_into(template.get("batch_stats", {}), ck.get("batch_stats", {}))
        if ck.get("batch_stats") else template.get("batch_stats", {}),
    }
    # Inference-only handle: pre-cast the bf16-consumed params (bit-identical
    # tokens, half the per-decode-step weight traffic — utils/precision.py).
    from image_caption_tpu.utils.precision import bf16_inference_variables

    variables = bf16_inference_variables(variables)
    return Captioner(module, variables, config), config


def preprocess_image(image_path: str, model_type: str) -> np.ndarray:
    """vit: Resize(256)+CenterCrop(224); grid: direct Resize((224,224)) — the two
    reference pipelines differ (inference_vit_transformer.py:75-80 vs
    inference_grid_transformer.py:43-49)."""
    from image_caption_tpu.data.dataset import _load_image_canvas
    from image_caption_tpu.data.transforms import eval_preprocess, normalize_images, resize_direct

    if model_type == "grid_transformer":
        from PIL import Image

        with Image.open(image_path) as im:
            arr = np.asarray(im.convert("RGB").resize((224, 224), Image.BILINEAR), dtype=np.uint8)
        return np.asarray(normalize_images(arr[None]))
    canvas = _load_image_canvas(image_path, strict=True)
    return np.asarray(eval_preprocess(canvas[None]))


def generate_caption(model, image: np.ndarray, vocab, max_len: int = 50, method: str = "greedy", beam_size: int = 5) -> str:
    tokens = model.generate(image, vocab.start_id, vocab.end_id, max_len=max_len, method=method, beam_size=beam_size)
    return vocab.decode_to_text(np.asarray(tokens)[0])


def main():
    parser = argparse.ArgumentParser(description="Image caption inference")
    parser.add_argument("--image", required=True, help="input image path")
    parser.add_argument("--model", required=True, help="checkpoint (.ckpt or reference .pth)")
    parser.add_argument("--vocab", default="data/vocab.json", help="vocab.json path")
    parser.add_argument("--method", default="greedy", choices=["greedy", "beam_search"])
    parser.add_argument("--beam-size", type=int, default=5)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()
    if args.cpu:
        from image_caption_tpu.utils.platform import force_cpu

        force_cpu()

    from image_caption_tpu.data.vocab import Vocab

    vocab = Vocab.load(args.vocab)
    model, config = load_model(args.model, len(vocab))
    image = preprocess_image(args.image, config.get("model_type", "vit_transformer"))
    caption = generate_caption(model, image, vocab, max_len=config.get("max_len", 52), method=args.method, beam_size=args.beam_size)
    print(f"image:   {args.image}")
    print(f"caption: {caption}")


if __name__ == "__main__":
    main()
