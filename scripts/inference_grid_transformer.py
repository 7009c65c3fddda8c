"""Grid-model inference demo.

TPU-native counterpart of /root/reference/scripts/inference_grid_transformer.py:
direct 224x224 resize preprocessing (:43-49 — no center crop, unlike the vit
path), beam_size plumbing (:52-64), full-test eval (:95-132), output
``output_grid_sample.png`` (:168).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODEL_TYPE = "grid_transformer"
DEFAULT_CKPT = "checkpoints/grid_transformer/best_model.ckpt"
OUTPUT_PNG = "output_grid_sample.png"


def main():
    parser = argparse.ArgumentParser(description="Grid+Transformer inference demo")
    parser.add_argument("--model", default=DEFAULT_CKPT)
    parser.add_argument("--vocab", default="data/vocab.json")
    parser.add_argument("--image", default="test.jpg")
    parser.add_argument("--data-dir", default="data")
    parser.add_argument("--beam-size", type=int, default=5)
    parser.add_argument("--full-eval", action="store_true")
    parser.add_argument("--max-batches", type=int, default=None)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()
    if args.cpu:
        from image_caption_tpu.utils.platform import force_cpu

        force_cpu()

    from inference import generate_caption, load_model, preprocess_image
    from inference_vit_transformer import evaluate_full_test_set, visualize_prediction

    from image_caption_tpu.data.vocab import Vocab

    vocab = Vocab.load(args.vocab)
    model, config = load_model(args.model, len(vocab))

    if os.path.exists(args.image):
        image = preprocess_image(args.image, MODEL_TYPE)
        greedy = generate_caption(model, image, vocab, method="greedy")
        beam = generate_caption(model, image, vocab, method="beam_search", beam_size=args.beam_size)
        print(f"greedy: {greedy}")
        print(f"beam({args.beam_size}): {beam}")
        visualize_prediction(args.image, greedy, OUTPUT_PNG)

    if args.full_eval:
        evaluate_full_test_set(model, vocab, args.data_dir, max_batches=args.max_batches)


if __name__ == "__main__":
    main()
