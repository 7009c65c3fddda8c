"""ViT-model inference demo: single-image captioning + visualization, batch
generation, greedy-vs-beam comparison, and full-test-set evaluation.

TPU-native counterpart of /root/reference/scripts/inference_vit_transformer.py
(:314-378 demo flow, :254-312 full test eval) — with the full-test loop batched
through the decode engine instead of per-image Python (:293-300).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MODEL_TYPE = "vit_transformer"
DEFAULT_CKPT = "checkpoints/vit_transformer/best_model.ckpt"
OUTPUT_PNG = "output_sample.png"


def visualize_prediction(image_path: str, caption: str, out_path: str = OUTPUT_PNG):
    """Save image + caption figure (reference :132-155)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from PIL import Image

        fig, ax = plt.subplots(figsize=(6, 7))
        with Image.open(image_path) as im:
            ax.imshow(im.convert("RGB"))
        ax.axis("off")
        ax.set_title(caption, wrap=True)
        fig.tight_layout()
        fig.savefig(out_path, dpi=100)
        plt.close(fig)
        print(f"saved visualization -> {out_path}")
    except Exception as e:
        print(f"visualization skipped ({e})")


def evaluate_full_test_set(model, vocab, data_dir: str, batch_size: int = 64, max_batches=None):
    """Batched greedy generation over the test split + COCO metrics
    (reference :254-312, but batched instead of per-image)."""
    from image_caption_tpu.data.dataset import BatchLoader, CaptionDataset
    from image_caption_tpu.data.transforms import eval_preprocess
    from image_caption_tpu.eval.evaluator import COCOScoreEvaluator

    ds = CaptionDataset(os.path.join(data_dir, "test_data.json"), vocab=vocab, split="test")
    loader = BatchLoader(ds, batch_size=batch_size)
    gts, res = {}, {}
    i = 0
    for bi, batch in enumerate(loader):
        if max_batches is not None and bi >= max_batches:
            break
        imgs = np.asarray(eval_preprocess(batch["image"]))
        toks = np.asarray(model.generate(imgs, vocab.start_id, vocab.end_id, max_len=52))
        for row, ref in zip(toks, batch["caption"]):
            res[i] = [vocab.decode_to_text(row)]
            gts[i] = [vocab.decode_to_text(ref)]
            i += 1
        print(f"  batch {bi + 1}/{len(loader)} ({i} images)", end="\r")
    print()
    scores = COCOScoreEvaluator(include_bleu=True).evaluate(gts, res)
    print(f"test-set scores over {i} images: {scores}")
    return scores


def batch_generate(model, vocab, image_paths, model_type=MODEL_TYPE, method="greedy"):
    """Caption a list of image files in one batched decode (reference :158-180
    generated per image; here the whole list is one device call)."""
    import numpy as np

    from image_caption_tpu.data.dataset import _load_image_canvas
    from image_caption_tpu.data.transforms import eval_preprocess

    canvases = np.stack([_load_image_canvas(p) for p in image_paths])
    imgs = np.asarray(eval_preprocess(canvases))
    toks = np.asarray(model.generate(imgs, vocab.start_id, vocab.end_id, max_len=52, method=method))
    return [vocab.decode_to_text(row) for row in toks]


def compare_random_val_samples(model, vocab, data_dir: str, n: int = 5, seed: int = 0):
    """Random val images: ground truth vs greedy vs beam (reference :183-251)."""
    import numpy as np

    from image_caption_tpu.data.dataset import CaptionDataset
    from image_caption_tpu.data.transforms import eval_preprocess

    ds = CaptionDataset(os.path.join(data_dir, "val_data.json"), vocab=vocab, split="val")
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(ds), size=min(n, len(ds)), replace=False)
    imgs, refs = [], []
    for i in idx:
        im, cap, _ = ds[int(i)]
        imgs.append(im)
        refs.append(vocab.decode_to_text(cap))
    imgs = np.asarray(eval_preprocess(np.stack(imgs)))
    greedy = np.asarray(model.generate(imgs, vocab.start_id, vocab.end_id, max_len=52))
    beam = np.asarray(
        model.generate(imgs, vocab.start_id, vocab.end_id, max_len=52, method="beam_search", beam_size=5)
    )
    for j, i in enumerate(idx):
        print(f"[val #{i}]")
        print(f"  GT:     {refs[j]}")
        print(f"  greedy: {vocab.decode_to_text(greedy[j])}")
        print(f"  beam:   {vocab.decode_to_text(beam[j])}")
    return idx


def main():
    parser = argparse.ArgumentParser(description="ViT+Transformer inference demo")
    parser.add_argument("--model", default=DEFAULT_CKPT)
    parser.add_argument("--vocab", default="data/vocab.json")
    parser.add_argument("--image", default="test.jpg")
    parser.add_argument("--data-dir", default="data")
    parser.add_argument("--full-eval", action="store_true", help="run full test-set evaluation")
    parser.add_argument("--compare-samples", type=int, default=0, help="compare N random val samples")
    parser.add_argument("--max-batches", type=int, default=None)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()
    if args.cpu:
        from image_caption_tpu.utils.platform import force_cpu

        force_cpu()

    from inference import generate_caption, load_model, preprocess_image

    from image_caption_tpu.data.vocab import Vocab

    vocab = Vocab.load(args.vocab)
    model, config = load_model(args.model, len(vocab))

    if os.path.exists(args.image):
        image = preprocess_image(args.image, MODEL_TYPE)
        greedy = generate_caption(model, image, vocab, method="greedy")
        beam = generate_caption(model, image, vocab, method="beam_search", beam_size=5)
        print(f"greedy: {greedy}")
        print(f"beam:   {beam}")
        visualize_prediction(args.image, greedy)

    if args.compare_samples:
        compare_random_val_samples(model, vocab, args.data_dir, n=args.compare_samples)

    if args.full_eval:
        evaluate_full_test_set(model, vocab, args.data_dir, max_batches=args.max_batches)


if __name__ == "__main__":
    main()
