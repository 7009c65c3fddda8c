"""Smoke test: seven numbered checks mirroring /root/reference/scripts/test_model.py
(:15-153): vocab load, model build + param counts, forward, loss+backward, greedy
generate + id->word decode, data-loader batch, one optimizer step.

Runs with a tiny backbone so it completes in seconds on CPU; pass --full for the
full-size model.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-dir", default="/root/reference/data")
    parser.add_argument("--full", action="store_true", help="full-size model")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()
    if args.cpu:
        from image_caption_tpu.utils.platform import force_cpu

        force_cpu()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from image_caption_tpu.data.dataset import BatchLoader, CaptionDataset
    from image_caption_tpu.data.transforms import eval_preprocess
    from image_caption_tpu.data.vocab import Vocab
    from image_caption_tpu.models.runtime import build_model
    from image_caption_tpu.train import steps as S
    from image_caption_tpu.train.optim import make_optimizer

    print("=" * 60)
    print("image_caption_tpu smoke test")
    print("=" * 60)

    # 1. vocab
    vocab = Vocab.load(os.path.join(args.data_dir, "vocab.json"))
    print(f"[1/7] vocab loaded: {len(vocab)} words "
          f"(pad={vocab.pad_id} unk={vocab.unk_id} start={vocab.start_id} end={vocab.end_id}) ✓")

    # 2. model build
    config = {
        "model_type": "grid_transformer", "max_len": 52, "pretrained_cnn": False,
    }
    if not args.full:
        config.update(d_model=64, nhead=4, num_decoder_layers=2, num_encoder_layers=1,
                      dim_feedforward=128, resnet_stages=(1, 1, 1, 1))
    model = build_model(len(vocab), config, load_pretrained_backbone=False)
    print(f"[2/7] model built: {model.num_params() / 1e6:.2f}M params ✓")

    # 3. forward
    rng = np.random.default_rng(0)
    images = rng.normal(size=(2, 224, 224, 3)).astype(np.float32)
    captions = np.array([vocab.pad_to(vocab.encode("the lower clothing is of long length ."), 52)] * 2, dtype=np.int32)
    lengths = np.array([10, 10], dtype=np.int32)
    logits = model(images, captions, lengths)
    assert logits.shape == (2, 51, len(vocab))
    print(f"[3/7] forward: logits {logits.shape} ✓")

    # 4. loss + grad
    from image_caption_tpu.train.losses import cross_entropy_loss

    def loss_fn(params):
        variables = {"params": params, "batch_stats": model.variables.get("batch_stats", {})}
        lg = model.module.apply(variables, jnp.asarray(images), jnp.asarray(captions), jnp.asarray(lengths))
        return cross_entropy_loss(lg, jnp.asarray(captions)[:, 1:], pad_id=vocab.pad_id)

    loss, grads = jax.value_and_grad(loss_fn)(model.variables["params"])
    gnorm = float(jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in jax.tree_util.tree_leaves(grads))))
    assert np.isfinite(float(loss)) and np.isfinite(gnorm)
    print(f"[4/7] loss {float(loss):.4f}, grad norm {gnorm:.4f} ✓")

    # 5. greedy generate + decode
    tokens = np.asarray(model.generate(images, vocab.start_id, vocab.end_id, max_len=20))
    words = vocab.decode_to_text(tokens[0])
    print(f"[5/7] greedy generate: {tokens.shape}, caption: {words!r} ✓")

    # 6. data loader batch
    ds = CaptionDataset(os.path.join(args.data_dir, "val_data.json"), vocab=vocab, split="val")
    batch = next(iter(BatchLoader(ds, batch_size=4)))
    assert batch["image"].shape == (4, 256, 256, 3)
    imgs = np.asarray(eval_preprocess(batch["image"]))
    print(f"[6/7] loader batch: image {batch['image'].shape} -> {imgs.shape}, caption {batch['caption'].shape} ✓")

    # 7. one optimizer step
    tx = make_optimizer(1e-4, clip_norm=5.0)
    step_fn = S.make_train_step(model.module, tx, loss_kind="ce", pad_id=vocab.pad_id, augment="baseline")
    state = S.create_train_state(model.variables, tx)
    state, metrics = step_fn(state, {k: jnp.asarray(v) for k, v in batch.items()}, jax.random.PRNGKey(0))
    assert int(state.step) == 1 and np.isfinite(metrics["loss"])
    print(f"[7/7] optimizer step: loss {float(metrics['loss']):.4f}, step {int(state.step)} ✓")

    print("\nall checks passed ✓")


if __name__ == "__main__":
    main()
