"""Dataset preparation: vocab build + seeded train/val/test split.

Reproduces the reference pipeline (utils/prepare_data.py:12-142) bit-for-bit:
- tokenize captions (lowercase, space-pad ./,, whitespace split)
- drop captions longer than ``max_len`` tokens
- vocab from words with count >= ``min_word_count`` (ids 1..N in first-seen order,
  then <pad>=0, <unk>, <start>, <end>)
- ``random.seed(42)`` shuffle, 80/10/10 split
- write ``{split}_data.json`` as ``{"IMAGES": [...], "CAPTIONS": [[ids...], ...]}``

Torch-free and torch-unneeded by design.
"""

from __future__ import annotations

import json
import os
import random
from typing import Dict, Optional

from image_caption_tpu.data.vocab import Vocab, tokenize_caption


def create_deepfashion_dataset(
    data_dir: str = "data",
    min_word_count: int = 5,
    max_len: int = 50,
    train_ratio: float = 0.8,
    val_ratio: float = 0.1,
    test_ratio: float = 0.1,
    seed: int = 42,
    require_images: bool = True,
    captions: Optional[Dict[str, str]] = None,
) -> Vocab:
    """Build vocab + splits from ``{data_dir}/captions.json``.

    ``captions`` may be passed directly (``{filename: caption}``) to skip file IO;
    ``require_images=False`` keeps entries whose image file is missing (useful when
    only the manifests are mirrored).
    """
    image_folder = os.path.join(data_dir, "images")
    if captions is None:
        with open(os.path.join(data_dir, "captions.json"), "r", encoding="utf-8") as f:
            captions = json.load(f)

    records = []
    missing = 0
    for img_filename, caption_text in captions.items():
        img_path = os.path.join(image_folder, img_filename)
        if require_images and not os.path.exists(img_path):
            missing += 1
            continue
        tokens = tokenize_caption(caption_text)
        if len(tokens) <= max_len:
            records.append({"image_path": img_path, "tokens": tokens})
    if missing:
        print(f"warning: {missing} images missing, skipped")
    print(f"valid pairs: {len(records)}")

    vocab = Vocab.build((r["tokens"] for r in records), min_word_count=min_word_count)
    vocab.save(os.path.join(data_dir, "vocab.json"))
    print(f"vocab size: {len(vocab)}")

    rng = random.Random(seed)
    rng.shuffle(records)

    n = len(records)
    n_train = int(n * train_ratio)
    n_val = int(n * val_ratio)
    splits = {
        "train": records[:n_train],
        "val": records[n_train : n_train + n_val],
        "test": records[n_train + n_val :],
    }

    for split_name, split_records in splits.items():
        data_dict = {
            "IMAGES": [r["image_path"] for r in split_records],
            "CAPTIONS": [vocab.encode(r["tokens"]) for r in split_records],
        }
        out = os.path.join(data_dir, f"{split_name}_data.json")
        with open(out, "w", encoding="utf-8") as f:
            json.dump(data_dict, f, ensure_ascii=False)
        lens = [len(c) for c in data_dict["CAPTIONS"]] or [0]
        print(
            f"{split_name}: {len(split_records)} samples, caption len "
            f"avg {sum(lens)/max(len(lens),1):.2f} max {max(lens)} min {min(lens)}"
        )
    return vocab
