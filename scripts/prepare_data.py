"""Build vocab + train/val/test manifests from data/captions.json.

TPU-native counterpart of /root/reference/utils/prepare_data.py (exact split
semantics: seed-42 shuffle, 80/10/10, min_word_count 5, max_len 50).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from image_caption_tpu.data.prepare import create_deepfashion_dataset

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", default="data")
    p.add_argument("--min-word-count", type=int, default=5)
    p.add_argument("--max-len", type=int, default=50)
    p.add_argument("--allow-missing-images", action="store_true")
    args = p.parse_args()
    create_deepfashion_dataset(
        data_dir=args.data_dir,
        min_word_count=args.min_word_count,
        max_len=args.max_len,
        require_images=not args.allow_missing_images,
    )
