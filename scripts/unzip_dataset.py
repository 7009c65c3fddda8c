"""Extract data/images.zip (reference utils/unzip_dataset.py counterpart)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from image_caption_tpu.data.unzip import unzip_dataset

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--zip", default="data/images.zip")
    p.add_argument("--out", default=None)
    args = p.parse_args()
    unzip_dataset(args.zip, args.out)
