"""Host data-pipeline benchmark: real-JPEG decode throughput through BatchLoader.

Generates a corpus of real JPEG files at DeepFashion-native resolution
(750x1101) once under /tmp, then measures loader throughput at various worker
counts.  Prints one JSON line per configuration.

    python scripts/bench_host_pipeline.py --images 512 --workers 1,4,8
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_corpus(root: str, n: int, w: int = 750, h: int = 1101) -> dict:
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        p = os.path.join(root, f"img_{i}.jpg")
        if not os.path.exists(p):
            # low-frequency content compresses/decodes like real photos do
            base = rng.integers(0, 255, size=(h // 8, w // 8, 3), dtype=np.uint8)
            img = Image.fromarray(base).resize((w, h), Image.BILINEAR)
            img.save(p, quality=85)
        paths.append(p)
    return {"IMAGES": paths, "CAPTIONS": [[107, 1, 2, 108]] * n}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--images", type=int, default=512)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--workers", default="1,4")
    ap.add_argument("--corpus", default="/tmp/ict_jpeg_corpus")
    ap.add_argument("--ab", default="", choices=["", "draft"],
                    help="'draft': A/B the DCT-domain JPEG downscale on/off per worker count")
    args = ap.parse_args()

    from image_caption_tpu.data import dataset as D

    manifest = build_corpus(args.corpus, args.images)
    vocab = {"<pad>": 0, "a": 1, "b": 2, "<unk>": 106, "<start>": 107, "<end>": 108}
    ds = D.CaptionDataset(manifest=manifest, vocab=vocab, max_len=50)

    variants = [True, False] if args.ab == "draft" else [D._JPEG_DRAFT]
    for nw in (int(x) for x in args.workers.split(",")):
        for draft in variants:
            D._JPEG_DRAFT = draft
            loader = D.BatchLoader(ds, batch_size=args.batch_size, num_workers=nw)
            next(iter(loader))  # warm page cache
            t0 = time.perf_counter()
            n = 0
            for batch in loader:
                n += batch["image"].shape[0]
            dt = time.perf_counter() - t0
            print(json.dumps({
                "num_workers": nw, "jpeg_draft": draft, "images": n,
                "imgs_per_sec": round(n / dt, 1),
                "ms_per_img": round(dt / n * 1e3, 3),
            }))


if __name__ == "__main__":
    main()
