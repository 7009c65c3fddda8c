"""Host-side dataset + batched loader.

Design: the host does the minimum — decode JPEG, resize shorter side to 256,
center-crop to a static 256x256 uint8 canvas — and ships one contiguous uint8
batch to the device; all randomized augmentation runs on-device (see
``image_caption_tpu.data.transforms``). A background prefetch thread overlaps
decode with TPU compute.

The constructor unifies the reference's three divergent dataset APIs
(utils/deepfashion_dataset.py:145 ``(dataset_path, vocab_path, split, max_len,
transform)``; the optimized scripts' ``(data_dir=, split=, vocab=)`` kwargs which
crash as committed, train_vit_transformer_optimized.py:159-178; and the SCST
scripts' nonexistent ``DeepFashionCaptionDataset(data_file, image_dir, vocab, ...)``,
train_vit_transformer_scst_optimized.py:177-199) into one working surface.

When image files are absent (only the JSON manifests are mirrored), the loader
deterministically synthesizes an image from the path hash so every pipeline stage
stays executable end-to-end.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Dict, Iterator, Optional, Union

import numpy as np

from image_caption_tpu.data.vocab import Vocab

CANVAS = 256

# DCT-domain JPEG downscale during decode (see _load_image_canvas); opt out
# with ICT_NO_JPEG_DRAFT=1 to decode at full resolution.
_JPEG_DRAFT = os.environ.get("ICT_NO_JPEG_DRAFT", "0") != "1"


def _load_image_canvas(path: str, canvas: int = CANVAS, strict: bool = False) -> np.ndarray:
    """JPEG -> uint8 [canvas, canvas, 3]: resize shorter side to canvas, center-crop.

    Equivalent to torchvision ``Resize(256)`` followed by any center/random crop
    <= 256 (the crop itself happens on device).  Falls back to a deterministic
    synthetic image keyed by the path hash when the file is missing — loader-only
    behavior; pass ``strict=True`` (inference does) to raise instead, so a
    typo'd path errors rather than silently captioning noise.
    """
    if strict and not os.path.exists(path):
        raise FileNotFoundError(path)
    try:
        from PIL import Image

        with Image.open(path) as im:
            if _JPEG_DRAFT and (im.format or "").upper() == "JPEG":
                # libjpeg DCT-domain downscale: decode directly at 1/2, 1/4 or
                # 1/8 scale (never below the requested size), so a DeepFashion
                # 750x1101 JPEG is decoded at 375x551 instead of full size —
                # measured ~2x the single-core img/s (scripts/bench_host_pipeline.py
                # --ab draft).  The subsequent BILINEAR resize to the canvas
                # absorbs the box-filtered intermediate; pixel deltas vs the
                # full decode are a fraction of the on-device augmentation
                # noise (tests/test_dataset.py::test_jpeg_draft_decode).
                # ICT_NO_JPEG_DRAFT=1 restores the full-resolution decode.
                im.draft("RGB", (canvas, canvas))
            im = im.convert("RGB")
            w, h = im.size
            if w <= h:
                nw, nh = canvas, max(canvas, round(h * canvas / w))
            else:
                nw, nh = max(canvas, round(w * canvas / h)), canvas
            im = im.resize((nw, nh), Image.BILINEAR)
            left, top = (nw - canvas) // 2, (nh - canvas) // 2
            im = im.crop((left, top, left + canvas, top + canvas))
            return np.asarray(im, dtype=np.uint8)
    except (FileNotFoundError, OSError):
        seed = int.from_bytes(hashlib.sha256(path.encode()).digest()[:8], "little")
        rng = np.random.Generator(np.random.PCG64(seed))
        return rng.integers(0, 256, size=(canvas, canvas, 3), dtype=np.uint8)


class CaptionDataset:
    """Image-caption pairs from a ``{"IMAGES": [...], "CAPTIONS": [[ids]]}`` manifest.

    Unified constructor::

        CaptionDataset("data/train_data.json", vocab="data/vocab.json")   # path-based
        CaptionDataset(data_dir="data", split="train", vocab=vocab_obj)   # dir+split
        CaptionDataset(manifest=dict_, vocab=vocab_dict)                  # injected

    ``__getitem__`` returns ``(image uint8 [256,256,3], caption int32 [max_len+2],
    caplen int32)`` — the same triple as the reference Dataset
    (deepfashion_dataset.py:174-197) with the image still on the 256-canvas.
    """

    def __init__(
        self,
        dataset_path: Optional[str] = None,
        vocab: Union[str, Dict[str, int], Vocab, None] = None,
        split: Optional[str] = None,
        max_len: int = 50,
        data_dir: Optional[str] = None,
        image_dir: Optional[str] = None,
        manifest: Optional[Dict] = None,
    ):
        if manifest is None:
            if dataset_path is None:
                if data_dir is None or split is None:
                    raise ValueError("need dataset_path, or data_dir+split, or manifest")
                dataset_path = os.path.join(data_dir, f"{split}_data.json")
            with open(dataset_path, "r", encoding="utf-8") as f:
                manifest = json.load(f)
        self.split = split
        self.max_len = max_len
        self.image_dir = image_dir
        if vocab is None and data_dir is not None:
            vocab = os.path.join(data_dir, "vocab.json")
        if isinstance(vocab, str):
            vocab = Vocab.load(vocab)
        elif isinstance(vocab, dict):
            vocab = Vocab(vocab)
        if vocab is None:
            raise ValueError("a vocab (path, dict, or Vocab) is required")
        self.vocab: Vocab = vocab
        self.images = list(manifest["IMAGES"])
        self.captions = list(manifest["CAPTIONS"])
        assert len(self.images) == len(self.captions)

    def __len__(self) -> int:
        return len(self.captions)

    def image_path(self, i: int) -> str:
        p = self.images[i]
        if self.image_dir is not None and not os.path.isabs(p) and not os.path.exists(p):
            p = os.path.join(self.image_dir, os.path.basename(p))
        return p

    def __getitem__(self, i: int):
        img = _load_image_canvas(self.image_path(i))
        ids = self.captions[i]
        caplen = len(ids)
        pad_len = self.max_len + 2
        cap = np.full((pad_len,), self.vocab.pad_id, dtype=np.int32)
        cap[: min(caplen, pad_len)] = np.asarray(ids[:pad_len], dtype=np.int32)
        return img, cap, np.int32(min(caplen, pad_len))


class BatchLoader:
    """Epoch iterator over fixed-shape numpy batches with parallel prefetch.

    Yields ``{"image": uint8 [B,256,256,3], "caption": int32 [B,L], "length":
    int32 [B]}``.  Shuffling is seeded per-epoch (``seed + epoch``) for exact
    reproducibility and deterministic resume.

    ``num_workers`` decode threads build batches concurrently (PIL releases
    the GIL inside JPEG decode/resize, so threads scale on multi-core hosts —
    the analog of the reference DataLoader's worker processes,
    deepfashion_dataset.py:273-297); results are yielded strictly in order,
    with up to ``prefetch + num_workers`` batches in flight.
    """

    def __init__(
        self,
        dataset: CaptionDataset,
        batch_size: int = 32,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 42,
        prefetch: int = 2,
        num_workers: int = 4,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.num_workers = max(1, num_workers)
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.Generator(np.random.PCG64(self.seed + self.epoch))
            rng.shuffle(idx)
        return idx

    def _make_batch(self, idx_chunk: np.ndarray) -> Dict[str, np.ndarray]:
        imgs, caps, lens = [], [], []
        for i in idx_chunk:
            im, cap, ln = self.dataset[int(i)]
            imgs.append(im)
            caps.append(cap)
            lens.append(ln)
        return {
            "image": np.stack(imgs),
            "caption": np.stack(caps),
            "length": np.asarray(lens, dtype=np.int32),
        }

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        idx = self._batch_indices()
        n = len(self)
        chunks = iter([idx[i * self.batch_size : (i + 1) * self.batch_size] for i in range(n)])
        self.epoch += 1

        from collections import deque
        from concurrent.futures import ThreadPoolExecutor
        from itertools import islice

        ex = ThreadPoolExecutor(max_workers=self.num_workers)
        try:
            window = self.prefetch + self.num_workers
            pending = deque(ex.submit(self._make_batch, c) for c in islice(chunks, window))
            while pending:
                batch = pending.popleft().result()
                nxt = next(chunks, None)
                if nxt is not None:
                    pending.append(ex.submit(self._make_batch, nxt))
                yield batch
        finally:
            # A consumer that abandons the epoch mid-way (``break`` in the
            # train loop) closes this generator; cancel queued decodes instead
            # of blocking on prefetch+num_workers in-flight batches finishing
            # (a real stall at every epoch boundary on a one-core host).
            ex.shutdown(wait=False, cancel_futures=True)


def create_data_loaders(
    data_dir: str = "data",
    vocab_path: str = "data/vocab.json",
    batch_size: int = 32,
    num_workers: int = 4,  # decode threads per loader (reference DataLoader workers)
    image_size: int = 224,  # crop happens on device; accepted for parity
    max_len: int = 50,
    seed: int = 42,
    drop_last_train: bool = True,
):
    """Train/val/test loaders with the reference's surface
    (deepfashion_dataset.py:231-304; ``drop_last`` train-only as in the optimized
    scripts, train_vit_transformer_optimized.py:180-187)."""
    del image_size
    vocab = Vocab.load(vocab_path)
    loaders = []
    for split in ("train", "val", "test"):
        ds = CaptionDataset(
            os.path.join(data_dir, f"{split}_data.json"), vocab=vocab, split=split, max_len=max_len
        )
        loaders.append(
            BatchLoader(
                ds,
                batch_size=batch_size,
                shuffle=(split == "train"),
                drop_last=(split == "train" and drop_last_train),
                seed=seed,
                num_workers=num_workers,
            )
        )
    return tuple(loaders)
