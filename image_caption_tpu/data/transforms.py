"""On-device image transforms (jit-compatible, NHWC, batched).

TPU-first replacement for the reference's torchvision transform stacks
(utils/deepfashion_dataset.py:203-228 and utils/optimizations.py:155-192): the host
loader only decodes JPEG and resizes to a fixed 256x256 uint8 canvas; everything
random (crop / flip / color jitter / erasing) runs on device inside the jitted train
step, keyed by a JAX PRNG, so augmentation is free on the TPU's VPU and the input
pipeline ships exactly one small uint8 tensor per batch over PCIe.

Static shapes everywhere: 256x256 in, 224x224 out.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

CANVAS = 256  # host-side canvas the loader produces
CROP = 224  # model input size


def normalize_images(x: jnp.ndarray) -> jnp.ndarray:
    """uint8/float [..., H, W, 3] -> ImageNet-normalized float32."""
    x = x.astype(jnp.float32) / 255.0 if x.dtype == jnp.uint8 else x.astype(jnp.float32)
    mean = jnp.asarray(IMAGENET_MEAN, dtype=jnp.float32)
    std = jnp.asarray(IMAGENET_STD, dtype=jnp.float32)
    return (x - mean) / std


def center_crop(x: jnp.ndarray, size: int = CROP) -> jnp.ndarray:
    h, w = x.shape[-3], x.shape[-2]
    top, left = (h - size) // 2, (w - size) // 2
    return x[..., top : top + size, left : left + size, :]


@jax.jit
def eval_preprocess(images: jnp.ndarray) -> jnp.ndarray:
    """Resize(256) [host] -> CenterCrop(224) -> normalize. NHWC float32 out."""
    return normalize_images(center_crop(images))


def _random_crop_one(img: jnp.ndarray, key: jax.Array, size: int) -> jnp.ndarray:
    h, w = img.shape[0], img.shape[1]
    kt, kl = jax.random.split(key)
    top = jax.random.randint(kt, (), 0, h - size + 1)
    left = jax.random.randint(kl, (), 0, w - size + 1)
    return jax.lax.dynamic_slice(img, (top, left, 0), (size, size, img.shape[2]))


@functools.partial(jax.jit, static_argnames=("size",))
def train_augment(key: jax.Array, images: jnp.ndarray, size: int = CROP) -> jnp.ndarray:
    """Baseline train pipeline: RandomCrop(224) + RandomHorizontalFlip + normalize.

    Mirrors get_transform('train') (deepfashion_dataset.py:214-221).
    """
    b = images.shape[0]
    k_crop, k_flip = jax.random.split(key)
    crop_keys = jax.random.split(k_crop, b)
    imgs = jax.vmap(_random_crop_one, in_axes=(0, 0, None))(images, crop_keys, size)
    flip = jax.random.bernoulli(k_flip, 0.5, (b,))
    imgs = jnp.where(flip[:, None, None, None], imgs[:, :, ::-1, :], imgs)
    return normalize_images(imgs)


def _rrc_one(img: jnp.ndarray, key: jax.Array, size: int, scale: Tuple[float, float]) -> jnp.ndarray:
    """RandomResizedCrop via scale_and_translate: sample an area fraction, crop, resize."""
    h, w = img.shape[0], img.shape[1]
    k_s, k_t, k_l = jax.random.split(key, 3)
    area_frac = jax.random.uniform(k_s, (), minval=scale[0], maxval=scale[1])
    side = jnp.sqrt(area_frac)  # square crop; aspect jitter omitted for shape stasis
    ch = side * h
    cw = side * w
    top = jax.random.uniform(k_t, (), maxval=1.0) * (h - ch)
    left = jax.random.uniform(k_l, (), maxval=1.0) * (w - cw)
    # Map the [top, top+ch) x [left, left+cw) window onto a size x size output.
    sy = size / ch
    sx = size / cw
    out = jax.image.scale_and_translate(
        img.astype(jnp.float32),
        shape=(size, size, img.shape[2]),
        spatial_dims=(0, 1),
        scale=jnp.stack([sy, sx]),
        translation=jnp.stack([-top * sy, -left * sx]),
        method="bilinear",
    )
    return out


def _color_jitter(img: jnp.ndarray, key: jax.Array, brightness=0.2, contrast=0.2, saturation=0.2) -> jnp.ndarray:
    kb, kc, ks = jax.random.split(key, 3)
    img = img * jax.random.uniform(kb, (), minval=1 - brightness, maxval=1 + brightness)
    mean = jnp.mean(img, axis=(0, 1), keepdims=True)
    img = (img - mean) * jax.random.uniform(kc, (), minval=1 - contrast, maxval=1 + contrast) + mean
    gray = jnp.mean(img, axis=-1, keepdims=True)
    img = (img - gray) * jax.random.uniform(ks, (), minval=1 - saturation, maxval=1 + saturation) + gray
    return jnp.clip(img, 0.0, 255.0)


def _random_erase(img: jnp.ndarray, key: jax.Array, p=0.25, area=(0.02, 0.2)) -> jnp.ndarray:
    h, w = img.shape[0], img.shape[1]
    kp, ka, kt, kl, kv = jax.random.split(key, 5)
    frac = jax.random.uniform(ka, (), minval=area[0], maxval=area[1])
    eh = jnp.sqrt(frac).astype(jnp.float32) * h
    ew = jnp.sqrt(frac).astype(jnp.float32) * w
    top = jax.random.uniform(kt, (), maxval=1.0) * (h - eh)
    left = jax.random.uniform(kl, (), maxval=1.0) * (w - ew)
    rows = jnp.arange(h, dtype=jnp.float32)[:, None]
    cols = jnp.arange(w, dtype=jnp.float32)[None, :]
    inside = (rows >= top) & (rows < top + eh) & (cols >= left) & (cols < left + ew)
    apply = jax.random.bernoulli(kp, p)
    fill = jax.random.uniform(kv, img.shape, maxval=255.0)
    return jnp.where((inside & apply)[:, :, None], fill, img)


@functools.partial(jax.jit, static_argnames=("size",))
def strong_augment(key: jax.Array, images: jnp.ndarray, size: int = CROP) -> jnp.ndarray:
    """Optimized-training pipeline: RandomResizedCrop(0.8-1.0) + flip + color jitter +
    random erasing + normalize (mirrors CaptionAugmentation, optimizations.py:163-192)."""
    b = images.shape[0]
    keys = jax.random.split(key, b * 4 + 1)
    # raw key width is impl-dependent (threefry2x32: 2 words, rbg: 4) — keep
    # the reshape width-agnostic so the augment works under either PRNG
    k_flip, per = keys[0], keys[1:].reshape(b, 4, keys.shape[-1])
    imgs = images.astype(jnp.float32)
    imgs = jax.vmap(lambda im, k: _rrc_one(im, k, size, (0.8, 1.0)))(imgs, per[:, 0])
    flip = jax.random.bernoulli(k_flip, 0.5, (b,))
    imgs = jnp.where(flip[:, None, None, None], imgs[:, :, ::-1, :], imgs)
    imgs = jax.vmap(_color_jitter)(imgs, per[:, 1])
    imgs = jax.vmap(_random_erase)(imgs, per[:, 2])
    return normalize_images(imgs)


@functools.partial(jax.jit, static_argnames=("size",))
def resize_direct(images: jnp.ndarray, size: int = CROP) -> jnp.ndarray:
    """Direct Resize((224,224)) + normalize — the grid-model inference pipeline
    (scripts/inference_grid_transformer.py:43-49 differs from the vit path)."""
    x = images.astype(jnp.float32)
    x = jax.image.resize(x, (x.shape[0], size, size, x.shape[3]), method="bilinear")
    return normalize_images(x)


def mixup(key: jax.Array, images: jnp.ndarray, alpha: float = 0.2) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Beta-mixed image pairs (optimizations.py:195-223; defined-but-unused in the
    reference's scripts — provided for parity). Returns (mixed, perm, lam)."""
    k_lam, k_perm = jax.random.split(key)
    lam = jax.random.beta(k_lam, alpha, alpha)
    perm = jax.random.permutation(k_perm, images.shape[0])
    mixed = lam * images + (1 - lam) * images[perm]
    return mixed, perm, lam
