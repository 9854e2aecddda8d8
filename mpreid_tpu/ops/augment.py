"""Device-side image augmentation pipeline, fully jitted.

Replaces the reference's CPU-side torchvision transform stack
(reference ``datasets/make_dataloader.py:46-61``):

    Resize(bicubic) → RandomHorizontalFlip → Pad(10) → RandomCrop →
    ToTensor → Normalize → RandomErasing(timm, mode='pixel', max_count=1)

Here the host only decodes + bicubically resizes (PIL, matching
``T.Resize(interpolation=3)``); everything stochastic runs on-device as one
compiled program over the whole uint8 batch, keyed by a JAX PRNG key —
per-sample randomness comes from key splitting, so batches are reproducible
given (seed, epoch, step).

Random-erasing note: timm's 'pixel' mode retries up to 10 times for a
rectangle that fits; we instead clamp the sampled rectangle into the image
(one sample). The erased-area distribution differs negligibly and the
operation stays shape-static for XLA.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

MIN_ERASE_AREA = 0.02
MAX_ERASE_AREA = 1.0 / 3.0
MIN_ERASE_ASPECT = 0.3


def normalize(images: jax.Array, mean: Sequence[float], std: Sequence[float]) -> jax.Array:
    """uint8/float (B,H,W,3) → normalized float32 (ToTensor + Normalize)."""
    x = images.astype(jnp.float32) / 255.0 if images.dtype == jnp.uint8 else images
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (x - mean) / std


def _random_flip(img: jax.Array, key: jax.Array, prob: float) -> jax.Array:
    flip = jax.random.uniform(key) < prob
    return jnp.where(flip, img[:, ::-1, :], img)


def _pad_crop_batch(imgs: jax.Array, keys: jax.Array, padding: int) -> jax.Array:
    """Batched pad-and-random-crop via two gathers.

    A vmapped per-image ``dynamic_slice`` lowers to a while loop +
    dynamic-update-slice on TPU (~1.8 ms/step at batch 64 in the stage-2
    profile); expressing the crop as row/column gathers keeps it one
    vectorized op pair. Key usage matches the original per-image formulation
    (split → (ky, kx) → randint) so augmented pixels are bit-identical."""
    b, h, w, c = imgs.shape
    padded = jnp.pad(imgs, ((0, 0), (padding, padding), (padding, padding), (0, 0)))

    def offsets(key):
        ky, kx = jax.random.split(key)
        return (
            jax.random.randint(ky, (), 0, 2 * padding + 1),
            jax.random.randint(kx, (), 0, 2 * padding + 1),
        )

    oy, ox = jax.vmap(offsets)(keys)
    rows = oy[:, None] + jnp.arange(h)[None, :]                      # (B, H)
    cols = ox[:, None] + jnp.arange(w)[None, :]                      # (B, W)
    x = jnp.take_along_axis(padded, rows[:, :, None, None], axis=1)  # (B,H,W+2p,C)
    return jnp.take_along_axis(x, cols[:, None, :, None], axis=2)    # (B,H,W,C)


def _random_erase(img: jax.Array, key: jax.Array, prob: float) -> jax.Array:
    """timm-style per-pixel-noise random erasing, shape-static."""
    h, w, c = img.shape
    k_gate, k_area, k_aspect, k_y, k_x, k_noise = jax.random.split(key, 6)

    target_area = jax.random.uniform(k_area, minval=MIN_ERASE_AREA, maxval=MAX_ERASE_AREA) * h * w
    log_ratio = jax.random.uniform(
        k_aspect,
        minval=jnp.log(MIN_ERASE_ASPECT),
        maxval=jnp.log(1.0 / MIN_ERASE_ASPECT),
    )
    aspect = jnp.exp(log_ratio)
    eh = jnp.clip(jnp.round(jnp.sqrt(target_area * aspect)).astype(jnp.int32), 1, h - 1)
    ew = jnp.clip(jnp.round(jnp.sqrt(target_area / aspect)).astype(jnp.int32), 1, w - 1)
    y0 = jax.random.randint(k_y, (), 0, h)
    y0 = jnp.minimum(y0, h - eh)
    x0 = jax.random.randint(k_x, (), 0, w)
    x0 = jnp.minimum(x0, w - ew)

    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]
    inside = (rows >= y0) & (rows < y0 + eh) & (cols >= x0) & (cols < x0 + ew)
    noise = jax.random.normal(k_noise, img.shape, img.dtype)
    erased = jnp.where(inside[:, :, None], noise, img)
    gate = jax.random.uniform(k_gate) < prob
    return jnp.where(gate, erased, img)


@functools.partial(
    jax.jit, static_argnames=("flip_prob", "padding", "re_prob", "mean", "std")
)
def train_augment(
    images_u8: jax.Array,
    key: jax.Array,
    mean: Tuple[float, ...] = (0.485, 0.456, 0.406),
    std: Tuple[float, ...] = (0.229, 0.224, 0.225),
    flip_prob: float = 0.5,
    padding: int = 10,
    re_prob: float = 0.5,
) -> jax.Array:
    """(B,H,W,3) uint8 → augmented normalized float32 batch."""
    b = images_u8.shape[0]
    keys = jax.random.split(key, b)

    def flip_one(img, k):
        k_flip, k_crop = jax.random.split(k)
        return _random_flip(img.astype(jnp.float32) / 255.0, k_flip, flip_prob), k_crop

    x, crop_keys = jax.vmap(flip_one)(images_u8, keys)
    if padding:
        x = _pad_crop_batch(x, crop_keys, padding)
    x = (x - jnp.asarray(mean, jnp.float32)) / jnp.asarray(std, jnp.float32)
    # fold_in with a constant outside split()'s index range so erase keys are
    # independent of the flip/crop keys (fold_in(k, 1) == split(k)[1])
    erase_keys = jax.vmap(lambda k: jax.random.fold_in(k, 0x5EED))(keys)
    x = jax.vmap(lambda im, k: _random_erase(im, k, re_prob))(x, erase_keys)
    return x


@functools.partial(jax.jit, static_argnames=("mean", "std"))
def eval_preprocess(
    images_u8: jax.Array,
    mean: Tuple[float, ...] = (0.485, 0.456, 0.406),
    std: Tuple[float, ...] = (0.229, 0.224, 0.225),
) -> jax.Array:
    """Val/test pipeline: just ToTensor + Normalize (host already resized)."""
    return normalize(images_u8, mean, std)
