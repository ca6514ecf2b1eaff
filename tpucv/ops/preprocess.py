"""On-device preprocessing.

The reference normalises on CPU inside Dataset workers; here uint8 batches are
shipped to the device once and everything else (scale, cast, future: HSV /
affine) runs on-chip, fused by XLA into the first conv — the BASELINE.json
north-star "JPEG -> boxes never leaves the chip after host decode".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_images(images_u8: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """uint8 NHWC -> dtype in [0, 1] (reference divides by 255.0)."""
    return images_u8.astype(dtype) / jnp.asarray(255.0, dtype)


def imagenet_normalize(images: jax.Array) -> jax.Array:
    """ImageNet mean/std normalisation (segmentation path parity:
    core/data/segmentation_dataset.py transform stack)."""
    mean = jnp.asarray([0.485, 0.456, 0.406], images.dtype)
    std = jnp.asarray([0.229, 0.224, 0.225], images.dtype)
    return (images - mean) / std
