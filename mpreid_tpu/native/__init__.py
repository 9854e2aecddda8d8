from .imageio import (
    decode_resize_batch_native,
    native_imageio_available,
    resize_rgb8_native,
)
from .rerank import native_available, re_ranking_native

__all__ = [
    "native_available",
    "re_ranking_native",
    "native_imageio_available",
    "decode_resize_batch_native",
    "resize_rgb8_native",
]
