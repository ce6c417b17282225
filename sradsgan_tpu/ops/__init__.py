from sradsgan_tpu.ops.resize import (
    bicubic_resize,
    degrade_pair,
    resize_matrix,
)
from sradsgan_tpu.ops.pixelshuffle import pixel_shuffle, pixel_unshuffle

__all__ = [
    "bicubic_resize",
    "degrade_pair",
    "resize_matrix",
    "pixel_shuffle",
    "pixel_unshuffle",
]
