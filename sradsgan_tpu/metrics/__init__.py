from sradsgan_tpu.metrics.fidelity import (
    compare_mse,
    compare_psnr,
    compare_ssim,
    compare_ergas,
    batched_ergas,
    batched_psnr,
    batched_ssim,
    tensor_to_uint8,
)

__all__ = [
    "compare_mse",
    "compare_psnr",
    "compare_ssim",
    "compare_ergas",
    "batched_ergas",
    "batched_psnr",
    "batched_ssim",
    "tensor_to_uint8",
]
