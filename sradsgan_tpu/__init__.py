"""sradsgan_tpu — a TPU-native super-resolution framework.

A from-scratch JAX/Flax/Pallas/pjit rebuild of the capability surface of
Meng-333/SRADSGAN (remote-sensing single-image super-resolution, TGRS 2024):

- nine SR generators (EDSR, SRGAN, DRCAN, DSSR, SRAGAN, NDSRGAN, AMSSRN, HAT,
  SRADSGAN) plus patch discriminators, built as Flax modules in NHWC layout;
- a single pjit-sharded GAN/pixel trainer (one jitted step: G update + D update
  + WGAN-GP inside), data-parallel over a `jax.sharding.Mesh`;
- a host-side data pipeline with PIL-bicubic LR degradation (metric-protocol
  parity) and a device-side matmul bicubic for throughput paths;
- the reference evaluation protocol (uint8 PSNR/SSIM/MSE/ERGAS/LPIPS,
  per-class UCMerced tables, single-image tif inference);
- an SR3-style conditional diffusion SR sub-package (GDP parity);
- Pallas TPU kernels for the hot ops.

Reference layer map: /root/repo/SURVEY.md. Reference behaviors are cited
by file:line in docstrings throughout.
"""

__version__ = "0.1.0"
