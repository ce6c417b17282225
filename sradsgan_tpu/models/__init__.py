"""Model registry: name -> (generator ctor, discriminator spec, loss recipe).

Mirrors the per-model defaults hard-coded in the reference's nine
``main_*.py`` / trainer constructors (see SURVEY.md §3.5):

=========  ======================  =========================================
model      adversarial             G loss (reference file:line)
=========  ======================  =========================================
edsr       no                      L1 (edsr.py:163-166)
srgan      lsgan (MSE)             MSE + 6e-3*VGG + 1e-3*adv (srgan.py:346-364)
drcan      wgan-gp                 MSE + w_c*VGG + w_g*adv (drcan.py:676-694)
dssr       no                      pixel only (dssr.py:374)
sragan     wgan-gp                 L1 + w_c*VGG + w_g*adv (sragan.py:647-665)
ndsrgan    lsgan (MSE)             1e-2*MSE + VGG + 2.5e-3*adv (ndsrgan.py:429-434)
amssrn     no                      pixel only (amssrn.py:529)
hat        no                      pixel only (hat.py:1071)
sradsgan   wgan-gp                 L1 + 1e-2*VGG + 1e-3*adv (sradsgan.py:852)
=========  ======================  =========================================
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

from sradsgan_tpu.models.amssrn import AMSSRN
from sradsgan_tpu.models.discriminators import PatchDiscriminator
from sradsgan_tpu.models.drcan import DRCAN
from sradsgan_tpu.models.dssr import DSSR
from sradsgan_tpu.models.edsr import EDSR
from sradsgan_tpu.models.ndsrgan import NDSRGAN_D_BLOCKS, NDSRGANGenerator
from sradsgan_tpu.models.sradsgan import SRADSGANGenerator
from sradsgan_tpu.models.sragan import SRAGANGenerator
from sradsgan_tpu.models.srgan import SRGANGenerator


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Static recipe for one model family."""

    name: str
    generator: Callable[..., Any]
    adversarial: bool = False
    gan_type: str = "wgan-gp"            # 'vanilla' | 'lsgan' | 'wgan-gp'
    discriminator: Optional[Callable[..., Any]] = None
    pixel_loss: str = "l1"               # 'l1' | 'l2'
    weight_pixel: float = 1.0
    weight_content: float = 0.0          # VGG19 perceptual
    weight_gan: float = 0.0
    default_lr: float = 2e-4


def _sradsgan_d(**kw):
    return PatchDiscriminator(use_attention=True, **kw)


def _plain_d(**kw):
    return PatchDiscriminator(use_attention=False, **kw)


def _ndsrgan_d(**kw):
    return PatchDiscriminator(blocks=NDSRGAN_D_BLOCKS, kernel_size=4, **kw)


_REGISTRY = {
    "edsr": ModelSpec("edsr", EDSR, pixel_loss="l1", default_lr=1e-4),
    "srgan": ModelSpec("srgan", SRGANGenerator, adversarial=True,
                       gan_type="lsgan", discriminator=_plain_d,
                       pixel_loss="l2", weight_content=6e-3,
                       weight_gan=1e-3, default_lr=1e-4),
    "drcan": ModelSpec("drcan", DRCAN, adversarial=True, gan_type="wgan-gp",
                       discriminator=_plain_d, pixel_loss="l2",
                       weight_content=1e-2, weight_gan=1e-3),
    "dssr": ModelSpec("dssr", DSSR, pixel_loss="l1", default_lr=1e-4),
    "sragan": ModelSpec("sragan", SRAGANGenerator, adversarial=True,
                        gan_type="wgan-gp", discriminator=_sradsgan_d,
                        pixel_loss="l1", weight_content=1e-2,
                        weight_gan=1e-3),
    "ndsrgan": ModelSpec("ndsrgan", NDSRGANGenerator, adversarial=True,
                         gan_type="lsgan", discriminator=_ndsrgan_d,
                         pixel_loss="l2", weight_pixel=1e-2,
                         weight_content=1.0, weight_gan=2.5e-3),
    "amssrn": ModelSpec("amssrn", AMSSRN, pixel_loss="l1", default_lr=1e-4),
    "sradsgan": ModelSpec("sradsgan", SRADSGANGenerator, adversarial=True,
                          gan_type="wgan-gp", discriminator=_sradsgan_d,
                          pixel_loss="l1", weight_content=1e-2,
                          weight_gan=1e-3),
}


def register(spec: ModelSpec) -> None:
    _REGISTRY[spec.name] = spec


def get_spec(name: str) -> ModelSpec:
    try:
        return _REGISTRY[name.lower()]
    except KeyError:
        raise KeyError(f"unknown model {name!r}; have {sorted(_REGISTRY)}")


def available_models():
    return sorted(_REGISTRY)


def create_generator(name: str, scale: int, **kwargs):
    return get_spec(name).generator(scale=scale, **kwargs)


def create_discriminator(name: str, **kwargs):
    spec = get_spec(name)
    if spec.discriminator is None:
        raise ValueError(f"model {name!r} has no discriminator")
    return spec.discriminator(**kwargs)


# HAT registers itself on import (kept separate: transformer-specific deps).
def _register_hat():
    try:
        from sradsgan_tpu.models.hat import HAT  # noqa: F401
        _REGISTRY["hat"] = ModelSpec("hat", HAT, pixel_loss="l1")
    except ImportError:
        pass


_register_hat()
