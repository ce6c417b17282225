from sradsgan_tpu.losses.pixel import pixel_loss
from sradsgan_tpu.losses.gan import (adversarial_loss_d, adversarial_loss_g,
                                     gradient_penalty)
from sradsgan_tpu.losses.vgg import VGG19Features

__all__ = ["pixel_loss", "adversarial_loss_d", "adversarial_loss_g",
           "gradient_penalty", "VGG19Features"]
