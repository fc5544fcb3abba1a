"""Flax model zoo: calibrator G/D (conv + ViT variants), detector,
classification-SSL GAN family."""

from gcssl_tpu.models.layers import instance_norm, pix2pix_kernel_init
from gcssl_tpu.models.generators import GeneratorUNet, GeneratorSimpleRegressor, build_generator
from gcssl_tpu.models.discriminators import PatchCritic
from gcssl_tpu.models.vit_gan import CriticViT, GeneratorViT

__all__ = [
    "instance_norm",
    "pix2pix_kernel_init",
    "GeneratorUNet",
    "GeneratorSimpleRegressor",
    "GeneratorViT",
    "build_generator",
    "PatchCritic",
    "CriticViT",
]
