"""Flax model zoo: calibrator G/D, detector, classification-SSL GAN family."""

from gcssl_tpu.models.layers import instance_norm, pix2pix_kernel_init
from gcssl_tpu.models.generators import GeneratorUNet, GeneratorSimpleRegressor, build_generator
from gcssl_tpu.models.discriminators import PatchCritic

__all__ = [
    "instance_norm",
    "pix2pix_kernel_init",
    "GeneratorUNet",
    "GeneratorSimpleRegressor",
    "build_generator",
    "PatchCritic",
]
