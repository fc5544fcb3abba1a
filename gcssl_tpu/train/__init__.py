"""Jitted train steps and loops."""

from gcssl_tpu.train.wgan_gp import (
    CalibratorTrainState,
    DeviceData,
    create_train_state,
    make_train_step,
    make_eval_step,
    make_sample_fn,
    train_calibrator,
)
from gcssl_tpu.train.schedule import ReduceLROnPlateau, EarlyStopping

__all__ = [
    "CalibratorTrainState",
    "DeviceData",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "train_calibrator",
    "ReduceLROnPlateau",
    "EarlyStopping",
]
