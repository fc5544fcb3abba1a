"""gcssl_tpu — TPU-native GAN-Calibrated Semi-Supervised Learning framework.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
``1213ray/GAN-Calibrated-Semi-Supervised-Learning`` pipeline (see SURVEY.md):

* four-stage semi-supervised object detection: supervised teacher training,
  dual-track pseudo-labeling (two-stage confidence + k-fold cross), WGAN-GP
  conditional-GAN box calibration, calibrate-merge-retrain iteration;
* a generic GAN-SSL core (K+1-class discriminator, feature matching, ECE
  calibration) for the classification configurations in BASELINE.json.

Everything on the compute path is jitted JAX targeting TPU: fused single-step
WGAN-GP training (critic loop unrolled in one compiled step), on-device
differentiable patch crops replacing the reference's host PIL round-trip,
data parallelism via ``jax.sharding`` over a device mesh.

Subpackages
-----------
core      typed config tree, mesh/device setup, checkpointing, RNG discipline
ops       pure-JAX geometry: boxes, IoU/EIoU, delta codecs, matching, NMS, patches
models    Flax modules: calibrator G/D, detector, SSL GAN family
data      YOLO-txt IO, index building, host->device input pipelines
train     jitted train steps + loops (WGAN-GP calibrator, detector, SSL)
parallel  sharding helpers (data-parallel step wrappers, mesh utilities)
pipeline  stage orchestrators (split, two-stage, k-fold, calibrate, iterate)
eval      P/R/F1 pseudo-vs-GT, delta-IoU, mAP, ECE
obs       metrics history, logging, profiling hooks
kernels   Pallas TPU kernels for hot fused ops
"""

__version__ = "0.1.0"
