"""Observability: metrics history, structured logging, sample grids, profiling."""

from gcssl_tpu.obs.history import MetricsLogger
from gcssl_tpu.obs.samples import save_sample_grid
from gcssl_tpu.obs.profiling import profile_trace
from gcssl_tpu.obs.tensorboard import TBWriter, read_events

__all__ = [
    "MetricsLogger",
    "save_sample_grid",
    "profile_trace",
    "TBWriter",
    "read_events",
]
