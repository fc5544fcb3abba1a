"""Host-side schedulers: ReduceLROnPlateau (mode=max) and early stopping.

Twins of the reference's torch schedulers/early-stop logic:
* ReduceLROnPlateau(mode='max', factor=0.5, patience=5) on delta-IoU —
  /root/reference/cgan/cgan_train_enhanced.py:260-261,427-428.  Torch
  semantics replicated: 'rel' threshold 1e-4, improvement resets the bad-epoch
  counter, patience exceeded halves the LR and resets the counter.
* Early stop: best-if delta_iou > best + min_delta, patience 20 —
  cgan_train_enhanced.py:481-503, config.yaml:22-24.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class ReduceLROnPlateau:
    initial_lr: float
    factor: float = 0.5
    patience: int = 5
    threshold: float = 1e-4
    min_lr: float = 0.0
    lr: float = field(init=False)
    best: float = field(init=False, default=float("-inf"))
    num_bad_epochs: int = field(init=False, default=0)

    def __post_init__(self) -> None:
        self.lr = self.initial_lr

    def _is_better(self, metric: float) -> bool:
        # torch mode='max', threshold_mode='rel': a > best * (1 + threshold).
        # NOT best + thr*|best| — for negative best torch RELAXES the bar
        # (best*(1+thr) is more negative), and delta_iou is routinely
        # negative early in training.
        if self.best == float("-inf"):
            return True
        return metric > self.best * (1.0 + self.threshold)

    def step(self, metric: float) -> float:
        """Feed the epoch metric; returns the (possibly reduced) LR."""
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
            if self.num_bad_epochs > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad_epochs = 0
        return self.lr


@dataclass
class EarlyStopping:
    patience: int = 20
    min_delta: float = 1e-5
    best: float = field(init=False, default=float("-inf"))
    num_bad_epochs: int = field(init=False, default=0)
    improved: bool = field(init=False, default=False)

    def step(self, metric: float) -> bool:
        """Feed the epoch metric; returns True when training should stop."""
        if self.best == float("-inf"):
            improved = metric > -1.0 + self.min_delta  # reference best starts at -1.0
        else:
            improved = metric > self.best + self.min_delta
        self.improved = improved
        if improved:
            self.best = metric
            self.num_bad_epochs = 0
            return False
        self.num_bad_epochs += 1
        return self.num_bad_epochs >= self.patience
