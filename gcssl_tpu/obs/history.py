"""Metrics history: JSON + CSV + console, replacing the reference's trio of
console prints, training_history.json, and W&B logging
(/root/reference/cgan/cgan_train_enhanced.py:431-471,505-508).

The logger is append-only and crash-safe (JSONL stream + rewritten JSON
snapshot), works for any stage (calibrator, detector, SSL), and emits the
same per-epoch record schema the reference committed in
cgan/runs/exp/training_history.json so downstream tooling can diff runs.
"""

from __future__ import annotations

import csv
import json
from pathlib import Path
from typing import Any


class MetricsLogger:
    def __init__(self, run_dir: str | Path, console: bool = True,
                 tensorboard: bool = True):
        self.run_dir = Path(run_dir)
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self.console = console
        self.records: list[dict[str, Any]] = []
        self._jsonl = self.run_dir / "metrics.jsonl"
        self._csv = self.run_dir / "results.csv"
        self._tb = None
        if tensorboard:
            from gcssl_tpu.obs.tensorboard import TBWriter

            self._tb = TBWriter(self.run_dir / "tb")

    def log(self, record: dict[str, Any]) -> None:
        self.records.append(record)
        with self._jsonl.open("a") as f:
            f.write(json.dumps(record) + "\n")
        self._write_csv()
        if self._tb is not None:
            step = record.get("epoch", record.get("step", len(self.records)))
            self._tb.scalars(record, int(step))
        if self.console:
            parts = []
            for k, v in record.items():
                parts.append(f"{k}: {v:.4f}" if isinstance(v, float) else f"{k}: {v}")
            print("[" + " | ".join(parts) + "]")

    def _write_csv(self) -> None:
        keys: list[str] = []
        for r in self.records:
            for k in r:
                if k not in keys:
                    keys.append(k)
        with self._csv.open("w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=keys)
            w.writeheader()
            w.writerows(self.records)

    def watch(self, tree, step: int, prefix: str = "params") -> None:
        """Per-leaf histograms of a param/grad pytree into TensorBoard —
        the ``wandb.watch(netG/netD, log='all')`` analogue
        (/root/reference/cgan/cgan_train_enhanced.py:247-248)."""
        if self._tb is not None:
            self._tb.watch(tree, step, prefix)

    def finalize(self, filename: str = "training_history.json") -> Path:
        out = self.run_dir / filename
        out.write_text(json.dumps(self.records, indent=2))
        if self._tb is not None:
            self._tb.close()
        return out
