"""W&B-compatible run export.

The reference logs every run to Weights & Biases
(/root/reference/cgan/cgan_train_enhanced.py:180-248,450-471,513-551) and its
committed artifacts live under ``cgan/wandb/run-*/files/`` as
``wandb-metadata.json`` + ``wandb-summary.json`` (+ history).  This module
reproduces that on-disk contract without the wandb service (zero-egress
environment): if the ``wandb`` package is importable it is used in offline
mode; otherwise the same ``wandb/run-<ts>-<id>/files/`` tree is written
directly, so downstream tooling that reads the reference's run dirs (summary
diffing, `wandb sync` once online) works on ours unchanged.
"""

from __future__ import annotations

import json
import platform
import secrets
import sys
import time
from pathlib import Path
from typing import Any


class WandbExporter:
    """Drop-in sink: construct, ``log(record)`` per epoch, ``finish()``.

    Always writes the directory contract; additionally forwards to the real
    wandb client when available and ``use_client=True``.
    """

    def __init__(
        self,
        root: str | Path,
        project: str = "gcssl-tpu",
        run_name: str | None = None,
        config: dict[str, Any] | None = None,
        use_client: bool = False,
    ):
        ts = time.strftime("%Y%m%d_%H%M%S")
        run_id = secrets.token_hex(4)
        self.run_dir = Path(root) / "wandb" / f"run-{ts}-{run_id}"
        self.files = self.run_dir / "files"
        self.files.mkdir(parents=True, exist_ok=True)
        self._history = self.files / "wandb-history.jsonl"
        self._summary: dict[str, Any] = {}
        self._step = 0

        meta = {
            "os": platform.platform(),
            "python": sys.version.split()[0],
            "program": sys.argv[0],
            "args": sys.argv[1:],
            "startedAt": time.strftime("%Y-%m-%dT%H:%M:%S"),
            "project": project,
            "name": run_name or run_id,
        }
        try:  # jax runtime info, mirroring the reference's GPU metadata block
            import jax

            meta["devices"] = [d.device_kind for d in jax.devices()]
            meta["backend"] = jax.default_backend()
        except Exception:
            pass
        (self.files / "wandb-metadata.json").write_text(json.dumps(meta, indent=2))
        if config is not None:
            (self.files / "config.json").write_text(
                json.dumps(config, indent=2, default=str)
            )

        self._client_run = None
        if use_client:
            try:
                import wandb

                self._client_run = wandb.init(
                    project=project, name=run_name, config=config,
                    mode="offline", dir=str(self.run_dir),
                )
            except Exception:
                self._client_run = None

    def log(self, record: dict[str, Any]) -> None:
        row = {"_step": self._step, "_timestamp": time.time(), **record}
        with self._history.open("a") as f:
            f.write(json.dumps(row, default=float) + "\n")
        self._summary.update(record)
        self._step += 1
        if self._client_run is not None:
            self._client_run.log(record)

    def finish(self, extra_summary: dict[str, Any] | None = None) -> Path:
        if extra_summary:
            self._summary.update(extra_summary)
        (self.files / "wandb-summary.json").write_text(
            json.dumps(self._summary, indent=2, default=float)
        )
        if self._client_run is not None:
            self._client_run.finish()
        return self.run_dir
