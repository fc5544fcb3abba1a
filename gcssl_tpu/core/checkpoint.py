"""Resumable checkpointing for full train states.

Strictly richer than the reference's best-only ``G_best.pth``
({generator, discriminator, epoch, delta_iou, config} —
/root/reference/cgan/cgan_train_enhanced.py:483-489, no optimizer state, not
resumable): we persist the complete train state pytree (G/D params, both
optimizer states, RNG key, step/epoch counters) plus a JSON metadata sidecar,
keep best-by-metric and last, and restore onto a target state template (so
restores re-shard correctly onto whatever mesh the new process uses).

Serialization is flax msgpack (host-independent, no pickle).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import jax
from flax import serialization


class CheckpointManager:
    def __init__(self, directory: str | Path):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)

    def _paths(self, name: str) -> tuple[Path, Path]:
        return self.dir / f"{name}.msgpack", self.dir / f"{name}.json"

    def save(self, name: str, state: Any, metadata: dict | None = None) -> Path:
        """Save a pytree state + metadata under ``name`` (e.g. 'best', 'last')."""
        state = jax.device_get(state)
        data_path, meta_path = self._paths(name)
        tmp = data_path.with_suffix(".tmp")
        tmp.write_bytes(serialization.to_bytes(state))
        tmp.replace(data_path)  # atomic on POSIX
        meta_path.write_text(json.dumps(metadata or {}, indent=2, default=str))
        return data_path

    def restore(self, name: str, target: Any) -> Any:
        """Restore into the structure of ``target`` (an initialized state).

        Tolerant of structure drift across versions: stored keys missing
        from the checkpoint keep the target's (freshly initialized) value,
        and extra stored keys are ignored — so e.g. a round-1 checkpoint
        without the round-2 ``g_ema`` field still loads."""
        data_path, _ = self._paths(name)
        stored = serialization.msgpack_restore(data_path.read_bytes())
        tgt_sd = serialization.to_state_dict(target)

        def merge(t, s):
            if isinstance(t, dict):
                if not isinstance(s, dict):
                    return t
                return {k: merge(v, s[k]) if k in s else v for k, v in t.items()}
            return s if s is not None else t

        return serialization.from_state_dict(target, merge(tgt_sd, stored))

    def metadata(self, name: str) -> dict:
        _, meta_path = self._paths(name)
        if not meta_path.exists():
            return {}
        return json.loads(meta_path.read_text())

    def exists(self, name: str) -> bool:
        return self._paths(name)[0].exists()
