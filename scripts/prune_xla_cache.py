"""Prune the git-tracked .xla_cache to entries the bench actually touches.

Usage: python scripts/prune_xla_cache.py [--apply] [keyfile ...]

Round-3 verdict #7: committing .xla_cache keeps driver-time bench compiles
warm across workspace resets, but cache entries churn with every code/shape
change and dead hashes accumulate (457 MB after round 3, ~0.5 GiB/round).
The fused bench child (bench.py:_child) records the exact persistent-cache
keys it reads/writes to runs/bench_cache_keys.json; everything else in
.xla_cache is dead weight for the one purpose the cache is tracked for.

Default: dry-run report.  --apply deletes the dead files AND `git rm`s
them so the next cache commit shrinks instead of stacking.
"""

import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
CACHE = ROOT / ".xla_cache"
DEFAULT_KEYFILES = [ROOT / "runs" / "bench_cache_keys.json"]


def main() -> int:
    args = [a for a in sys.argv[1:]]
    apply = "--apply" in args
    keyfiles = [Path(a) for a in args if a != "--apply"] or DEFAULT_KEYFILES

    keys: set[str] = set()
    for kf in keyfiles:
        if not kf.exists():
            print(f"[prune] keyfile missing: {kf}")
            continue
        rec = json.loads(kf.read_text())
        keys |= set(rec.get("keys", []))
        print(f"[prune] {kf}: {len(rec.get('keys', []))} keys "
              f"(recorded {rec.get('at')})")
    if not keys:
        print("[prune] no keys recorded — refusing to prune everything")
        return 2

    live, dead = [], []
    for f in sorted(CACHE.glob("*-cache")):
        (live if f.name[: -len("-cache")] in keys else dead).append(f)
    dead_mb = sum(f.stat().st_size for f in dead) / 1e6
    live_mb = sum(f.stat().st_size for f in live) / 1e6
    print(f"[prune] live: {len(live)} files {live_mb:.0f} MB | "
          f"dead: {len(dead)} files {dead_mb:.0f} MB")
    if not apply:
        for f in dead:
            print(f"  would remove {f.name} ({f.stat().st_size/1e6:.1f} MB)")
        return 0
    for f in dead:
        subprocess.run(["git", "rm", "-q", "--cached", "--ignore-unmatch",
                        str(f.relative_to(ROOT))], cwd=ROOT)
        f.unlink()
        print(f"  removed {f.name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
