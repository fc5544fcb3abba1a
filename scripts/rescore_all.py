"""Protocol rescore of every detector release under weights/.

Usage: python scripts/rescore_all.py [out.json]

Thin driver over scripts/rescore_val.py: globs weights/detector_*.msgpack.gz
(skipping "_snapshot" progress files) and rescores each on val under both
AP formulas, writing runs/rescore_val.json — the committed artifact the
parity claim is judged on (VERDICT r4 #1 done-criterion).
"""

import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "runs/rescore_val.json"
    releases = sorted(
        p for p in ROOT.glob("weights/detector_*.msgpack.gz")
        if "snapshot" not in p.name
    )
    if not releases:
        print("no releases found", flush=True)
        return 2
    ws = [f"w={p.relative_to(ROOT)}" for p in releases]
    print(f"rescoring {len(releases)} releases -> {out}", flush=True)
    rc = subprocess.run(
        [sys.executable, "scripts/rescore_val.py", out, *ws], cwd=ROOT
    ).returncode
    if rc:
        return rc
    # supplementary: the held-out TEST split (never used for selection) for
    # the parity releases — generalization evidence beyond the val protocol
    parity = [w for w in ws if "parity" in w] or ws[:1]
    return subprocess.run(
        [sys.executable, "scripts/rescore_val.py", "runs/rescore_test.json",
         *parity, "split=test"], cwd=ROOT
    ).returncode


if __name__ == "__main__":
    raise SystemExit(main())
