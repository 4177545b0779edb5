"""Build the ``--py-files`` artifact the north_rule launch mode ships.

``spark-submit --py-files wbx.zip job.py`` distributes the engine to every
executor's PYTHONPATH — the deployment story for a multi-executor cluster
(BASELINE.json north_rule: "run via spark-submit --py-files").  The zip
holds the ``wbx`` package only: no tests, no fixtures, no bytecode — the
archive must be import-stable across executors with different
``__pycache__`` states.

Usage: python tools/package.py [out.zip]   (default: dist/wbx.zip)
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str | None = None) -> str:
    out = out or os.path.join(REPO, "dist", "wbx.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(REPO, "wbx")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                # archive path is wbx/<relpath> so the zip root is a
                # package container, exactly how --py-files mounts it
                zf.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
