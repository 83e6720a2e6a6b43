#!/usr/bin/env python3
"""Build the ``--py-files`` archive for cluster submission.

Produces ``dist/zentity_spark.zip`` containing every ``zentity_spark/**/*.py``
module, importable from the archive root — the artifact the north rule's
``spark-submit --py-files zentity_spark.zip`` contract ships to executors.

The zip is DETERMINISTIC (sorted entries, fixed timestamps, no extra
attributes): rebuilding from the same tree yields byte-identical output, so
the artifact can be content-addressed / cached by a deploy pipeline.

Usage:
    python scripts/build_zip.py [out.zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "zentity_spark"
# Fixed DOS timestamp for reproducibility (zip format has no "no timestamp").
_EPOCH = (1980, 1, 1, 0, 0, 0)


def build(out_path: str) -> list[str]:
    """Write the archive; return the (sorted) member names."""
    members: list[str] = []
    for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
        for f in files:
            if f.endswith(".py"):
                full = os.path.join(root, f)
                members.append(os.path.relpath(full, REPO))
    members.sort()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for rel in members:
            info = zipfile.ZipInfo(rel.replace(os.sep, "/"), date_time=_EPOCH)
            info.external_attr = 0o644 << 16
            with open(os.path.join(REPO, rel), "rb") as f:
                z.writestr(info, f.read())
    return members


def main(argv: list[str]) -> int:
    out = argv[0] if argv else os.path.join(REPO, "dist", "zentity_spark.zip")
    members = build(out)
    print(f"{out}: {len(members)} modules, {os.path.getsize(out)} bytes")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
