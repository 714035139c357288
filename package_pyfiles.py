#!/usr/bin/env python
"""Build dist/osm_chordify_spark.zip for spark-submit --py-files."""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.abspath(__file__))
DIST = os.path.join(ROOT, "dist")
PKG = "osm_chordify_spark"


def main() -> str:
    os.makedirs(DIST, exist_ok=True)
    out = os.path.join(DIST, f"{PKG}.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirs, files in os.walk(os.path.join(ROOT, PKG)):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    zf.write(full, os.path.relpath(full, ROOT))
    print(out)
    return out


if __name__ == "__main__":
    main()
