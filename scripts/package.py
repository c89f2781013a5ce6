#!/usr/bin/env python
"""Build dist/s1x.zip for spark-submit --py-files."""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "service1_text_extraction_spark"
OUT = os.path.join(REPO, "dist", "s1x.zip")


def main() -> None:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    path = os.path.join(root, f)
                    z.write(path, os.path.relpath(path, REPO))
    print(OUT)


if __name__ == "__main__":
    main()
