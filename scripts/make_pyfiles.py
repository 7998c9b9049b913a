#!/usr/bin/env python
"""Zip the library for spark-submit --py-files (SURVEY.md §4.3: the kernels
module ships to executors inside this zip, keeping the pytest oracle and the
UDF bodies literally the same files)."""

from __future__ import annotations

import pathlib
import zipfile

REPO = pathlib.Path(__file__).resolve().parents[1]
PKG = REPO / "universal_text_extractor_spark"
OUT = REPO / "dist" / "utes.zip"


def main() -> None:
    OUT.parent.mkdir(exist_ok=True)
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted(PKG.rglob("*.py")):
            z.write(p, p.relative_to(REPO))
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
