#!/usr/bin/env python
"""Build dist/cdc_engine.zip for spark-submit --py-files (BASELINE.json:14).

The zip carries the pure-Python engine (cdc_engine/ + gen/) to every
executor; main.py stays outside as the driver script.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.abspath(__file__))


def build(out: str = "dist/cdc_engine.zip") -> str:
    out_path = os.path.join(REPO, out)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for pkg in ("cdc_engine", "gen"):
            d = os.path.join(REPO, pkg)
            for root, _dirs, files in os.walk(d):
                if "__pycache__" in root:
                    continue
                for fn in sorted(files):
                    if fn.endswith(".py"):
                        ap = os.path.join(root, fn)
                        z.write(ap, os.path.relpath(ap, REPO))
    return out_path


if __name__ == "__main__":
    p = build()
    print(p)
