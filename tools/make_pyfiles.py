#!/usr/bin/env python
"""Package kgflow/ into kgflow.zip for spark-submit --py-files.

    python tools/make_pyfiles.py          # writes ./kgflow.zip
    spark-submit --py-files kgflow.zip run_pipeline.py --synthetic 1000 --output /tmp/run
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out = os.path.join(REPO, "kgflow.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(REPO, "kgflow")
        for root, _, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    print(out)


if __name__ == "__main__":
    main()
