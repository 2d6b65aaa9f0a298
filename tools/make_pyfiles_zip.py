"""Build dist/ecc_spark.zip — the --py-files artifact for spark-submit.

Zips the ecc_spark package (sources only, no __pycache__, stable entry
order so the artifact is byte-reproducible for a given tree). Usage:

    python tools/make_pyfiles_zip.py [out_zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_zip: str, pkg_dir: str | None = None) -> str:
    pkg_dir = pkg_dir or os.path.join(REPO, "ecc_spark")
    os.makedirs(os.path.dirname(out_zip) or ".", exist_ok=True)
    with zipfile.ZipFile(out_zip, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(pkg_dir):
            dirs[:] = sorted(d for d in dirs if d != "__pycache__")
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                arc = os.path.join(
                    "ecc_spark", os.path.relpath(full, pkg_dir)
                )
                # fixed timestamp -> reproducible artifact
                info = zipfile.ZipInfo(arc, date_time=(2020, 1, 1, 0, 0, 0))
                info.compress_type = zipfile.ZIP_DEFLATED
                with open(full, "rb") as fh:
                    zf.writestr(info, fh.read())
    return out_zip


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", "ecc_spark.zip")
    print(build(out))
