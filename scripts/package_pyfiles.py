"""Build the --py-files zip for spark-submit (north-rule packaging).

Zips the ``document_convert_to__markdown_spark`` package (source only,
no caches) to ``/tmp/doc2md_pyfiles.zip`` by default.  Executors unpack
this onto their PYTHONPATH — no cluster-wide pip install.

Usage: python scripts/package_pyfiles.py [out.zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "document_convert_to__markdown_spark"


def build(out_path: str) -> str:
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(os.path.join(REPO, PKG)):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for fname in sorted(files):
                if not fname.endswith(".py"):
                    continue
                full = os.path.join(root, fname)
                zf.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/doc2md_pyfiles.zip"
    print(build(out))
