"""Build the ``--py-files`` artifact: dist/hashio_spark.zip.

``spark-submit --py-files dist/hashio_spark.zip hashio_spark/cli.py ...``
ships the package to every executor (Spark inserts the zip on each
worker's ``sys.path``; pure-Python zips import directly, which this
package is — the digest kernels are expressions/Arrow UDFs, no native
wheels).  The zip contains only the package tree: no tests, no caches.

Usage:
    PYTHONPATH=/root/repo python tools/make_pyfiles.py [out.zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str) -> list[str]:
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    names: list[str] = []
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(ROOT, "hashio_spark")
        for dirpath, dirnames, filenames in os.walk(pkg):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, ROOT)
                z.write(full, rel)
                names.append(rel)
    return names


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "dist", "hashio_spark.zip")
    names = build(out)
    print(f"{out}: {len(names)} files")
