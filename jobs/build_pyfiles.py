"""Package the engine for ``spark-submit --py-files`` deployment.

Usage:  python jobs/build_pyfiles.py [out.zip]

Produces a zip of the ``inferdf_rs_spark`` package (source only) that a
cluster submit ships to every executor:

    spark-submit --py-files inferdf_rs_spark.zip jobs/run_kg_pipeline.py ...

The zip is importable on driver and executors without the repo checkout
(spark-submit prepends --py-files entries to PYTHONPATH on both sides).
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> str:
    pkg = os.path.join(REPO, "inferdf_rs_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for name in sorted(files):
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                z.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "inferdf_rs_spark.zip")
    print(build(out))
