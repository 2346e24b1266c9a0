"""Build dist/kaminpar_spark.zip for `spark-submit --py-files` (north rule:
"ships as a spark-submit --py-files package").

Usage:
    python scripts/make_pyfiles.py
    spark-submit --py-files dist/kaminpar_spark.zip your_job.py
or for the built-in CLI:
    spark-submit --py-files dist/kaminpar_spark.zip -m kaminpar_spark.cli \
        partition -G graph.parquet -k 16
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "kaminpar_spark.zip")
    pkg = os.path.join(REPO, "kaminpar_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    print(out)
    return out


if __name__ == "__main__":
    main()
