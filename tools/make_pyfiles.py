"""Build the --py-files archive for cluster submission.

    python tools/make_pyfiles.py [out.zip]
    spark-submit --py-files pdf_extractor_spark.zip pdf_extractor_spark/job.py ...

Zips the pdf_extractor_spark package (sources only) so executors can import
the kernel inside mapInPandas workers on a real cluster, where the repo
checkout doesn't exist on worker nodes.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> str:
    pkg = os.path.join(REPO, "pdf_extractor_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(pkg):
            dirs.sort()  # deterministic archive bytes across filesystems
            if "__pycache__" in root:
                continue
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                zf.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "pdf_extractor_spark.zip")
    print(build(out))
