"""Build the --py-files artifact for cluster submission.

The north rule ships the job as ``spark-submit --py-files`` on a
multi-executor cluster; this produces the zip executors import
webpeel_spark from:

    python tools/package_pyfiles.py            # → dist/webpeel_spark.zip
    spark-submit --py-files dist/webpeel_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        your_job.py

Pure stdlib; excludes caches and tests (executors only need the
package).
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "webpeel_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg_root = os.path.join(REPO, "webpeel_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(pkg_root):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                arc = os.path.relpath(full, REPO)
                zf.write(full, arc)
    return out_path


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else None)
    size = os.path.getsize(path)
    print(f"wrote {path} ({size // 1024} KiB)")
