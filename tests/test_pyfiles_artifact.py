"""The spark-submit --py-files artifact must always match the source
tree (north rule: the job ships as ``spark-submit --py-files
dist/webpeel_spark.zip``).  dist/ is gitignored, so a stale zip after
editing webpeel_spark/ is invisible to git — it bit a round-7 session.
This test REBUILDS the artifact (build() is idempotent, <1s) and then
verifies it byte-matches every module in the package, so any pytest
run leaves a current artifact behind and a packaging bug (missed
directory, filtered file) fails loudly.
"""

from __future__ import annotations

import os
import zipfile

from tools.package_pyfiles import REPO, build


def _source_modules():
    pkg_root = os.path.join(REPO, "webpeel_spark")
    out = {}
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        for fn in filenames:
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                out[os.path.relpath(full, REPO)] = full
    return out


def test_zip_rebuilds_and_matches_source_tree():
    path = build()
    src = _source_modules()
    assert len(src) > 50  # the package, not an empty walk
    with zipfile.ZipFile(path) as zf:
        names = set(zf.namelist())
        missing = set(src) - names
        extra = {n for n in names if n.endswith(".py")} - set(src)
        assert not missing, f"zip is missing modules: {sorted(missing)}"
        assert not extra, f"zip has orphan modules: {sorted(extra)}"
        for arc, full in src.items():
            with open(full, "rb") as f:
                assert zf.read(arc) == f.read(), f"stale bytes: {arc}"


def test_zip_is_importable_package_layout():
    # every directory reachable in the zip carries an __init__.py so
    # executors can import subpackages (zipimport needs the marker)
    path = build()
    with zipfile.ZipFile(path) as zf:
        names = set(zf.namelist())
    dirs = {os.path.dirname(n) for n in names if "/" in n}
    for d in dirs:
        assert f"{d}/__init__.py" in names, f"{d} lacks __init__.py"
