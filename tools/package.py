"""Build the ``--py-files`` artifact the jobs/ entry points ship with.

``spark-submit --py-files search_engine_spark.zip jobs/<job>.py ...`` is the
deployment shape (north rule): the driver script is the job file, the
engine travels as one zip importable on every executor's PYTHONPATH. This
packages ONLY the package's .py sources (no tests, no caches, no repo
metadata), deterministically ordered so rebuilds of the same tree are
byte-identical, and smoke-checks the result with a real zipimport in a
clean interpreter.

Usage: python tools/package.py [out.zip]   (default: ./search_engine_spark.zip)
"""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "search_engine_spark"


DATA_EXT = (".py", ".tsv", ".txt", ".json")  # sources + runtime data files


def build(out_path: str) -> list[str]:
    names: list[str] = []
    for root, dirs, files in os.walk(os.path.join(REPO, PKG)):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if f.endswith(DATA_EXT):
                full = os.path.join(root, f)
                names.append(os.path.relpath(full, REPO))
    tmp = out_path + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
        for rel in names:
            # fixed timestamp -> reproducible archive for identical sources
            info = zipfile.ZipInfo(rel, date_time=(1980, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            with open(os.path.join(REPO, rel), "rb") as fh:
                z.writestr(info, fh.read())
    os.replace(tmp, out_path)
    return names


def smoke(out_path: str) -> None:
    """Import the engine from the zip alone (executor-side condition)."""
    code = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        f"import {PKG}.operators.rank, {PKG}.sources.segments, "
        f"{PKG}.functions.analyzers, {PKG}.operators.serving; "
        # data files must be reachable through the zip (langid fixture)
        f"from {PKG}.functions.langid import load_training_pairs; "
        "pairs = load_training_pairs(); assert pairs, 'empty langid fixture'; "
        f"print('zipimport ok:', {PKG}.__name__, len(pairs), 'train pairs')"
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    subprocess.run(
        [sys.executable, "-c", code, os.path.abspath(out_path)],
        check=True, cwd="/", env=env,
    )


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "search_engine_spark.zip"
    )
    names = build(out)
    smoke(out)
    print(f"{out}: {len(names)} files, {os.path.getsize(out)} bytes")


if __name__ == "__main__":
    main()
