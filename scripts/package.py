"""Build dist/engine.zip for ``spark-submit --py-files`` deployment.

The north rule requires the job be "packaged for spark-submit --py-files"
(BASELINE.json). This produces a deterministic zip of the
``ocr_text_recognition_spark`` package (source .py only, no __pycache__)
that ships to every executor's PYTHONPATH:

    python scripts/package.py
    spark-submit --py-files dist/engine.zip jobs/extract.py ...

tests/test_spark_submit.py drives this end-to-end against a real
spark-submit subprocess.
"""

from __future__ import annotations

import os
import zipfile


def build(repo_root: str | None = None, out: str | None = None) -> str:
    repo_root = repo_root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = out or os.path.join(repo_root, "dist", "engine.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(repo_root, "ocr_text_recognition_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, filenames in sorted(os.walk(pkg)):
            dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
            for f in sorted(filenames):
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, repo_root))
    return out


if __name__ == "__main__":
    print(build())
