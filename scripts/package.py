"""Build the --py-files artifact: dist/ocr_api_spark.zip (package zip,
no egg — north_rule launch contract)."""

from __future__ import annotations

import os
import zipfile


def build_zip(repo_root: str | None = None) -> str:
    repo_root = repo_root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dist = os.path.join(repo_root, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "ocr_api_spark.zip")
    pkg = os.path.join(repo_root, "ocr_api_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".pyc") or "__pycache__" in root:
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, repo_root))
    return out


if __name__ == "__main__":
    print(build_zip())
