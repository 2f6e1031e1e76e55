"""Build ``dist/hoover_spark.zip`` for ``spark-submit --py-files``.

The north rule runs the engine "via spark-submit --py-files on
multi-executor clusters"; this is the artifact that ships the package
to every executor's PYTHONPATH.  Pure-stdlib, deterministic ordering
(stable zip bytes for identical sources → cluster-side caching works).

Usage: python tools/package.py [out_dir]
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def build(out_dir: Path | str | None = None) -> Path:
    out_dir = Path(out_dir) if out_dir else REPO / "dist"
    out_dir.mkdir(parents=True, exist_ok=True)
    out = out_dir / "hoover_spark.zip"
    pkg = REPO / "hoover_spark"
    files = sorted(p for p in pkg.rglob("*.py") if "__pycache__" not in p.parts)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in files:
            info = zipfile.ZipInfo(str(p.relative_to(REPO)))  # fixed mtime
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, p.read_bytes())
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
