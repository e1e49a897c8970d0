"""Package publicationsretriever_spark as a --py-files zip.

Usage: python tools/make_pyfiles.py [out.zip]
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "build/publicationsretriever_spark.zip"
    out.parent.mkdir(parents=True, exist_ok=True)
    pkg = REPO / "publicationsretriever_spark"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted(pkg.rglob("*.py")):
            zf.write(py, py.relative_to(REPO))
    print(out)


if __name__ == "__main__":
    main()
