"""Package the engine for ``spark-submit --py-files``:

    python bin/make_pyfiles.py            # -> dist/engine.zip
    spark-submit --py-files dist/engine.zip bin/run_pagerank.py ...

The zip holds only the library package (no tests/tools), mirroring what a
cluster deployment ships to executors.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "montecarlopagerank_spark"


def main() -> str:
    out_dir = os.path.join(REPO, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "engine.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            for f in sorted(files):
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    zf.write(p, os.path.relpath(p, REPO))
    print(out)
    return out


if __name__ == "__main__":
    main()
