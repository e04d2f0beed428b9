"""Package search_engine_spark into dist/search_engine_spark.zip for
spark-submit --py-files (includes the stopwords data file)."""

from __future__ import annotations

import os
import zipfile


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "search_engine_spark")
    os.makedirs(os.path.join(root, "dist"), exist_ok=True)
    out = os.path.join(root, "dist", "search_engine_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in files:
                if fn.endswith((".pyc",)):
                    continue
                full = os.path.join(dirpath, fn)
                z.write(full, os.path.relpath(full, root))
    print(out)


if __name__ == "__main__":
    main()
