"""Build olake_spark.zip for ``spark-submit --py-files``.

Usage:
    python -m tools.package [out.zip]
    spark-submit --master spark://HOST:7077 \
        --py-files olake_spark.zip \
        run_job.py sync --config job.json

``run_job.py`` can be as small as::

    from olake_spark.cli import main
    import sys
    sys.exit(main(sys.argv[1:]))

The package is pure Python (numpy/pandas/pyarrow come from the
cluster's Python env), so a single zip ships the whole engine to
executors — the deployment shape the north rule mandates.
"""

from __future__ import annotations

import os
import sys
import zipfile

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str = "olake_spark.zip") -> str:
    pkg = os.path.join(HERE, "olake_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, HERE))
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "olake_spark.zip"
    print(build(out))
