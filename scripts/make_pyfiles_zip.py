"""Package ``auctus_spark`` into ``auctus_spark.zip`` for
``spark-submit --py-files`` (executors unpack it onto their
PYTHONPATH — no install step on the cluster)."""

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    out = os.path.join(REPO, "auctus_spark.zip")
    pkg = os.path.join(REPO, "auctus_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    print(out)
    return out


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
