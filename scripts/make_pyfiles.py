"""Package the engine for ``spark-submit --py-files`` deployment.

Produces ``dist/crawlers_spark.zip`` containing the package (sources
only). Cluster launch then looks like:

    spark-submit \\
      --master spark://<host>:7077 \\
      --py-files dist/crawlers_spark.zip \\
      --conf spark.sql.adaptive.enabled=true \\
      --conf spark.sql.shuffle.partitions=<2-3x total cores> \\
      scripts/run_crawl.py <n_pages> <cores> <state_dir>

(the same entry script used locally — it only touches the engine via
the packaged API, so the zip is the entire deployment unit).
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def build(out: Path | None = None) -> Path:
    out = out or REPO / "dist" / "crawlers_spark.zip"
    out.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for py in sorted((REPO / "crawlers_spark").rglob("*.py")):
            z.write(py, py.relative_to(REPO))
        for py in sorted((REPO / "fixtures").rglob("*.py")):
            z.write(py, py.relative_to(REPO))
        # fixture generation pins its expected-offers oracle under tests/
        for py in sorted((REPO / "tests").rglob("*.py")):
            z.write(py, py.relative_to(REPO))
    return out


if __name__ == "__main__":
    dest = build(Path(sys.argv[1]) if len(sys.argv) > 1 else None)
    print(dest)
