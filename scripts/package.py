"""Build the spark-submit --py-files artifact (north rule: "Packaged for
spark-submit --py-files").

Produces dist/rastr_spark.zip containing the pure-Python package (deps: only
numpy/pandas, both preinstalled on executors). Usage:

    python scripts/package.py
    spark-submit --py-files dist/rastr_spark.zip your_job.py
"""

from __future__ import annotations

import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def main() -> Path:
    dist = ROOT / "dist"
    dist.mkdir(exist_ok=True)
    out = dist / "rastr_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted((ROOT / "rastr_spark").rglob("*.py")):
            z.write(p, p.relative_to(ROOT))
    print(f"wrote {out} ({out.stat().st_size} bytes)")
    return out


if __name__ == "__main__":
    main()
