"""Build skyway_spark.zip for `spark-submit --py-files`.

    python tools/build_zip.py [out.zip]

Zips the skyway_spark package (source only, no caches) with
deterministic entry order and timestamps, so repeated builds of the
same tree are byte-identical (reproducible deploys).

    spark-submit --py-files skyway_spark.zip jobs/run_pipeline.py ...
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def build(out: str | Path = ROOT / "skyway_spark.zip") -> Path:
    out = Path(out)
    files = sorted(
        p
        for p in (ROOT / "skyway_spark").rglob("*.py")
        if "__pycache__" not in p.parts
    )
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in files:
            info = zipfile.ZipInfo(str(p.relative_to(ROOT)), date_time=(2020, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            z.writestr(info, p.read_bytes())
    return out


if __name__ == "__main__":
    print(build(*(sys.argv[1:2] or [])))
