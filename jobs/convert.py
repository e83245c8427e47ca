"""skyway-equivalent convert CLI (reference: src/main.rs:50-88).

    spark-submit --py-files skyway_spark.zip jobs/convert.py \
        [--from opl|json|xml|pbf] [--to opl|json|overpass|xml] \
        [--filter f.osmfilter]... --input in.opl --output out.json

Flag semantics match the reference CLI: --from/--to override the
file-extension inference (src/main.rs:23-48); each --filter file is
auto-detected as OSMFilter-then-CEL and applied in CLI order, each
filter seeing the previous one's mutations (src/main.rs:150-171);
`-` as input/output means stdin/stdout (src/readers/mod.rs:60-68,
src/main.rs:176-184). Output is serialized in canonical (type, id)
order — the reference's cross-blob order is nondeterministic
(par_bridge, src/readers/pbf.rs:145); ours is pinned (SURVEY §7.5).
"""

from __future__ import annotations

import argparse
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv: list[str] | None = None) -> int:
    from skyway_spark.functions.filter import apply_filters
    from skyway_spark.plans.session import get_spark
    from skyway_spark.sources import convert

    ap = argparse.ArgumentParser(prog="skyway-spark")
    ap.add_argument("--from", dest="from_fmt", choices=["opl", "json", "xml", "pbf"])
    ap.add_argument(
        "--to", dest="to_fmt", choices=["opl", "json", "overpass", "xml"]
    )
    ap.add_argument("--filter", action="append", default=[], metavar="FILE")
    ap.add_argument("--input", required=True, help="path or - for stdin")
    ap.add_argument("--output", required=True, help="path or - for stdout")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)

    spark = get_spark("skyway-convert", cpus=args.cpus)
    in_path = args.input
    if in_path == "-":
        if not args.from_fmt:
            ap.error("--from is required when reading stdin")
        tmp = tempfile.NamedTemporaryFile(
            "wb", suffix=f".{args.from_fmt}", delete=False
        )
        tmp.write(sys.stdin.buffer.read())
        tmp.close()
        in_path = tmp.name
    df, metadata = convert.read_elements(spark, in_path, args.from_fmt)

    programs = [Path(f).read_text() for f in args.filter]
    if programs:
        df = apply_filters(df, programs)

    if args.output == "-":
        if not args.to_fmt:
            ap.error("--to is required when writing stdout")
        sys.stdout.write(convert.serialize_string(df, args.to_fmt, metadata))
        sys.stdout.flush()
    else:
        convert.write_elements(df, args.output, args.to_fmt, metadata)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
