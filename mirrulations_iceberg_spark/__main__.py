"""CLI entry point mirroring the reference's conversion surface.

``python -m mirrulations_iceberg_spark convert <data-path>
--output-path <out> [--agency CMS] [--compression zstd]`` is the
Spark re-expression of the reference's argparse surface
(``convert_to_iceberg.py:1294-1341``: data_path / --output-path /
--agency / --compression). Differences, deliberate:

- ``--compression`` offers the codecs Spark's default build ships
  (zstd stands in for brotli — see ``operators/maintenance.py:35``).
- ``--comment-threshold`` / ``--debug`` progress-bar knobs don't
  apply: Spark reports progress through its own UI/event log, and the
  pipeline is three declarative jobs, not a per-docket loop.
- ``--master`` / ``--shuffle-partitions`` expose the Spark session
  knobs a cluster user would otherwise set via spark-submit.
"""

from __future__ import annotations

import argparse
import sys


def _build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="python -m mirrulations_iceberg_spark",
        description="Spark-native Mirrulations analytics engine",
    )
    sub = parser.add_subparsers(dest="command", required=True)
    conv = sub.add_parser(
        "convert",
        help="Convert a Mirrulations docket tree to partitioned parquet",
    )
    conv.add_argument(
        "data_path",
        help="Path to the docket tree root (local dir or s3a:// URI)",
    )
    conv.add_argument(
        "--output-path",
        required=True,
        help="Output directory for the flattened tables (local or s3a://)",
    )
    conv.add_argument(
        "--agency",
        help="Process only a specific agency (e.g. 'CMS', 'DEA')",
    )
    conv.add_argument(
        "--compression",
        default="zstd",
        choices=["snappy", "gzip", "zstd", "lz4"],
        help="Parquet codec (zstd stands in for the reference's brotli)",
    )
    conv.add_argument(
        "--master",
        default="local[*]",
        help="Spark master URL (default local[*])",
    )
    conv.add_argument(
        "--shuffle-partitions",
        type=int,
        default=None,
        help="spark.sql.shuffle.partitions override",
    )
    return parser


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    if args.command != "convert":  # pragma: no cover - argparse enforces
        return 2

    from .etl.pipeline import run_pipeline
    from .etl.preflight import fs_preflight
    from .session import get_spark

    kwargs = {"app_name": "mirrulations-convert", "master": args.master}
    if args.shuffle_partitions is not None:
        kwargs["shuffle_partitions"] = args.shuffle_partitions
    spark = get_spark(**kwargs)
    # Pre-flight before any job starts (the reference's early-
    # termination contract, convert_to_iceberg.py:1197-1242): a
    # permission problem should cost seconds, not a failed hour-long
    # conversion.
    checks = fs_preflight(spark, args.data_path, args.output_path)
    for c in checks:
        if not c.ok and c.advisory:
            print(f"Pre-flight warning: {c.name}: {c.detail}", file=sys.stderr)
    failed = [c for c in checks if not c.ok and not c.advisory]
    if failed:
        for c in failed:
            print(f"Pre-flight check failed: {c.name}: {c.detail}", file=sys.stderr)
        print(
            "Please ensure you have read access to the data directory "
            "and write access to the output directory.",
            file=sys.stderr,
        )
        return 1
    try:
        result = run_pipeline(
            spark,
            args.data_path,
            args.output_path,
            codec=args.compression,
            agency=args.agency,
        )
    except Exception as exc:  # noqa: BLE001 - CLI boundary
        print(f"Conversion failed: {exc}", file=sys.stderr)
        return 1
    for table, n in sorted(result.counts.items()):
        print(f"{table}: {n} rows")
    print(f"quarantined: {result.quarantined} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
