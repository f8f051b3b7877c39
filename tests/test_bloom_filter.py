"""Parquet bloom filters — SURVEY §7's config-only answer to point
lookups on high-cardinality string columns (the F1 family): enable at
write time, verify the footer carries the filter."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from mirrulations_iceberg_spark.tables import load_table

from .conftest import SF_DIR


def test_bloom_filter_written_and_readable(spark, tmp_path):
    out = str(tmp_path / "docs_bloom")
    docs = load_table(spark, SF_DIR, "documents")
    # NOTE: the per-column `parquet.bloom.filter.enabled#col` form is
    # ignored by this parquet-mr build (verified: byte-identical output);
    # the all-columns switch is the supported path here.
    (
        docs.coalesce(1)
        .write.option("parquet.bloom.filter.enabled", "true")
        .option("parquet.bloom.filter.expected.ndv", "1000")
        .parquet(out)
    )
    files = glob.glob(f"{out}/*.parquet")
    assert files
    # this pyarrow build doesn't expose bloom_filter_offset; the filter's
    # presence shows as extra bytes vs an identical bloom-less write
    plain = str(tmp_path / "docs_plain")
    docs.coalesce(1).write.parquet(plain)
    bloom_bytes = sum(os.path.getsize(f) for f in files)
    plain_bytes = sum(
        os.path.getsize(f) for f in glob.glob(f"{plain}/*.parquet")
    )
    assert bloom_bytes > plain_bytes
    meta = pq.ParquetFile(files[0]).metadata
    assert meta.num_rows == docs.count()
    # and the table still reads + filters correctly
    back = spark.read.parquet(out).filter(F.col("source") == "src1")
    assert back.count() == docs.filter(F.col("source") == "src1").count()
