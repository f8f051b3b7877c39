"""Filesystem/credential pre-flight (M7's other half).

The reference checks read/list/write permissions before converting and
terminates early with a clear message (``convert_to_iceberg.py:
1197-1242``, ``PERMISSION_HANDLING.md:9-33``). The Spark re-expression
goes through the Hadoop ``FileSystem`` API instead of ``os.access`` /
boto: one code path for every scheme the cluster mounts — ``file://``
here, ``s3a://``/``hdfs://``/``abfs://`` in production — and the
probe exercises the exact connector+credential chain the subsequent
job will use (an ``os.access`` pass can still precede an S3 403; a
``FileSystem`` probe cannot).

Checks, mirroring the reference's list:

* input exists            (fs.getFileStatus)
* input listable/readable (fs.listStatus — covers read+execute)
* output writable         (create + delete a probe file, the
                           reference's own ``.test_write_permission``
                           trick — works on object stores where
                           directory permissions don't exist)
* committer sanity        (non-``file`` output schemes report the
                           configured committer factory so a user sees
                           up front when the default file committer
                           would rename-copy on an object store)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

PROBE_NAME = "._miis_preflight_probe"


@dataclass
class Check:
    name: str
    ok: bool
    detail: str
    #: advisory checks inform (committer tuning) but must not block the
    #: run — a default file committer on an object store is slow, not
    #: broken. Callers gate on ``not ok and not advisory``.
    advisory: bool = False


def _fs_for(spark: SparkSession, path: str):
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf), p, jvm


def fs_preflight(
    spark: SparkSession, data_path: str, out_path: str
) -> list[Check]:
    """Run every check; never raises — callers decide on the report."""
    checks: list[Check] = []

    # _fs_for itself can throw (unsupported scheme — e.g. s3a:// with no
    # connector jar on the classpath — or a malformed URI). That is
    # precisely the misconfiguration preflight exists to report, so it
    # becomes a failed check rather than a raw Py4J traceback
    # (ADVICE r8).
    try:
        fs, p, jvm = _fs_for(spark, data_path)
    except Exception as exc:
        checks.append(Check("input_fs_resolvable", False, _msg(exc)))
        checks.append(Check("input_exists", False, "skipped: fs unresolvable"))
        checks.append(Check("input_listable", False, "skipped: fs unresolvable"))
        fs = None
    if fs is not None:
        try:
            fs.getFileStatus(p)
            checks.append(Check("input_exists", True, data_path))
        except Exception as exc:
            checks.append(Check("input_exists", False, _msg(exc)))
            checks.append(
                Check("input_listable", False, "skipped: input missing")
            )
        else:
            try:
                n = len(fs.listStatus(p))
                checks.append(Check("input_listable", True, f"{n} entries"))
            except Exception as exc:
                checks.append(Check("input_listable", False, _msg(exc)))

    try:
        ofs, op, jvm = _fs_for(spark, out_path)
    except Exception as exc:
        checks.append(Check("output_fs_resolvable", False, _msg(exc)))
        checks.append(Check("output_writable", False, "skipped: fs unresolvable"))
        return checks
    try:
        probe = jvm.org.apache.hadoop.fs.Path(op, PROBE_NAME)
        out = ofs.create(probe, True)
        out.write(bytearray(b"probe"))
        out.close()
        ofs.delete(probe, False)
        checks.append(Check("output_writable", True, out_path))
    except Exception as exc:
        checks.append(Check("output_writable", False, _msg(exc)))

    scheme = op.toUri().getScheme() or "file"
    if scheme != "file":
        factory_key = (
            f"mapreduce.outputcommitter.factory.scheme.{scheme}"
        )
        conf = spark._jsc.hadoopConfiguration()
        factory = conf.get(factory_key, "")
        checks.append(
            Check(
                "object_store_committer",
                bool(factory),
                factory or f"{factory_key} unset - default file committer "
                "rename-copies on object stores",
                advisory=True,
            )
        )
    return checks


def _msg(exc: Exception) -> str:
    # Py4J wraps Hadoop exceptions; the first line carries the message.
    # Guard the empty-str() case (e.g. a wrapped NPE with no text) so
    # fs_preflight keeps its never-raises contract.
    return (str(exc).splitlines() or [f"<{type(exc).__name__}>"])[0][:200]


def preflight_df(
    spark: SparkSession, data_path: str, out_path: str
) -> DataFrame:
    """The checks as a DataFrame (m7-report shape) for programmatic use."""
    rows = [
        (c.name, c.ok, c.detail, c.advisory)
        for c in fs_preflight(spark, data_path, out_path)
    ]
    return spark.createDataFrame(
        rows, "check string, ok boolean, detail string, advisory boolean"
    )
