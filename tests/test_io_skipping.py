"""Measured row-group / SARG skip gate (r14 VERDICT #3): the
reference trusts `hive.optimize.index.filter=true` (hive-site.xml:
52-55) to skip ORC stripes under selective predicates; Spark's
parquet reader prunes row groups by footer min/max and its ORC
reader pushes SearchArguments the same way. Until now that intent
was taken on faith — this gate MEASURES it, the A3 precedent
(tests/test_hive_metastore.py:226): write a range-sorted table,
scan once with and once without a selective predicate, and pin the
bytes-read ratio. A Spark upgrade (or a conf regression) that
silently stops skipping fails loudly.

Measurement note: this Spark build's vectorized parquet/ORC data
path bypasses Hadoop FileSystem statistics (only ~40 KB of footer
reads register there), so the gate counts at the OS level — the
JVM's /proc/<pid>/io rchar, which tracks read() bytes whether or not
they hit the page cache. Runs in a subprocess for a quiet JVM whose
IO is dominated by the scans under test.
"""

from __future__ import annotations

import subprocess
import sys
import textwrap

import pytest

SKIP_SCRIPT = textwrap.dedent(
    """
    import sys, tempfile, os
    sys.path.insert(0, "/root/repo")
    d = tempfile.mkdtemp()
    from cascading_hive_spark.session import get_session
    spark = get_session(
        "sarg-skip-it", master="local[2]", shuffle_partitions=2,
        extra_conf={
            # pin the two skip switches this gate certifies, so a
            # default flip in a future Spark shows up as a conf diff
            # here rather than a silent full-scan regression
            "spark.sql.parquet.filterPushdown": "true",
            "spark.sql.orc.filterPushdown": "true",
        },
    )
    from pyspark.sql import functions as F

    # range-sorted fat table: 8 disjoint id ranges, one file each,
    # ~200-byte payload so data pages dominate footers
    src = (
        spark.range(200_000)
        .select(
            F.col("id"),
            F.repeat(F.concat(F.lit("p|"), F.col("id").cast("string")), 24)
            .alias("payload"),
        )
        .repartitionByRange(16, "id")
        .sortWithinPartitions("id")
    )
    pq, orc = os.path.join(d, "pq"), os.path.join(d, "orc")
    src.write.parquet(pq)
    src.write.orc(orc)

    jpid = spark._jvm.java.lang.ProcessHandle.current().pid()
    def bytes_read():
        with open(f"/proc/{jpid}/io") as f:
            return int(next(l for l in f if l.startswith("rchar")).split()[1])

    def run(df):
        b0 = bytes_read()
        df.write.format("noop").mode("overwrite").save()
        return bytes_read() - b0

    # per-format pins: parquet row-group pruning measured 7.7-12x;
    # ORC SARG skipping measured 4.8x here — its floor is the per-file
    # tail+row-index reads, a fixed cost that amortizes at real
    # (100MB+) file sizes but is ~20% of these deliberately small
    # test files. Both pins fail loudly if skipping stops entirely
    # (ratio would drop to ~1x).
    for fmt, path, min_ratio in (("parquet", pq, 5), ("orc", orc, 3)):
        reader = spark.read.format(fmt).load(path)
        run(reader)  # warm class loading + page cache
        full = run(reader)
        sel = reader.filter(
            (F.col("id") >= 1000) & (F.col("id") < 2000)
        )
        # the predicate must actually reach the scan
        plan = sel._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [" in plan and "GreaterThanOrEqual(id,1000" in plan, plan
        run(sel)  # warm
        selective = run(sel)
        assert full > 2 * 1024 * 1024, (fmt, full)
        assert selective * min_ratio <= full, (fmt, selective, full)
        print(f"SKIP_OK {fmt} selective={selective} full={full} "
              f"ratio={full / max(selective, 1):.1f}")
    print("SARG_SKIP_GATE_OK")
    """
)


@pytest.mark.slow
def test_rowgroup_sarg_skip_measured():
    proc = subprocess.run(
        [sys.executable, "-c", SKIP_SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert "SARG_SKIP_GATE_OK" in proc.stdout, (
        f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-3000:]}"
    )
