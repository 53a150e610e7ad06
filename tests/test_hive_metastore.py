"""Real Hive-metastore integration (A10/A18/A20 with an actual
metastore, like the reference's embedded-H2 pattern —
hive-site.xml:97-99). Runs in a SUBPROCESS because hive support must
be chosen at JVM/session creation and the shared test session uses the
in-memory catalog."""

from __future__ import annotations

import subprocess
import sys
import textwrap

import pytest

SCRIPT = textwrap.dedent(
    """
    import sys, tempfile, os
    sys.path.insert(0, "/root/repo")
    d = tempfile.mkdtemp()
    os.chdir(d)  # derby metastore_db + warehouse land here
    from cascading_hive_spark.session import get_session
    spark = get_session(
        "hive-it", master="local[2]", shuffle_partitions=2, hive_support=True,
        extra_conf={"spark.sql.warehouse.dir": os.path.join(d, "wh")},
    )
    assert spark.conf.get("spark.sql.catalogImplementation") == "hive", \\
        spark.conf.get("spark.sql.catalogImplementation")
    from cascading_hive_spark import catalog as C
    from cascading_hive_spark.tables import load_table
    region = load_table(spark, "/root/testdata/sf0.001", "region")
    C.create_table(spark, "hive_region", region)
    assert spark.table("hive_region").count() == 5
    # publish/SET LOCATION against the real metastore
    p2 = os.path.join(d, "v2")
    C.publish(spark, region.limit(3), "hive_region_pub", p2)
    assert spark.table("hive_region_pub").count() == 3
    C.drop_table(spark, "hive_region")
    C.drop_table(spark, "hive_region_pub")
    print("HIVE_METASTORE_OK")
    """
)


@pytest.mark.slow
def test_hive_metastore_roundtrip():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert "HIVE_METASTORE_OK" in proc.stdout, (
        f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-3000:]}"
    )
