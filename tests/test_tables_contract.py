"""Loader contract: ``load_table`` must yield identical micro-precision
TIMESTAMP values for ``events`` no matter which physical shape the
driver materialized — TIMESTAMP(NANOS), timestamp[us], or a raw int64
of epoch-nanos. Round 4 regressed because nothing pinned this against
the actual bytes on disk when the generator switched nanos → micros.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cascading_hive_spark.tables import events_ts_stored_as_nanos, load_table

_US = [
    1_700_000_000_000_000,
    1_700_000_123_456_789,
    1_700_086_400_000_001,
]
_ROWS = {
    "event_id": [1, 2, 3],
    "user_id": [10, 20, 30],
    "event_type": ["click", "view", "click"],
    "value": [1.5, 2.5, 3.5],
    "props": ["{}", "{}", "{}"],
}


def _write_events(dirpath, ts_array):
    cols = {"event_id": _ROWS["event_id"], "ts": ts_array}
    cols.update({k: v for k, v in _ROWS.items() if k != "event_id"})
    pq.write_table(pa.table(cols), str(dirpath / "events.parquet"))
    return str(dirpath)


@pytest.fixture(scope="module")
def shapes(tmp_path_factory):
    out = {}
    d = tmp_path_factory.mktemp("ev_us")
    out["micros"] = _write_events(d, pa.array(_US, type=pa.timestamp("us")))
    d = tmp_path_factory.mktemp("ev_ns")
    out["nanos"] = _write_events(
        d, pa.array([u * 1000 for u in _US], type=pa.timestamp("ns"))
    )
    d = tmp_path_factory.mktemp("ev_i64")
    out["int64"] = _write_events(d, pa.array([u * 1000 for u in _US], type=pa.int64()))
    return out


def test_footer_probe(shapes):
    assert not events_ts_stored_as_nanos(shapes["micros"] + "/events.parquet")
    assert events_ts_stored_as_nanos(shapes["nanos"] + "/events.parquet")
    assert events_ts_stored_as_nanos(shapes["int64"] + "/events.parquet")


def test_all_shapes_load_identically(spark, shapes):
    expected = [dt.datetime.fromtimestamp(u / 1e6, dt.timezone.utc).replace(tzinfo=None) for u in _US]
    for shape, d in shapes.items():
        df = load_table(spark, d, "events")
        assert df.schema["ts"].dataType.typeName() == "timestamp", shape
        got = [r.ts for r in df.select("ts").orderBy("event_id").collect()]
        assert got == expected, shape


def test_driver_data_loads(spark, sf_dir):
    """The actual driver file, whatever shape it currently is."""
    df = load_table(spark, sf_dir, "events")
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    assert df.limit(5).count() > 0


def test_every_table_loads_at_every_sf(spark):
    """Round-4 lesson generalized: every driver table must at least
    analyze and yield a row at every scale factor the driver ships, so
    an upstream data-shape change surfaces here instead of as 40
    downstream query crashes."""
    import os

    from cascading_hive_spark.tables import TABLES

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        d = f"/root/testdata/{sf}"
        if not os.path.isdir(d):
            continue
        for name in TABLES:
            df = load_table(spark, d, name)
            assert df.limit(1).count() == 1, (sf, name)
