"""SQL surface: spark.sql over the registered engine views equals the
DataFrame API, including merge-on-read and delete semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from btrdb_spark.engine import BTrDBEngine


def test_sql_views_match_dataframe_api(spark, tmp_path):
    eng = BTrDBEngine(spark, str(tmp_path / "store"))
    u = eng.create_stream("sql/demo", tags={"unit": "v"})
    eng.insert(u, [(i * 10, float(i)) for i in range(100)])
    eng.flush(u)
    eng.delete_range(u, 200, 400)          # tombstone a range
    eng.insert(u, [(995, 42.0)])           # unflushed hot row (merge-on-read)

    eng.register_sql_views()
    got = spark.sql(
        f"SELECT time, value FROM btrdb_points WHERE uuid = '{u}' "
        "AND time >= 0 AND time < 1000 ORDER BY time"
    ).collect()
    want = eng.raw_values(u, 0, 1000).select("time", "value").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    # the deleted range is invisible, the hot row is visible
    times = {r["time"] for r in got}
    assert not any(200 <= t < 400 for t in times)
    assert 995 in times

    # metadata plane through SQL
    row = spark.sql(
        "SELECT collection, tags['unit'] AS unit FROM btrdb_streams"
    ).collect()[0]
    assert row["collection"] == "sql/demo" and row["unit"] == "v"

    # the SQL plan prunes like the API: uuid/time predicates reach the scan
    plan = spark.sql(
        f"SELECT time, value FROM btrdb_points WHERE uuid = '{u}' AND time >= 500"
    )._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PushedFilters" in plan and "GreaterThanOrEqual(time,500)" in plan
