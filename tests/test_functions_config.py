"""Cast matrix (ColumnCast parity), job-spec extras (preSql/hooks/masking)."""

from __future__ import annotations

import datetime as dt

from datax_3_0_0_src_spark.config import JobSpec, mask_secrets, run_job
from datax_3_0_0_src_spark.functions import (
    as_bool, as_bytes, as_long, as_timestamp, to_timestamp_multi,
)


def test_as_long_matrix(spark):
    df = spark.createDataFrame(
        [("42",), ("185.22",), ("-7.9",), ("true",), ("false",), ("garbage",), (None,)],
        "v string",
    )
    out = [r[0] for r in df.select(as_long("v")).collect()]
    # doubles truncate toward zero; bools 1/0; garbage -> null (dirty routing)
    assert out == [42, 185, -7, 1, 0, None, None]


def test_as_bool_and_bytes(spark):
    df = spark.createDataFrame([("TRUE",), ("0",), ("x",)], "v string")
    assert [r[0] for r in df.select(as_bool("v")).collect()] == [True, False, None]
    b = df.select(as_bytes("v")).collect()[0][0]
    assert bytes(b) == b"TRUE"


def test_timestamp_cascade(spark):
    df = spark.createDataFrame(
        [("2024-01-02 03:04:05",), ("2024/01/02 03:04:05",), ("2024-01-02",),
         ("1704164645000",), ("nope",)],
        "v string",
    )
    out = [r[0] for r in df.select(to_timestamp_multi("v")).collect()]
    assert out[0] == dt.datetime(2024, 1, 2, 3, 4, 5)
    assert out[1] == dt.datetime(2024, 1, 2, 3, 4, 5)
    assert out[2] == dt.datetime(2024, 1, 2)
    assert out[3] == dt.datetime(2024, 1, 2, 3, 4, 5)  # epoch millis
    assert out[4] is None
    df2 = spark.createDataFrame([(1704164645000,)], "v long")
    assert df2.select(as_timestamp("v")).collect()[0][0] == dt.datetime(2024, 1, 2, 3, 4, 5)


def test_mask_secrets():
    conf = {"jdbcUrl": "x", "password": "hunter2",
            "nested": [{"accessKeyId": "AK", "table": "t"}]}
    m = mask_secrets(conf)
    assert m["password"] == "*****"
    assert m["nested"][0]["accessKeyId"] == "*****"
    assert m["nested"][0]["table"] == "t"


def test_job_presql_postsql_hooks(spark, tmp_path):
    calls = []
    spark.range(3).createOrReplaceTempView("presql_src")
    run_job(
        spark,
        {
            "job": {
                "setting": {},
                "content": [{
                    "reader": {"name": "parquet",
                               "parameter": {"path": "/root/testdata/sf0.001/region.parquet"}},
                    "writer": {"name": "parquet",
                               "parameter": {"path": str(tmp_path / "o"),
                                             "writeMode": "truncate",
                                             "preSql": ["SELECT count(*) FROM presql_src"],
                                             "postSql": ["SELECT 1"],
                                             "password": "s3cret"}},
                }],
            }
        },
        hooks=[lambda conf, res: calls.append(conf)],
    )
    assert len(calls) == 1
    assert calls[0]["writer"]["parameter"]["password"] == "*****"  # F17 masking


def test_as_decimal_precision_and_dirty_routing(spark):
    from datax_3_0_0_src_spark.functions import as_decimal

    df = spark.createDataFrame(
        [("123.456",), ("-0.004",), ("1e3",), ("garbage",), (None,)], "v string"
    )
    out = [r[0] for r in df.select(as_decimal("v", 20, 3)).collect()]
    import decimal
    D = decimal.Decimal
    assert out[0] == D("123.456")
    assert out[1] == D("-0.004")
    assert out[2] == D("1000.000")
    assert out[3] is None and out[4] is None  # dirty routing, not abort
    # overflow beyond precision -> null (OverFlowUtil guard semantics)
    big = spark.createDataFrame([("12345678901234567890123.4",)], "v string")
    assert big.select(as_decimal("v", 10, 2)).collect()[0][0] is None
