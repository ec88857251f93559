"""Custom-transformer SPI: register_transformer parity with DataX's
TransformerRegistry.registTransformer (user UDFs reachable from a job spec)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from datax_3_0_0_src_spark.config import run_job
from datax_3_0_0_src_spark.operators.transformers import (
    TRANSFORMERS, register_transformer, transformer_names,
)


@pandas_udf(StringType())
def _rev_udf(s: pd.Series) -> pd.Series:
    return s.str[::-1]


def setup_module():
    # the dx_groovy-style escape hatch: an Arrow pandas_udf behind a name
    @register_transformer("dx_reverse")
    def dx_reverse(df, column_name, paras):
        return df.withColumn(column_name, _rev_udf(F.col(column_name)))

    @register_transformer("dx_suffix")
    def dx_suffix(df, column_name, paras):
        return df.withColumn(column_name, F.concat(F.col(column_name), F.lit(paras[0])))


def teardown_module():
    TRANSFORMERS.pop("dx_reverse", None)
    TRANSFORMERS.pop("dx_suffix", None)


def test_registry_contents():
    assert "dx_reverse" in transformer_names()
    with pytest.raises(ValueError):
        register_transformer("dx_reverse")(lambda df, c, p: df)  # dup name rejected


def test_job_spec_reaches_custom_transformers(spark, tmp_path):
    src = str(tmp_path / "src.parquet")
    spark.createDataFrame(
        [(1, "abc"), (2, "wxyz")], "id long, name string"
    ).write.parquet(src)
    out = str(tmp_path / "out.parquet")
    run_job(spark, {
        "job": {"content": [{
            "reader": {"name": "parquet", "parameter": {"path": src}},
            "transformer": [
                {"name": "dx_reverse", "parameter": {"columnName": "name"}},
                {"name": "dx_suffix", "parameter": {"columnName": "name",
                                                    "paras": ["!"]}},
            ],
            "writer": {"name": "parquet", "parameter": {"path": out}},
        }]},
    })
    got = {r["id"]: r["name"] for r in spark.read.parquet(out).collect()}
    assert got == {1: "cba!", 2: "zyxw!"}


def test_unknown_transformer_raises(spark, tmp_path):
    src = str(tmp_path / "src2.parquet")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(src)
    with pytest.raises(KeyError, match="dx_nope"):
        run_job(spark, {
            "job": {"content": [{
                "reader": {"name": "parquet", "parameter": {"path": src}},
                "transformer": [{"name": "dx_nope",
                                 "parameter": {"columnName": "name"}}],
                "writer": {"name": "console", "parameter": {}},
            }]},
        })


def test_job_spec_class_loading(spark, tmp_path):
    """Plugin-style dynamic transformer load: the job spec names
    module:function (LoadUtil plugin-descriptor equivalent)."""
    import sys

    mod = tmp_path / "user_tx_mod.py"
    mod.write_text(
        "from pyspark.sql import functions as F\n"
        "def dx_upper_dyn(df, column_name, paras):\n"
        "    return df.withColumn(column_name, F.upper(F.col(column_name)))\n"
    )
    sys.path.insert(0, str(tmp_path))
    try:
        src = str(tmp_path / "src.parquet")
        spark.createDataFrame([(1, "ab")], "id long, name string").write.parquet(src)
        out = str(tmp_path / "out.parquet")
        run_job(spark, {
            "job": {"content": [{
                "reader": {"name": "parquet", "parameter": {"path": src}},
                "transformer": [{"name": "dx_upper_dyn",
                                 "class": "user_tx_mod:dx_upper_dyn",
                                 "parameter": {"columnName": "name"}}],
                "writer": {"name": "parquet", "parameter": {"path": out}},
            }]},
        })
        got = spark.read.parquet(out).collect()
        assert got[0]["name"] == "AB"
    finally:
        sys.path.remove(str(tmp_path))
        TRANSFORMERS.pop("dx_upper_dyn", None)


def test_job_spec_class_conflict_rejected(spark, tmp_path):
    """ADVICE fix: a job spec naming a class for an ALREADY-REGISTERED
    transformer name with a different target must raise (the reference's
    isConfliction check), never silently ignore the spec's class."""
    import sys

    mod = tmp_path / "user_tx_conflict.py"
    mod.write_text(
        "from pyspark.sql import functions as F\n"
        "def one(df, column_name, paras):\n"
        "    return df.withColumn(column_name, F.upper(F.col(column_name)))\n"
        "def two(df, column_name, paras):\n"
        "    return df.withColumn(column_name, F.lower(F.col(column_name)))\n"
    )
    sys.path.insert(0, str(tmp_path))
    try:
        src = str(tmp_path / "src3.parquet")
        spark.createDataFrame([(1, "aB")], "id long, name string").write.parquet(src)

        def job(class_ref, out):
            return {
                "job": {"content": [{
                    "reader": {"name": "parquet", "parameter": {"path": src}},
                    "transformer": [{"name": "dx_conf",
                                     "class": class_ref,
                                     "parameter": {"columnName": "name"}}],
                    "writer": {"name": "parquet", "parameter": {"path": out}},
                }]},
            }

        run_job(spark, job("user_tx_conflict:one", str(tmp_path / "o1.parquet")))
        # same name, same class: fine (cached); different class: rejected
        run_job(spark, job("user_tx_conflict:one", str(tmp_path / "o2.parquet")))
        with pytest.raises(ValueError, match="conflicting"):
            run_job(spark, job("user_tx_conflict:two", str(tmp_path / "o3.parquet")))
    finally:
        sys.path.remove(str(tmp_path))
        TRANSFORMERS.pop("dx_conf", None)
        from datax_3_0_0_src_spark.operators.transformers import _SPI_CLASS_REFS
        _SPI_CLASS_REFS.pop("dx_conf", None)
