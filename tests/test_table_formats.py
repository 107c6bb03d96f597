"""save_table / load_any: native formats, round-trips, partition pruning."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from tric_spark.sources.tables import NATIVE_FORMATS, load_any, save_table


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="tbl_fmt_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _df(spark):
    return spark.range(60).select(
        "id",
        (F.col("id") % 5).alias("grp"),
        F.md5(F.col("id").cast("string")).alias("h"),
    )


def test_roundtrip_all_native_formats(spark, tmpdir):
    df = _df(spark)
    exp = sorted(tuple(r) for r in df.collect())
    for fmt in NATIVE_FORMATS:
        p = os.path.join(tmpdir, fmt)
        save_table(df, p, fmt=fmt)
        back = load_any(spark, p, fmt=fmt, schema="id long, grp long, h string")
        got = sorted(tuple(r) for r in back.select("id", "grp", "h").collect())
        assert got == exp, fmt


def test_partitioned_write_prunes(spark, tmpdir):
    p = os.path.join(tmpdir, "part_orc")
    save_table(_df(spark), p, fmt="orc", partition_by=["grp"])
    # hive-style dirs exist
    assert any(d.startswith("grp=") for d in os.listdir(p))
    back = load_any(spark, p, fmt="orc").filter(F.col("grp") == 3)
    plan = back._jdf.queryExecution().executedPlan().toString()
    # the grp filter must be a partition filter on the scan, not a row filter
    assert "PartitionFilters" in plan and "grp" in plan.split("PartitionFilters")[1][:120]
    assert back.count() == 12


def test_unknown_format_raises(spark, tmpdir):
    with pytest.raises(ValueError):
        save_table(_df(spark), os.path.join(tmpdir, "x"), fmt="avro")
    with pytest.raises(ValueError):
        load_any(spark, tmpdir, fmt="avro")
