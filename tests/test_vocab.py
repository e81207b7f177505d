"""Tests for the declared vocab_topv query.

Covers: DuckDB-oracle equivalence (what the driver checks), determinism,
and the r21 plan-shape guarantee — top-V is taken *before* any
single-partition rank, so the window never sees more than VOCAB_SIZE rows.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry_mod
from sparklda.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("sparklda-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _spark_rows(spark):
    df = entry_mod.queries()["vocab_topv"](spark, SF_DIR)
    return sorted(tuple(r) for r in df.collect())


def test_vocab_topv_matches_duckdb_oracle(spark):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    oracle = sorted(
        tuple(r) for r in con.execute(entry_mod.oracle_sql()["vocab_topv"]).fetchall()
    )
    assert _spark_rows(spark) == oracle


def test_vocab_topv_deterministic(spark):
    assert _spark_rows(spark) == _spark_rows(spark)


def test_vocab_topv_schema(spark):
    df = entry_mod.queries()["vocab_topv"](spark, SF_DIR)
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        ("word", "string"),
        ("count", "bigint"),
        ("id", "bigint"),
    ]


def test_vocab_topv_plan_is_scale_safe(spark):
    """The r21 optimization contract: one shuffle total (the groupBy), a
    distributed TakeOrderedAndProject for top-V, and no SinglePartition
    exchange dragging the full vocabulary through one task."""
    df = entry_mod.queries()["vocab_topv"](spark, SF_DIR)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "TakeOrderedAndProject" in plan
    assert "SinglePartition" not in plan
    n_exchange = sum(
        1
        for ln in plan.splitlines()
        if ln.strip().startswith("(") and "Exchange" in ln
    )
    assert n_exchange == 1, plan
