"""Tests for sparklda.io write helpers and session env validation."""

from __future__ import annotations

import os
from unittest import mock

import duckdb
import pytest

import sparklda.session as session_mod
from sparklda.io import write_parquet
from sparklda.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark("sparklda-io-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_write_parquet_uses_zstd_and_roundtrips(spark, tmp_path):
    """Guide §6: parquet output must be zstd-compressed (smaller than snappy
    at similar read speed), and read back byte-identical."""
    out = str(tmp_path / "t.parquet")
    df = spark.range(0, 1000).selectExpr("id", "cast(id % 7 as string) AS k")
    write_parquet(df, out)

    con = duckdb.connect()
    codecs = {
        r[0]
        for r in con.execute(
            f"SELECT DISTINCT compression FROM parquet_metadata('{out}/*.parquet')"
        ).fetchall()
    }
    assert codecs == {"ZSTD"}, codecs

    back = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert back == sorted(tuple(r) for r in df.collect())


def test_write_parquet_partition_by(spark, tmp_path):
    out = str(tmp_path / "p.parquet")
    df = spark.range(0, 100).selectExpr("id", "cast(id % 3 as string) AS k")
    write_parquet(df, out, partition_by=["k"])
    assert {d for d in os.listdir(out) if d.startswith("k=")} == {"k=0", "k=1", "k=2"}
    assert spark.read.parquet(out).count() == 100


def test_shuffle_partitions_env_rejects_invalid():
    """ADVICE r21: '0' used to pass isdigit() and blow up only at job time;
    non-numeric values silently fell back to 200."""
    for bad in ("0", "-4", "abc", ""):
        with mock.patch.dict(os.environ, {"SPARK_GRAFT_SHUFFLE_PARTITIONS": bad}):
            with pytest.raises(ValueError):
                session_mod.get_spark("never-built")


def test_shuffle_partitions_env_accepts_valid(spark):
    """A valid override parses; the already-running session is reused, so
    this only exercises the parse path, not a rebuild."""
    with mock.patch.dict(os.environ, {"SPARK_GRAFT_SHUFFLE_PARTITIONS": "300"}):
        s = session_mod.get_spark("sparklda-io-tests")
    assert s is spark
