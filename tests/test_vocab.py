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


def _formatted_plan(spark, df):
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_vocab_topv_plan_is_scale_safe(spark):
    """The r21 optimization contract: one shuffle total (the groupBy), a
    distributed TakeOrderedAndProject for top-V, and no SinglePartition
    exchange dragging the full vocabulary through one task."""
    df = entry_mod.queries()["vocab_topv"](spark, SF_DIR)
    plan = _formatted_plan(spark, df)
    assert "TakeOrderedAndProject" in plan
    assert "SinglePartition" not in plan
    n_exchange = sum(
        1
        for ln in plan.splitlines()
        if ln.strip().startswith("(") and "Exchange" in ln
    )
    assert n_exchange == 1, plan


def test_vocab_topv_scan_prunes_to_text(spark):
    """Column pruning must reach the parquet scan (guide §6): the documents
    table has 5 columns, the query needs only `text`. A refactor that widens
    ReadSchema silently quintuples scan bytes at 100 TB."""
    df = entry_mod.queries()["vocab_topv"](spark, SF_DIR)
    plan = _formatted_plan(spark, df)
    assert "ReadSchema: struct<text:string>" in plan, plan


def test_vocab_topv_partial_agg_precedes_shuffle(spark):
    """Skew insurance (guide §2.5): the map-side partial_count HashAggregate
    must sit below the hashpartitioning(word) Exchange, so each map task
    ships at most one row per distinct word — the Zipfian-head word can
    contribute <= #map-tasks shuffle rows, never its corpus frequency."""
    df = entry_mod.queries()["vocab_topv"](spark, SF_DIR)
    plan = _formatted_plan(spark, df)
    i_partial = plan.index("partial_count")
    i_exchange = plan.index("hashpartitioning(word")
    # In `formatted` output, operator detail blocks appear bottom-up in
    # execution order, so the partial aggregate's block precedes the
    # Exchange's block iff it executes first (feeds the shuffle).
    assert i_partial < i_exchange, plan


def test_vocab_boundary_ties_at_cutoff_match_oracle(spark, tmp_path):
    """ADVICE r21: the fixture corpus has only 31 distinct words, so the
    fixture tests never exercise the top-V cutoff — the only place where
    top-V-then-rank could diverge from the oracle's rank-then-limit. This
    builds a corpus with MORE distinct words than V, including a run of
    count-ties straddling the cutoff, and checks Spark against DuckDB with
    the same parameterized V."""
    v = 10
    counts = {}
    for i in range(5):  # unique head counts: ranks 0..4
        counts[f"hi{i}"] = 100 - i
    for c in "abcdefghij":  # 10-way tie at count 50: ranks 5..14 — the
        counts[f"tie_{c}"] = 50  # cutoff at V=10 falls INSIDE this group
    for i in range(20):  # tail below the cutoff
        counts[f"lo{i:02d}"] = 5
    assert len(counts) == 35 > v
    rows = [(i, " ".join([w] * n)) for i, (w, n) in enumerate(sorted(counts.items()))]
    pq = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(pq)

    docs = spark.read.parquet(pq)
    srows = sorted(tuple(r) for r in entry_mod.vocab_from_docs(docs, v).collect())

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{pq}/*.parquet'")
    oracle = f"""
        WITH toks AS (
            SELECT unnest(string_split(text, ' ')) AS word FROM documents
        ), wc AS (
            SELECT word, COUNT(*) AS count FROM toks WHERE word <> '' GROUP BY word
        )
        SELECT word, count, ROW_NUMBER() OVER (ORDER BY count DESC, word ASC) - 1 AS id
        FROM wc ORDER BY id LIMIT {v}
    """
    orows = sorted(tuple(r) for r in con.execute(oracle).fetchall())
    assert len(srows) == v
    assert srows == orows
    # the cutoff row really is inside the tie group (tie_a..tie_e kept,
    # tie_f.. dropped by word ASC) — i.e. the boundary was exercised
    kept = {w for w, _, _ in srows}
    assert "tie_e" in kept and "tie_f" not in kept
