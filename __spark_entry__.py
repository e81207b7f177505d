"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sparklda.io import read_table

VOCAB_SIZE = 10_000


def _vocab_topv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-V vocabulary with deterministic dictionary ids.

    Spark-first rewrite of the reference wordcount/dictionary spine
    (/root/reference/src/LDATopicModelingWithGibbs.py:34-68): tokenize ->
    explode -> hash-agg count -> rank. The global row_number is a single
    narrow window at V=10k rows (post-agg), not over the corpus.
    """
    docs = read_table(spark, "documents", sf_dir)
    words = docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
    wc = words.filter(F.col("word") != "").groupBy("word").agg(F.count("*").alias("count"))
    # Distributed top-V FIRST (TakeOrderedAndProject: per-partition top-V, then
    # a merge bounded by V x partitions) so the rank below never sees more than
    # V rows. Ranking before limiting would drag the entire corpus vocabulary
    # through one SinglePartition sort — the 100 TB scale-killer. (count, word)
    # is a total order (word is unique post-groupBy), so top-V-then-rank is
    # row-for-row identical to rank-then-take-first-V.
    topv = wc.orderBy(F.desc("count"), F.asc("word")).limit(VOCAB_SIZE)
    win = Window.orderBy(F.desc("count"), F.asc("word"))
    return (
        topv.withColumn("id", (F.row_number().over(win) - F.lit(1)).cast("long"))
        .select("word", "count", "id")
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query; driver checks rows>0. Data dir overridable via env."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    return _vocab_topv(spark, sf_dir)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {
        "vocab_topv": _vocab_topv,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each queries() entry."""
    return {
        "vocab_topv": f"""
            WITH toks AS (
                SELECT unnest(string_split(text, ' ')) AS word FROM documents
            ), wc AS (
                SELECT word, COUNT(*) AS count FROM toks WHERE word <> '' GROUP BY word
            )
            SELECT word, count, ROW_NUMBER() OVER (ORDER BY count DESC, word ASC) - 1 AS id
            FROM wc ORDER BY id LIMIT {VOCAB_SIZE}
        """,
    }
