"""Synthetic-scale A/B: the r21 vocab_topv plan fix, reproducible.

Round 21 claimed (prose only) that taking top-V *before* the rank window
beats the r20 shape — rank the ENTIRE vocabulary through an
``Exchange SinglePartition`` + full ``Sort``, then limit — by ~10x at
millions of distinct words. The fixture corpus has 31 distinct words at
every SF, so no fixture bench can show this. This test regenerates the
evidence from an in-process synthetic corpus (``spark.range`` + expr,
no fixture dependency) at >= 1M distinct keys, and asserts the
TakeOrderedAndProject path wins by a clear margin.

It is wall-clock heavy (~1-2 min) and environment-sensitive, so it is
env-gated; the fast plan-shape assertions run unconditionally. One command
reproduces the numbers:

    SPARK_GRAFT_SCALE_DEMO=1 python -m pytest tests/test_scale_demo.py -q -s
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

import __spark_entry__ as entry_mod
from bench import synth_docs
from sparklda.session import get_spark

# >= 1M distinct keys per the round-21 verdict; ~10M tokens keeps the shared
# wordcount cost small relative to the single-task sort the old plan pays.
N_DOCS, WORDS_PER_DOC, N_DISTINCT, PARTS = 2_000_000, 5, 5_000_000, 64
V = 10_000
# Conservative vs the ~3x measured locally (cold-JIT variance is 2-4x on
# this sandbox); the asymptotic gap only grows with vocabulary size.
MIN_SPEEDUP = 1.5


@pytest.fixture(scope="module")
def spark():
    s = get_spark("sparklda-scale-demo")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def r20_fullwindow(docs, v):
    """The pre-r21 query shape, verbatim (git aac3400~1:__spark_entry__.py):
    row_number over the ENTIRE vocabulary, then orderBy(id).limit(v). The
    orderBy on the window-derived column defeats Spark 4's
    LimitPushDownThroughWindow rule, so this compiles to the historical
    Exchange SinglePartition + full-vocab Sort + Window plan."""
    words = docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
    wc = words.filter(F.col("word") != "").groupBy("word").agg(F.count("*").alias("count"))
    win = Window.orderBy(F.desc("count"), F.asc("word"))
    return (
        wc.withColumn("id", (F.row_number().over(win) - F.lit(1)).cast("long"))
        .orderBy("id")
        .limit(v)
        .select("word", "count", "id")
    )


def _plan(spark, df):
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def _time_noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def test_plan_shapes_old_vs_new(spark):
    """Cheap, always-on: the old shape really is the scale-killer plan and
    the new shape really avoids it, on the same synthetic input."""
    docs = synth_docs(spark, 1000, 5, 100, 4)
    old_plan = _plan(spark, r20_fullwindow(docs, V))
    new_plan = _plan(spark, entry_mod.vocab_from_docs(docs, V))
    assert "SinglePartition" in old_plan, old_plan
    assert "SinglePartition" not in new_plan, new_plan
    assert "TakeOrderedAndProject" in new_plan, new_plan


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SCALE_DEMO"),
    reason="wall-clock A/B at 5M distinct words; set SPARK_GRAFT_SCALE_DEMO=1",
)
def test_takeordered_beats_fullwindow_at_scale(spark):
    def build_new():
        return entry_mod.vocab_from_docs(
            synth_docs(spark, N_DOCS, WORDS_PER_DOC, N_DISTINCT, PARTS), V
        )

    def build_old():
        return r20_fullwindow(
            synth_docs(spark, N_DOCS, WORDS_PER_DOC, N_DISTINCT, PARTS), V
        )

    sc = spark.sparkContext
    # Two warmups per path: JIT on this synthetic expression tree needs more
    # than one pass (first timed run is otherwise 2-4x the steady state).
    for tag, build in (("new", build_new), ("old", build_old)):
        sc.setJobDescription(f"scale-demo:{tag}:warmup")
        _time_noop(build())
        _time_noop(build())
    sc.setJobDescription("scale-demo:new:timed")
    new_times = [_time_noop(build_new()) for _ in range(3)]
    sc.setJobDescription("scale-demo:old:timed")
    old_times = [_time_noop(build_old()) for _ in range(3)]
    sc.setJobDescription(None)

    new_best, old_best = min(new_times), min(old_times)
    print(
        f"\nscale demo @ {N_DISTINCT} distinct words (V={V}): "
        f"new(TakeOrdered) best {new_best:.2f}s {[round(t, 2) for t in new_times]} "
        f"vs old(full-window) best {old_best:.2f}s {[round(t, 2) for t in old_times]} "
        f"-> {old_best / new_best:.1f}x"
    )
    assert old_best >= MIN_SPEEDUP * new_best, (new_times, old_times)
