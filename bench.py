"""Bench harness (driver contract).

Reads the data directory from ``$SPARK_GRAFT_SF_DIR`` and the core count
from ``$SPARK_GRAFT_CPUS`` (master ``local[$SPARK_GRAFT_CPUS]`` via
``sparklda.session.get_spark``), times every ``__spark_entry__.queries()``
entry, and prints exactly ONE JSON line::

    {"metric": ..., "value": N, "unit": "sec", "queries": {name: sec}, "sf": ...}

Methodology (fixed across rounds so numbers stay comparable):

* the timed action is the noop sink (``format("noop")``) per the
  optimization guide §1.4 — it computes every column of every row and
  discards the result, so we time the computation, not an output format;
* per query: 1 untimed warmup run (JVM/codegen warm, file listing cached),
  then ``BENCH_RUNS`` timed runs (default 3), reporting the median;
* ``value`` is the sum of the per-query medians;
* each run is labelled with ``setJobDescription`` so the Spark UI/event
  log attributes time to the right query.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import __spark_entry__ as entry_mod
from sparklda.session import get_spark

RUNS = int(os.environ.get("BENCH_RUNS", "3"))


def _sf_from_dir(sf_dir: str) -> float | None:
    tail = os.path.basename(sf_dir.rstrip("/"))
    if tail.startswith("sf"):
        try:
            return float(tail[2:])
        except ValueError:
            return None
    return None


def _time_noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("sparklda-bench")
    spark.sparkContext.setLogLevel("ERROR")

    per_query: dict[str, float] = {}
    for name, fn in entry_mod.queries().items():
        sc = spark.sparkContext
        sc.setJobDescription(f"bench:{name}:warmup")
        df = fn(spark, sf_dir)
        _time_noop(df)  # warmup, untimed
        times = []
        for i in range(RUNS):
            sc.setJobDescription(f"bench:{name}:run{i}")
            times.append(_time_noop(fn(spark, sf_dir)))
        sc.setJobDescription(None)
        per_query[name] = round(statistics.median(times), 4)

    out = {
        "metric": "declared_query_suite_noop_median_sec",
        "value": round(sum(per_query.values()), 4),
        "unit": "sec",
        "queries": per_query,
        "sf": _sf_from_dir(sf_dir),
    }
    # The ONE contract line goes to stdout; everything else (Spark logs) is stderr.
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
