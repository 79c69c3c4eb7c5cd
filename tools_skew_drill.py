"""Skew drill (r15): MEASURE the salted-join / AQE-skew / hot-band-cap
claims SCALE.md previously only asserted.

Plants a deliberately skewed join input (>=50% of an 8x-replicated sf0.1
lineitem on ONE orderkey) and a hot-LSH-band corpus (one shingle shared
by 60% of documents), then times four join strategies and the banded
candidate join with/without the stop-shingle cap, capturing WORST-TASK
durations from the Spark status REST API:

1. plain shuffle join, AQE OFF        - the naive baseline
2. plain shuffle join, AQE ON         - AQE skew-split (runtime re-plan)
3. salted_equi_join (full salting)    - deterministic fallback
4. hot_key_salted_join (hot-only)     - detect + salt only hot keys
5. banded self-join with / without prune_stop_shingles(max_df)

Prints one JSON line per scenario and a final SKEW_DRILL_RESULT JSON.
Run: ``python tools_skew_drill.py [sf_dir] [work_dir]``
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

HOT_KEY = 1


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{base}/api/v1/{path}", timeout=10) as r:
        return json.loads(r.read())


def _worst_task_sec(spark, group: str) -> float | None:
    """Max single-task duration across all stages of a job group, via the
    status REST API (None if the UI is unavailable)."""
    try:
        apps = _rest(spark, "applications")
        app = apps[0]["id"]
        jobs = [
            j
            for j in _rest(spark, f"applications/{app}/jobs?status=succeeded")
            if j.get("jobGroup") == group
        ]
        worst = None  # None until at least one stage actually measured
        for j in jobs:
            for sid in j["stageIds"]:
                try:
                    summary = _rest(
                        spark,
                        f"applications/{app}/stages/{sid}/0/taskSummary"
                        "?quantiles=1.0",
                    )
                    d = summary["duration"][0] / 1000.0
                    worst = d if worst is None else max(worst, d)
                except Exception:
                    continue
        # a measured 0.0 (sub-10ms tasks) reports as 0.0; None means NO
        # stage was measurable (API unavailable, no matching jobs, or
        # every taskSummary fetch failed) — the two must not conflate
        # (r15 ADVICE + r16 review)
        return None if worst is None else round(worst, 2)
    except Exception:
        return None


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/skew_drill"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("skew-drill")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from caffeonspark_spark.catalog import load_table
    from caffeonspark_spark.operators.partitioning import (
        hot_key_salted_join,
        salted_equi_join,
    )

    # --- plant the skewed join input: 8x lineitem, >=50% on ONE orderkey ---
    li = load_table(spark, sf, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
    skewed_path = os.path.join(work, "lineitem_skewed")
    (
        li.withColumn("_r", F.explode(F.array(*[F.lit(i) for i in range(16)])))
        .withColumn(
            "l_orderkey",
            # 12 of 16 replicas collapse onto the hot key -> 75% hot
            F.when(F.col("_r") % 4 != 0, F.lit(HOT_KEY)).otherwise(
                F.col("l_orderkey")
            ),
        )
        .drop("_r")
        .repartition(32)  # 32 even input splits: the scan stage must not
        .write.mode("overwrite")  # mask the join stage in worst-task times
        .parquet(skewed_path)
    )
    fact = spark.read.parquet(skewed_path)
    n_fact = fact.count()
    n_hot = fact.where(F.col("l_orderkey") == HOT_KEY).count()
    orders = load_table(spark, sf, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_custkey", "o_totalprice"
    )
    print(
        json.dumps(
            {"planted": {"fact_rows": n_fact, "hot_rows": n_hot,
                         "hot_frac": round(n_hot / n_fact, 3)}}
        ),
        flush=True,
    )

    results = {}

    def run(name: str, fn, aqe: bool):
        spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
        )
        fn().count()  # warm plan/scan caches once
        spark.sparkContext.setJobGroup(name, name)
        t0 = time.time()
        out = fn().agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity") * F.col("o_totalprice")).alias("s"),
        ).collect()[0]
        wall = time.time() - t0
        spark.sparkContext.setJobGroup("idle", "idle")
        results[name] = {
            "wall_sec": round(wall, 2),
            "worst_task_sec": _worst_task_sec(spark, name),
            "rows": out["n"],
        }
        print(json.dumps({name: results[name]}), flush=True)
        return out["n"]

    n1 = run("plain_join_aqe_off", lambda: fact.join(orders, "l_orderkey"), aqe=False)
    n2 = run("plain_join_aqe_skew", lambda: fact.join(orders, "l_orderkey"), aqe=True)
    # AQE with the skew thresholds sized to THIS data (defaults only split
    # partitions >256 MB / 5x median — a hot partition under that flies
    # under the radar)
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    n2b = run(
        "plain_join_aqe_tuned", lambda: fact.join(orders, "l_orderkey"), aqe=True
    )
    for k in (
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
    ):
        spark.conf.unset(k)
    assert n2 == n2b
    n3 = run(
        "salted_full",
        lambda: salted_equi_join(fact, orders, "l_orderkey", n_salt=16),
        aqe=False,
    )
    n4 = run(
        "salted_hot_only",
        lambda: hot_key_salted_join(
            fact, orders, "l_orderkey", n_salt=16, hot_threshold=100_000
        ),
        aqe=False,
    )
    assert n1 == n2 == n3 == n4, "strategies disagree on result size"

    # --- hot LSH band: one shingle in 60% of docs, with/without the cap ---
    from caffeonspark_spark.operators.dedup import (
        prune_stop_shingles,
        shingle_sets,
    )

    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    n_docs = docs.count()
    hot_docs = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 < 6,  # 60% of docs share a hot shingle run
            F.concat(F.lit("the same hot shingle runs here "), F.col("text")),
        ).otherwise(F.col("text")),
    )
    sh = shingle_sets(hot_docs, n=5).persist()
    sh.count()
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    lens = hot_docs.select("doc_id", F.length("text").alias("n")).persist()
    lens.count()

    def band_verify(shingles, tag):
        """Candidate generation + the DOWNSTREAM per-pair verify cost a
        real dedup pays (here a cheap length-ratio proxy) — candidate
        blow-up is what makes the hot band expensive, not the count."""
        a = shingles.alias("a")
        b = shingles.alias("b")
        pairs = (
            a.join(b, "shingle")
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"),
            )
        )
        verified = (
            pairs.join(lens.withColumnRenamed("doc_id", "id_a"), "id_a")
            .withColumnRenamed("n", "n_a")
            .join(
                lens.select(
                    F.col("doc_id").alias("id_b"), F.col("n").alias("n_b")
                ),
                "id_b",
            )
            .where(
                F.least("n_a", "n_b") * 1.0 / F.greatest("n_a", "n_b") > 0.5
            )
        )
        spark.sparkContext.setJobGroup(tag, tag)
        t0 = time.time()
        n_pairs = verified.count()
        out = {
            "wall_sec": round(time.time() - t0, 2),
            "worst_task_sec": _worst_task_sec(spark, tag),
            "verified_pairs": n_pairs,
        }
        results[tag] = out
        print(json.dumps({tag: out}), flush=True)

    band_verify(sh, "band_uncapped")
    band_verify(prune_stop_shingles(sh, max_df=1000), "band_capped")
    sh.unpersist()
    lens.unpersist()

    results["_planted"] = {
        "fact_rows": n_fact,
        "hot_rows": n_hot,
        "n_docs": n_docs,
    }
    print("SKEW_DRILL_RESULT " + json.dumps(results))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
