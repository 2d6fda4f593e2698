"""Hot-key A/B for sessionization: plain (partition by user) vs the
exact bucketed form (partition by (user, time bucket) + summary
stitch), on a log where ONE bot account owns 80% of all events — the
adversarial shape the plain plan cannot parallelize (its biggest task
sorts the bot's entire stream).

Synthesizes deterministically (no external data), asserts the two
forms produce IDENTICAL session aggregates, and reports wall times at
local[CPUS]. Interleaved runs, one untimed warmup per form.

Usage: python scripts/events_hot.py [n_events] [cpus]
Writes BENCH_events_hot.json at the repo root.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F

BASE_US = 1_704_067_200_000_000
HORIZON_US = 30 * 86_400_000_000


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("events-hot")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from phphinder_spark.ops.events import session_stats

    h = F.xxhash64(F.col("id"))
    # 80% of events -> user 0 (the bot); the rest spread over 100k users
    ev = spark.range(n_events, numPartitions=4 * cpus).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            BASE_US
            + F.pmod(F.xxhash64(F.col("id") * 131 + F.lit(7)),
                     F.lit(HORIZON_US))
        ).alias("ts"),
        F.when(F.pmod(h, F.lit(5)) < 4, F.lit(0))
        .otherwise(F.pmod(F.xxhash64(F.col("id") + F.lit(1)),
                          F.lit(100_000)) + 1)
        .alias("user_id"),
        (F.pmod(h, F.lit(1000)) / 100.0).alias("value"),
    ).cache()
    ev.count()

    def run(hot):
        st = session_stats(
            ev, gap_minutes=30.0,
            hot_bucket_minutes=60.0 if hot else None,
        )
        agg = st.agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_ev"),
            F.round(F.sum("total_value"), 3).alias("sum_value"),
            F.max("n_events").alias("max_sess"),
        ).first()
        return dict(agg.asDict())

    results = {"plain": [], "bucketed": []}
    run(False); run(True)  # warm both shapes
    aggs = set()
    for i in range(3):
        for name, hot in (("plain", False), ("bucketed", True)):
            t = time.time()
            agg = run(hot)
            results[name].append(round(time.time() - t, 3))
            aggs.add(tuple(sorted(agg.items())))
    assert len(aggs) == 1, aggs  # both forms, all runs: identical result
    agg = dict(list(aggs)[0])
    out = {
        "n_events": n_events,
        "cpus": cpus,
        "bot_share": 0.8,
        "plain_sec": results["plain"],
        "bucketed_sec": results["bucketed"],
        "median_speedup": round(
            sorted(results["plain"])[1] / sorted(results["bucketed"])[1], 2
        ),
        "agg_identity": agg,
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "BENCH_events_hot.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
