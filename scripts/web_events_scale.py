"""Throughput evidence for the round-7 web + event-analytics ops at
corpus scale (deterministic synthesis, no external data).

Measures at local[CPUS], one untimed warmup per op (steady-state — a
100-TB job amortizes JVM warmup):

  A. url_dedup over N synthesized frontier URLs (the denormalization
     mix of the driver entry: case, ports, params, fragments; ~5 rows
     per canonical group) — URLs/s.
  B. funnel (3 steps) over N events — events/s.
  C. retention_cohorts (daily) over N events — events/s.
  D. sliding_window_counts (120/30, k=4 explode) over N events.

Usage: python scripts/web_events_scale.py [n] [cpus]
Writes BENCH_web_events.json at the repo root.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F

BASE_US = 1_704_067_200_000_000
HORIZON_US = 30 * 86_400_000_000
TYPES = ["view", "click", "commit", "error", "query"]


def synth_urls(spark, n):
    d = F.col("id")
    g = d % 1_000_003  # ~n/1e6 canonical groups -> real dedup work
    s = lambda c: c.cast("string")
    https = g % 3 == 0
    url = F.concat(
        F.when(d % 2 == 0,
               F.when(https, F.lit("HTTPS")).otherwise(F.lit("HTTP")))
        .otherwise(F.when(https, F.lit("https")).otherwise(F.lit("http"))),
        F.lit("://"),
        F.when(g % 2 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.lit("site"), s(g % 9973), F.lit(".example.com"),
        F.when(g % 7 == 0, F.lit(":8080")).otherwise(
            F.when(d % 5 == 0,
                   F.when(https, F.lit(":443")).otherwise(F.lit(":80")))
            .otherwise(F.lit(""))),
        F.lit("/p/"), s(g),
        F.when(d % 4 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(g % 4 < 2,
               F.concat(F.when(d % 2 == 0, F.lit("?a=1&b=2"))
                        .otherwise(F.lit("?b=2&a=1")),
                        F.when(d % 3 == 1,
                               F.concat(F.lit("&utm_source=u"), s(d)))
                        .otherwise(F.lit("")))).otherwise(F.lit("")),
        F.when(d % 7 == 0, F.concat(F.lit("#f"), s(d))).otherwise(F.lit("")),
    )
    return spark.range(n).select(d.alias("doc_id"), url.alias("url"))


def synth_events(spark, n):
    h = F.xxhash64(F.col("id"))
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            BASE_US + F.pmod(F.xxhash64(F.col("id") * 131 + F.lit(7)),
                             F.lit(HORIZON_US))).alias("ts"),
        F.pmod(h, F.lit(200_000)).alias("user_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in TYPES]),
            (F.pmod(F.xxhash64(F.col("id") + F.lit(3)),
                    F.lit(len(TYPES))) + 1).cast("int")).alias("event_type"),
        (F.pmod(h, F.lit(1000)) / 100.0).alias("value"),
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("web-events-scale")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from phphinder_spark.ops.events import (
        funnel,
        retention_cohorts,
        sliding_window_counts,
    )
    from phphinder_spark.ops.web import url_dedup

    urls = synth_urls(spark, n).cache()
    urls.count()
    ev = synth_events(spark, n).cache()
    ev.count()
    out = {"n": n, "cpus": cpus}

    def bench(name, make):
        make().count() if name != "url_dedup" else make().where(
            "keep").count()  # warm
        t = time.time()
        r = make()
        cnt = r.where("keep").count() if name == "url_dedup" else r.count()
        sec = time.time() - t
        out[name] = {"sec": round(sec, 3),
                     "rows_per_sec": round(n / sec, 1), "result": cnt}
        print(name, out[name], flush=True)

    bench("url_dedup", lambda: url_dedup(urls))
    bench("funnel", lambda: funnel(ev, ["view", "click", "commit"]))
    bench("retention", lambda: retention_cohorts(ev, cohort_minutes=1440.0))
    bench("sliding", lambda: sliding_window_counts(
        ev, window_minutes=120.0, slide_minutes=30.0))
    with open("/root/repo/BENCH_web_events.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v["sec"] for k, v in out.items()
                      if isinstance(v, dict)}))
    spark.stop()


if __name__ == "__main__":
    main()
