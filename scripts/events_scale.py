"""Scale + parallelism evidence for ops/events.py.

Synthesizes a deterministic event log (no external data): N events over
U users; per-event timestamps are base + xxhash64-derived offsets inside
a 30-day horizon, so each user's stream has realistic irregular gaps and
sessionization has real work to do (many sessions per user, hot window
partitions are bounded by the per-user event count ~ N/U).

Runs the same two jobs at local[N_LOW] and local[N_HIGH] on the SAME
input (the sandbox stand-in for the north rule's two-cluster-size
criterion — no real cluster here):

  A. session_stats (30-min gap): ONE user_id-hash exchange feeding two
     stacked window frames + the combining rollup.
  B. window_counts (60-min tumbling, by event_type): map-side projection
     + one combining aggregate.

Reports events/s at both parallelism levels and the scaling efficiency
eff = (thr_high / thr_low) / (N_HIGH / N_LOW); interleaved pairs,
median-of-3, same discipline as scripts/scaling_executors.py.

Usage: python scripts/events_scale.py [n_events] [n_users]
Writes BENCH_events.json at the repo root.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F

N_LOW, N_HIGH = 8, 32
HORIZON_US = 30 * 86_400_000_000  # 30 days
BASE_US = 1_704_067_200_000_000  # 2024-01-01 UTC
TYPES = ["click", "view", "error", "commit", "query"]


def build_spark(cpus):
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("events-scale")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def synth_events(spark, n_events, n_users):
    h = F.xxhash64(F.col("id"))
    us = BASE_US + F.pmod(F.xxhash64(F.col("id") * 131 + F.lit(7)),
                          F.lit(HORIZON_US))
    return spark.range(n_events).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(us).alias("ts"),
        F.pmod(h, F.lit(n_users)).alias("user_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in TYPES]),
            (F.pmod(F.xxhash64(F.col("id") + F.lit(3)), F.lit(len(TYPES)))
             + 1).cast("int"),
        ).alias("event_type"),
        (F.pmod(h, F.lit(1000)) / 100.0).alias("value"),
    )


def run_once(cpus, n_events, n_users):
    from phphinder_spark.ops.events import session_stats, window_counts

    spark = build_spark(cpus)
    try:
        ev = synth_events(spark, n_events, n_users)
        t = time.time()
        st = session_stats(ev, gap_minutes=30.0)
        agg = st.agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.round(F.sum("total_value"), 3).alias("sum_value"),
        ).first()
        sess_sec = time.time() - t
        t = time.time()
        wc = window_counts(ev, window_minutes=60.0)
        wagg = wc.agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum("n_events").alias("n_events"),
        ).first()
        win_sec = time.time() - t
        return {
            "cpus": cpus,
            "sessionize_sec": round(sess_sec, 3),
            "sessionize_events_per_sec": round(n_events / sess_sec, 1),
            "window_sec": round(win_sec, 3),
            "window_events_per_sec": round(n_events / win_sec, 1),
            "n_sessions": agg["n_sessions"],
            "sum_value": float(agg["sum_value"]),
            "n_windows": wagg["n_windows"],
            "events_conserved": agg["n_events"] == n_events
            and wagg["n_events"] == n_events,
        }
    finally:
        spark.stop()


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_users = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    pairs = []
    for i in range(3):  # interleave low/high to cancel host drift
        lo = run_once(N_LOW, n_events, n_users)
        hi = run_once(N_HIGH, n_events, n_users)
        assert lo["n_sessions"] == hi["n_sessions"], (lo, hi)
        assert lo["sum_value"] == hi["sum_value"], (lo, hi)
        assert lo["n_windows"] == hi["n_windows"], (lo, hi)
        assert lo["events_conserved"] and hi["events_conserved"]
        eff = (
            hi["sessionize_events_per_sec"] / lo["sessionize_events_per_sec"]
        ) / (N_HIGH / N_LOW)
        pairs.append({"low": lo, "high": hi,
                      "sessionize_efficiency": round(eff, 3)})
        print(f"pair {i}: low {lo['sessionize_sec']}s "
              f"high {hi['sessionize_sec']}s eff {eff:.3f}", flush=True)
    effs = sorted(p["sessionize_efficiency"] for p in pairs)
    out = {
        "n_events": n_events,
        "n_users": n_users,
        "parallelism": [N_LOW, N_HIGH],
        "pairs": pairs,
        "sessionize_median_efficiency": effs[len(effs) // 2],
        "result_identity": "n_sessions, rounded sum_value, n_windows "
        "identical across all runs at both parallelism levels",
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "BENCH_events.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("n_events", "sessionize_median_efficiency")}))


if __name__ == "__main__":
    main()
