"""Executor-level N -> 4N scaling evidence for ops/events.py.

Same geometry as scripts/scaling_executors.py (see its docstring for
why thread-level local[8] -> local[32] under-measures on this shared
host: one JVM with 4x threads shares one scheduler/GC/shuffle disk,
which a real 4N-executor cluster does not):

  N:   1 process x local[2] pinned to a 2-core slice, one user shard
  4N:  4 processes x local[2], each pinned to its OWN slice, four
       USER-DISJOINT shards of the same deterministic event log

Sharding by user is exactly what the user_id-hash exchange does on a
real cluster — sessions never cross users, so after the shuffle each
executor's work is independent; per-executor shards model the weak-
scaling cluster (data grows with cluster size, the 100-TB regime).

Each worker synthesizes its shard (no external data): events with
xxhash64-derived timestamps in a 30-day horizon, ~100 events/user,
then times session_stats (30-min gap, one shuffle + two windows +
rollup) and window_counts (60-min tumbling) after one untimed warmup
(steady-state throughput — a 100-TB job amortizes JVM warmup).

Usage: python scripts/events_scale.py [n_events_per_shard] [repeats]
Writes BENCH_events.json at the repo root.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
cpus, n_events, seed = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
n_users = max(n_events // 100, 1)
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master(f"local[{cpus}]")
    .appName(f"events-scale-{seed}")
    .config("spark.sql.shuffle.partitions", str(2 * cpus))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "8g")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.local.dir", f"/dev/shm/spark-events/{seed}")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from phphinder_spark.ops.events import session_stats, window_counts

BASE_US = 1_704_067_200_000_000
HORIZON_US = 30 * 86_400_000_000
h = F.xxhash64(F.col("id") + F.lit(seed * 1_000_000_000))
ev = spark.range(n_events, numPartitions=4 * cpus).select(
    F.col("id").alias("event_id"),
    F.timestamp_micros(
        BASE_US + F.pmod(F.xxhash64(F.col("id") * 131 + F.lit(seed)),
                         F.lit(HORIZON_US))).alias("ts"),
    (F.pmod(h, F.lit(n_users)) + F.lit(seed * n_users)).alias("user_id"),
    (F.pmod(h, F.lit(1000)) / 100.0).alias("value"),
).cache()
ev.count()
session_stats(ev, gap_minutes=30.0).agg(F.count(F.lit(1))).first()  # warm
t0 = time.time()
agg = session_stats(ev, gap_minutes=30.0).agg(
    F.count(F.lit(1)).alias("n_sessions"),
    F.sum("n_events").alias("n_ev"),
    F.round(F.sum("total_value"), 3).alias("sum_value")).first()
sess_sec = time.time() - t0
window_counts(ev, window_minutes=60.0, by=None).agg(
    F.count(F.lit(1))).first()  # warm
t0 = time.time()
wagg = window_counts(ev, window_minutes=60.0, by=None).agg(
    F.count(F.lit(1)).alias("n_windows"),
    F.sum("n_events").alias("n_ev")).first()
win_sec = time.time() - t0
assert agg["n_ev"] == n_events and wagg["n_ev"] == n_events
print(json.dumps({
    "seed": seed, "sess_sec": round(sess_sec, 3),
    "sess_events_per_sec": round(n_events / sess_sec, 1),
    "win_sec": round(win_sec, 3),
    "win_events_per_sec": round(n_events / win_sec, 1),
    "n_sessions": agg["n_sessions"], "sum_value": float(agg["sum_value"]),
    "n_windows": wagg["n_windows"]}))
spark.stop()
"""

CORES_PER_EXEC = 2


def run_group(n_procs: int, n_events: int) -> dict:
    os.makedirs("/dev/shm/spark-events", exist_ok=True)
    procs = [
        subprocess.Popen(
            [
                "taskset", "-c",
                f"{i * CORES_PER_EXEC}-{(i + 1) * CORES_PER_EXEC - 1}",
                sys.executable, "-c", WORKER,
                str(CORES_PER_EXEC), str(n_events), str(i),
            ],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        )
        for i in range(n_procs)
    ]
    outs = [p.communicate()[0] for p in procs]
    rows = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("{")]
        if not lines:
            raise RuntimeError("worker produced no output")
        rows.append(json.loads(lines[-1]))
    return {
        "n_procs": n_procs,
        "per_proc_sess_events_per_sec": [
            r["sess_events_per_sec"] for r in rows
        ],
        "aggregate_sess_events_per_sec": round(
            n_procs * n_events / max(r["sess_sec"] for r in rows), 1
        ),
        "aggregate_win_events_per_sec": round(
            n_procs * n_events / max(r["win_sec"] for r in rows), 1
        ),
        "shard_results": [
            {k: r[k] for k in ("seed", "n_sessions", "sum_value",
                               "n_windows")}
            for r in rows
        ],
    }


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    pairs = []
    seed0 = {}
    for rep in range(repeats):
        r1 = run_group(1, n_events)
        r4 = run_group(4, n_events)
        # determinism across cluster sizes: shard 0 (seed 0) computes the
        # same sessions in both groups
        s1 = r1["shard_results"][0]
        s4 = next(s for s in r4["shard_results"] if s["seed"] == 0)
        assert s1 == s4, (s1, s4)
        if seed0:
            assert s1 == seed0, (s1, seed0)
        seed0 = s1
        eff = r4["aggregate_sess_events_per_sec"] / (
            4 * r1["aggregate_sess_events_per_sec"]
        )
        weff = r4["aggregate_win_events_per_sec"] / (
            4 * r1["aggregate_win_events_per_sec"]
        )
        pairs.append(
            {
                "single_sess": r1["aggregate_sess_events_per_sec"],
                "four_sess_aggregate": r4["aggregate_sess_events_per_sec"],
                "sessionize_efficiency": round(eff, 3),
                "single_win": r1["aggregate_win_events_per_sec"],
                "four_win_aggregate": r4["aggregate_win_events_per_sec"],
                "window_efficiency": round(weff, 3),
            }
        )
        print(json.dumps(pairs[-1]), flush=True)
    effs = sorted(p["sessionize_efficiency"] for p in pairs)
    weffs = sorted(p["window_efficiency"] for p in pairs)
    out = {
        "n_events_per_shard": n_events,
        "cores_per_executor": CORES_PER_EXEC,
        "geometry": "1x vs 4x pinned local[2] processes, user-disjoint "
        "shards (weak scaling; see scripts/scaling_executors.py)",
        "same_window_pairs": pairs,
        "sessionize_median_efficiency": effs[len(effs) // 2],
        "window_median_efficiency": weffs[len(weffs) // 2],
        "shard0_invariant": seed0,
    }
    with open("/root/repo/BENCH_events.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: out[k] for k in (
        "n_events_per_shard", "sessionize_median_efficiency",
        "window_median_efficiency")}))


if __name__ == "__main__":
    main()
