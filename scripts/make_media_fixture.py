"""Write the committed multimodal fixture parquet (tests/fixtures/
media_64.parquet) from the deterministic synthetic_media rows.

The fixture exists so the driver's DuckDB oracle can read the exact same
payload BLOBs via read_parquet() that the Spark mapInPandas feature
extractor consumes — /root/testdata is read-only, so the fixture lives in
the repo. Re-running this script is a no-op byte-wise (seeded rows, fixed
pyarrow layout); commit the output if it changes.
"""

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from phphinder_spark.ops.multimodal import synthetic_media_rows

OUT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "tests", "fixtures",
    "media_64.parquet",
)


def main() -> None:
    import hashlib

    rows = synthetic_media_rows(64, seed=42)
    cols = list(zip(*rows))
    payloads = [bytes(p) for p in cols[2]]
    table = pa.table(
        {
            "media_id": pa.array(cols[0], pa.int64()),
            "kind": pa.array(cols[1], pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(cols[3], pa.string()),
            "width": pa.array(cols[4], pa.int32()),
            "height": pa.array(cols[5], pa.int32()),
            "duration_ms": pa.array(cols[6], pa.int64()),
            # golden digest: DuckDB 1.0 has no sha256(BLOB), so the oracle
            # reads this precomputed column while Spark recomputes the
            # digest from the raw payload bytes inside mapInPandas —
            # a mismatch means Spark mangled the binary column
            "sha256_expected": pa.array(
                [hashlib.sha256(p).hexdigest() for p in payloads], pa.string()
            ),
        }
    )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(table, OUT, compression="snappy")
    print(f"wrote {OUT}: {table.num_rows} rows")


if __name__ == "__main__":
    main()
