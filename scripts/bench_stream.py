"""Streaming ingest throughput bench (VERDICT r8 item 5): the batch
suite never timed the T1-T3 path, so the structured-streaming ingest
had correctness evidence but no perf discipline. This measures
`run_stream_ingest` (trade-feed replay -> foreachBatch -> bronze
append + DLQ, checkpointed, availableNow) at sf1 and reports rows/sec.

Protocol: run 1 stages the replay files AND drains them (warm-up +
staging, excluded from the measurement); each timed run then reuses
the SAME stage dir with a FRESH checkpoint + warehouse, so the wall
clock covers exactly the drain: stream read -> observe -> foreachBatch
ingest (bronze write + DLQ routing) -> commit. Best of N runs, one
JSON line to stdout and BENCH_STREAM.json.

Gate (declared in BASELINE.md): rows/sec within 2x of the recorded
value, same discipline as the batch suite.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crypto_lakehouse_spark.session import get_spark_session
from crypto_lakehouse_spark.streaming.file_stream import run_stream_ingest

SF = os.environ.get("SPARK_GRAFT_STREAM_SF_DIR", "/tmp/spark_graft_sf1")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def main() -> int:
    if not os.path.isdir(SF):
        print(f"missing {SF}; run scripts/gen_sf1.py first", file=sys.stderr)
        return 1
    spark = get_spark_session("bench-stream")
    root = tempfile.mkdtemp(prefix="bench_stream_")
    stage = os.path.join(root, "stage")
    os.makedirs(stage, exist_ok=True)

    # Staging + warm-up drain (not timed).
    _, metrics = run_stream_ingest(
        spark, SF, os.path.join(root, "wh_warm"), stage_dir=stage,
        ckpt_dir=os.path.join(root, "ckpt_warm"),
    )
    # Input volume: the listener's engine-side per-batch row counts
    # (keys documented in run_stream_ingest); fall back to the final
    # cumulative bronze count + DLQ rows if the async listener missed.
    total_rows = sum(m.get("engine_input_rows") or 0 for m in metrics)
    if not total_rows and metrics:
        total_rows = metrics[-1].get("bronze", 0) + sum(
            m.get("dlq", 0) for m in metrics
        )

    best = float("inf")
    for i in range(RUNS):
        wh = os.path.join(root, f"wh_{i}")
        ckpt = os.path.join(root, f"ckpt_{i}")
        t0 = time.perf_counter()
        run_stream_ingest(spark, SF, wh, stage_dir=stage, ckpt_dir=ckpt)
        best = min(best, time.perf_counter() - t0)
        shutil.rmtree(wh, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)

    out = {
        "metric": "stream_ingest_rows_per_sec",
        "value": round(total_rows / best, 1),
        "unit": "rows/sec",
        "rows": total_rows,
        "drain_wall_s": round(best, 3),
        "runs_best_of": RUNS,
        "sf_dir": SF,
    }
    line = json.dumps(out)
    print(line)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_STREAM.json"), "w") as f:
        f.write(line + "\n")
    shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
