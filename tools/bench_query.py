"""Time individual entry queries exactly as bench.py does (count-terminated,
min over reps). Usage: python tools/bench_query.py <query> [reps]"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NAMES = sys.argv[1].split(",") if len(sys.argv) > 1 else ["text_doc_metrics"]
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import bench

    spark = bench.get_session()
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    qs = entry.queries()
    for name in NAMES:
        times = []
        for _ in range(REPS):
            t0 = time.time()
            qs[name](spark, SF_DIR).count()
            times.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        print(json.dumps({"query": name, "min_s": min(times), "times": times}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
