"""Capture .explain('formatted') output for bench queries into
plans/r13/<query>_<tag>.txt (r13 optimization-round deliverable: the
judge checks plan claims against these files).

Usage: python tools/capture_plans.py <tag> [query ...]
  tag    = 'before' | 'after' (file suffix)
  query  = subset to capture (default: every bench HEADLINE row)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pixelspark.session import get_spark  # noqa: E402
from pixelspark import queries as Q  # noqa: E402

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    if not names:
        import bench

        names = [n for n in bench.HEADLINE]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("pixelspark-plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        try:
            df = Q.QUERIES[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
        except Exception as e:  # lifecycle rows mutate scratch tables; never abort the sweep
            plan = f"<capture failed: {e}>"
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {len(plan)} chars -> {path}")


if __name__ == "__main__":
    main()
