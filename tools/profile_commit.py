"""Profile one SnapshotTable commit end-to-end (VERDICT r8 item 2).

Times each phase of a tiny append / upsert / merge on a local table:
manifest list/read, _write_snap (the Spark write), entry stats, CAS
publish — to find the dominant fixed cost in the lifecycle bench rows.
Run: python tools/profile_commit.py
"""
from __future__ import annotations

import cProfile
import io
import os
import pstats
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pixelspark.session import get_spark  # noqa: E402
from pixelspark.table import SnapshotTable  # noqa: E402


def main() -> None:
    spark = get_spark("profile-commit")
    root = tempfile.mkdtemp(prefix="pixelspark-profile-")
    try:
        t = SnapshotTable(spark, f"{root}/t")
        df = spark.createDataFrame(
            [(i, f"v{i}") for i in range(100)], "k long, v string")
        df.count()  # warm the session

        # warm-up commits (JVM warm, code paths JIT'd)
        for _ in range(3):
            t.append(df)

        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            t.append(df)
        t1 = time.perf_counter()
        print(f"append: {(t1 - t0) / n * 1000:.0f} ms/commit over {n}")

        t0 = time.perf_counter()
        for i in range(5):
            t.upsert(spark.createDataFrame(
                [(1, f"u{i}")], "k long, v string"), keys=("k",))
        t1 = time.perf_counter()
        print(f"upsert: {(t1 - t0) / 5 * 1000:.0f} ms/commit over 5")

        pr = cProfile.Profile()
        pr.enable()
        for _ in range(5):
            t.append(df)
        pr.disable()
        s = io.StringIO()
        ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
        ps.print_stats(30)
        print(s.getvalue())
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
