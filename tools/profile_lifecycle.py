"""Profile the six storage-lifecycle bench rows: wall time and Spark
job count per engine call (append/merge/upsert/delete/update/compact/
overwrite/read/refresh), so the per-commit job floor is attributed to
specific calls rather than guessed.

Usage: python tools/profile_lifecycle.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pixelspark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

ROWS = [
    "q_incremental_matview",
    "q_join_matview",
    "q_topn_matview",
    "q_catalog_txn",
    "q_row_tracking",
    "q_maintain_frag",
]


def main() -> None:
    spark = get_spark("pixelspark-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    def job_count() -> int:
        # DAGScheduler's job id counter: monotonically increasing,
        # reading it costs one py4j hop (profiling only, not engine
        # code).
        return sc._jsc.sc().dagScheduler().numTotalJobs()

    from pixelspark import queries as Q
    from pixelspark.table import SnapshotTable
    from pixelspark.catalog import Catalog
    from pixelspark.ops import matview as MV

    stats: dict[str, list] = defaultdict(list)
    depth = [0]

    def wrap(cls, name):
        orig = getattr(cls, name)

        def timed(*a, **kw):
            if depth[0]:  # only time top-level engine calls
                return orig(*a, **kw)
            depth[0] += 1
            t0, j0 = time.time(), job_count()
            try:
                return orig(*a, **kw)
            finally:
                depth[0] -= 1
                stats[f"{cls.__name__}.{name}"].append(
                    (round(time.time() - t0, 3), job_count() - j0))

        setattr(cls, name, timed)
        return orig

    table_methods = [
        "append", "append_once", "overwrite", "upsert", "merge",
        "delete", "update", "compact", "read", "read_changes",
        "enable_row_tracking", "latest_version",
    ]
    saved = [(SnapshotTable, m, wrap(SnapshotTable, m)) for m in table_methods]
    saved += [(Catalog, m, wrap(Catalog, m))
              for m in ("maintain", "read", "commit_multi", "create_table",
                        "pin_table")]
    _ = MV  # imported so matview-internal table calls resolve the wrapped class

    names = sys.argv[1:] or ROWS
    for qname in names:
        stats.clear()
        t0, j0 = time.time(), job_count()
        Q.QUERIES[qname](spark, SF_DIR).write.format("noop").mode(
            "overwrite").save()
        total_t, total_j = time.time() - t0, job_count() - j0
        print(f"\n=== {qname}: {total_t:.2f}s, {total_j} jobs ===")
        acc_t = acc_j = 0.0
        for key, samples in sorted(stats.items(),
                                   key=lambda kv: -sum(s[0] for s in kv[1])):
            st = sum(s[0] for s in samples)
            sj = sum(s[1] for s in samples)
            acc_t += st
            acc_j += sj
            per = " ".join(f"{t:.2f}/{j}" for t, j in samples)
            print(f"  {key:34s} n={len(samples):2d} {st:6.2f}s {sj:3d} jobs  [{per}]")
        print(f"  {'(attributed)':34s}    {acc_t:9.2f}s {int(acc_j):3d} jobs; "
              f"unattributed {total_t - acc_t:.2f}s {total_j - int(acc_j)} jobs")

    for cls, m, orig in saved:
        setattr(cls, m, orig)


if __name__ == "__main__":
    main()
