"""Custom stateful streaming operator via applyInPandasWithState —
arbitrary per-key state beyond what windowed aggregation expresses
(SURVEY.md §2.9 extension; the Spark-native mechanism for operators
like running totals with custom alerting, session state machines,
rate trackers).

State is per shop: cumulative event count + cumulative value.  Each
micro-batch updates the state and emits the new running totals (update
mode).  State lives in the state store (checkpointed, fault-tolerant);
memory is bounded by #keys, not stream length.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("shop", T.LongType(), False),
        T.StructField("total_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), True),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType(), False),
        T.StructField("v", T.DoubleType(), False),
    ]
)


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    n, v = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        v += float(pdf["value"].fillna(0.0).sum())
    state.update((n, v))
    yield pd.DataFrame({"shop": [key[0]], "total_events": [n], "total_value": [v]})


def running_shop_totals(events: DataFrame) -> DataFrame:
    """Streaming running totals per shop with explicit keyed state."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithState (Spark 4) — the successor API to
# applyInPandasWithState above: typed, named, composable state
# primitives (ValueState / ListState / MapState, optional TTL and
# timers) instead of one opaque state tuple.  Requires the RocksDB
# state store provider (set by run_type_breakdown / the caller).
# ---------------------------------------------------------------------------

TWS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("shop", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("type_count", T.LongType(), False),
        T.StructField("shop_total", T.LongType(), False),
    ]
)


from pyspark.sql.streaming import StatefulProcessor  # noqa: E402


class ShopTypeBreakdown(StatefulProcessor):
    """Per-shop running event counts broken down by event type.

    MapState holds event_type -> count (per-entry state-store rows, so
    updating one type does not rewrite the whole map — the win over
    packing a dict into applyInPandasWithState's single tuple);
    ValueState holds the shop's running total.  Emits one row per
    (shop, type) touched in the micro-batch, update-mode style.
    """

    def init(self, handle) -> None:
        self._by_type = handle.getMapState(
            "by_type", "event_type STRING", "n BIGINT"
        )
        self._total = handle.getValueState("total", "n BIGINT")

    def handleInputRows(self, key, rows, timerValues):
        shop = key[0]
        batch_counts: dict[str, int] = {}
        n_batch = 0
        for pdf in rows:
            for et, cnt in pdf["event_type"].value_counts().items():
                batch_counts[et] = batch_counts.get(et, 0) + int(cnt)
                n_batch += int(cnt)
        prev = self._total.get()
        total = (prev[0] if prev is not None else 0) + n_batch
        self._total.update((total,))
        out_types, out_counts = [], []
        for et, cnt in sorted(batch_counts.items()):
            old = (
                self._by_type.getValue((et,))[0]
                if self._by_type.containsKey((et,))
                else 0
            )
            new = old + cnt
            self._by_type.updateValue((et,), (new,))
            out_types.append(et)
            out_counts.append(new)
        yield pd.DataFrame(
            {
                "shop": [shop] * len(out_types),
                "event_type": out_types,
                "type_count": out_counts,
                "shop_total": [total] * len(out_types),
            }
        )

    def handleInitialState(self, key, initialState, timerValues) -> None:
        pass

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter(())

    def close(self) -> None:
        pass


def shop_type_breakdown(events: DataFrame) -> DataFrame:
    """transformWithStateInPandas pipeline: running per-(shop, type)
    counts with typed composite state.  Caller must enable the RocksDB
    state-store provider (transformWithState requires it):

        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider")
    """
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=ShopTypeBreakdown(),
        outputStructType=TWS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
