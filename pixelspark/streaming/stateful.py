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
