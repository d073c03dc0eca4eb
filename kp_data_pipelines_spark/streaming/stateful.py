"""transformWithState operators (Spark 4 arbitrary-state API v2).

The v2 API replaces applyInPandasWithState's single opaque state blob
with named, schema'd state variables managed by the state store — the
engine can evolve, TTL, and rebalance them. Here: a per-user running
lifetime aggregate (count + total) that emits the refreshed totals on
every micro-batch the user appears in.

Scale: state is partitioned by the grouping key across executors; each
micro-batch touches only the keys present in it. The batch twin is a
plain groupBy — see test_streaming.py for the equivalence test.

NOTE: the v2 state protocol requires `protobuf` (and the RocksDB state
store provider); environments without protobuf skip the test — the
applyInPandasWithState sessionizer (events.py) is the dependency-free
stateful path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"


class RunningTotalsProcessor(StatefulProcessor):
    """ValueState (n_events, total_value) per user_id."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState(
            "totals", "n_events bigint, total_value double"
        )

    def handleInputRows(self, key, rows, timerValues):
        if self._totals.exists():
            n, total = self._totals.get()
        else:
            n, total = 0, 0.0
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._totals.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    def close(self) -> None:
        pass


def running_totals_stream(events: DataFrame) -> DataFrame:
    """Per-user lifetime (count, total value), updated each micro-batch."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
