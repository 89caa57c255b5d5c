"""Per-key running aggregation with cross-micro-batch state.

Two implementations of the same contract — one ValueState-style record
per user holding (event count, integer-quantized value sum, emission
ordinal), one output row per (user, micro-batch with >=1 row for the
user):

* ``running_totals`` — applyInPandasWithState (GroupState), the API this
  sandbox fully supports; this is what the oracle-gated driver query
  runs.
* ``running_totals_tws`` — transformWithStateInPandas, the Spark 4.x
  typed-state API on the RocksDB store.  ENVIRONMENT-GATED: the TWS
  Python runner needs ``google.protobuf`` for state serialization, which
  this container does not ship (verified: ModuleNotFoundError; the
  attempt and gate are pinned by tests/test_stream_ops.py::
  test_transform_with_state_gate).  On a cluster with protobuf installed
  the function works as written and needs
  spark.sql.streaming.stateStore.providerClass =
  ...state.RocksDBStateStoreProvider.

Scale shape (both): state is O(users) and partitioned by the groupBy
key, so a 4N-executor cluster splits the shuffle AND the state store 4N
ways.  Determinism contract (what makes the DuckDB oracle exact):
`value` is quantized to int64 micro-units (floor(value * 10000)) BEFORE
summing, so every addition is associative integer math — pandas'
in-batch sum order and the state+batch accumulation order cannot change
the result.  Float summation here would be order-dependent and
unprovable.

Reference parity: the reference service keeps no cross-request state
(app/api.py handles each request in isolation); this operator is part of
the beyond-reference streaming surface SURVEY §2.2 requires.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

QUANT = 10_000  # value -> int64 micro-units: floor(value * QUANT)

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("emit_seq", LongType()),
    StructField("n_events_cum", LongType()),
    StructField("sum_q_cum", LongType()),
])

STATE_SCHEMA = StructType([
    StructField("cnt", LongType()),
    StructField("sq", LongType()),
    StructField("seq", LongType()),
])


def _totals_group(key, pdfs: Iterator["pd.DataFrame"],
                  state: GroupState) -> Iterator["pd.DataFrame"]:
    cnt, sq, seq = state.get if state.exists else (0, 0, 0)
    n = 0
    s = 0
    for pdf in pdfs:
        n += len(pdf)
        s += int(pdf["v_q"].sum())
    cnt, sq, seq = cnt + n, sq + s, seq + 1
    state.update((cnt, sq, seq))
    yield pd.DataFrame({"user_id": [key[0]], "emit_seq": [seq],
                        "n_events_cum": [cnt], "sum_q_cum": [sq]})


def _quantized(events):
    from pyspark.sql import functions as F
    return events.select(
        "user_id",
        F.floor(F.col("value") * QUANT).cast("bigint").alias("v_q"))


def running_totals(events):
    """Streaming events -> per-user running totals (GroupState form)."""
    return _quantized(events).groupBy("user_id").applyInPandasWithState(
        _totals_group, OUTPUT_SCHEMA, STATE_SCHEMA,
        "append", GroupStateTimeout.NoTimeout)


class RunningTotalsProcessor:
    """transformWithStateInPandas form of the same contract (see module
    docstring for the environment gate).  Defined lazily against the
    StatefulProcessor ABC so importing this module never requires the
    TWS runtime deps."""

    def init(self, handle) -> None:
        self._state = handle.getValueState(
            "totals", "cnt bigint, sq bigint, seq bigint")

    def handleInputRows(self, key, rows, timerValues):
        cnt, sq, seq = (self._state.get() if self._state.exists()
                        else (0, 0, 0))
        n = 0
        s = 0
        for pdf in rows:
            n += len(pdf)
            s += int(pdf["v_q"].sum())
        cnt, sq, seq = cnt + n, sq + s, seq + 1
        self._state.update((cnt, sq, seq))
        yield pd.DataFrame({"user_id": [key[0]], "emit_seq": [seq],
                            "n_events_cum": [cnt], "sum_q_cum": [sq]})

    def close(self) -> None:
        pass


def running_totals_tws(events):
    """transformWithStateInPandas form — requires google.protobuf (absent
    in this container) and the RocksDB state store provider; raises
    ModuleNotFoundError here by design rather than hiding the gate."""
    import google.protobuf  # noqa: F401 — the documented environment gate
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class _Proc(RunningTotalsProcessor, StatefulProcessor):
        pass

    return _quantized(events).groupBy("user_id").transformWithStateInPandas(
        _Proc(), "user_id bigint, emit_seq bigint, n_events_cum bigint, "
        "sum_q_cum bigint", outputMode="Append", timeMode="None")
