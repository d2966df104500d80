"""Custom stateful streaming: current-order-state upsert.

The reference's "current order state" is last-writer-wins dedup over a
batch reload (D1, reference src/transformer.py:40). The true streaming
form needs per-key mutable state — plain append/update aggregation can't
express "replace this order's row" — so this is the
``applyInPandasWithState`` operator (SURVEY §2.10 "Stateful ops" row):

- state per order_id: (last event-time micros, status, amount, n_events)
- a NULL event time never beats a real one (D1's NaT-sorts-first rule)
- late/out-of-order events update state only if their event time is >=
  the stored one (ties: latest arrival wins, matching keep-last)
- emits the refreshed state row for every key touched in the micro-batch
  (output mode: update)

Scale: state lives in the state store, partitioned by order_id hash —
bounded by live-key cardinality, not stream length. Pair with a watermark
upstream to bound reprocessing; add ``GroupStateTimeout`` eviction when
keys are finite-lived.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ORDER_STATE_OUTPUT = T.StructType(
    [
        T.StructField("order_id", T.StringType()),
        T.StructField("order_status", T.StringType()),
        T.StructField("order_amount", T.DoubleType()),
        T.StructField("updated_at_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ts_us", T.LongType()),
        T.StructField("status", T.StringType()),
        T.StructField("amount", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ]
)


def _update_fn(
    key: tuple, pdfs: Iterator[Any], state: GroupState
) -> Iterator[Any]:
    import pandas as pd

    if state.exists:
        ts_us, status, amount, n = state.get
    else:
        ts_us, status, amount, n = None, None, None, 0

    for pdf in pdfs:
        for row in pdf.itertuples(index=False):
            n += 1
            rts = getattr(row, "event_ts", None)
            if rts is None or pd.isna(rts):
                continue  # NULL event time never wins (D1 NaT rule)
            r_us = int(pd.Timestamp(rts).value // 1000)
            if ts_us is None or r_us >= ts_us:
                ts_us = r_us
                status = getattr(row, "order_status", None)
                amt = getattr(row, "order_amount", None)
                amount = None if amt is None or pd.isna(amt) else float(amt)

    state.update((ts_us, status, amount, n))
    # a None ts coerces updated_at_us to float64 in this single-row frame
    # (the pandas chunk pitfall fixed for 64-bit hashes via
    # multimodal._exact_frame) — SAFE for epoch micros (< 2^53 until ~2255)
    yield pd.DataFrame(
        [
            {
                "order_id": key[0],
                "order_status": status,
                "order_amount": amount,
                "updated_at_us": ts_us,
                "n_events": n,
            }
        ]
    )


def current_order_state(order_events: DataFrame) -> DataFrame:
    """Streaming upsert view of order state.

    ``order_events`` must carry: order_id string, event_ts timestamp,
    order_status string, order_amount double.
    """
    return order_events.groupBy("order_id").applyInPandasWithState(
        _update_fn,
        outputStructType=ORDER_STATE_OUTPUT,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
