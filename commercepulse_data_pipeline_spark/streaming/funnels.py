"""Continuously maintained ordered funnel — the streaming form of
``operators/windows.py::ordered_funnel``, with EXACT batch-equivalent
semantics under out-of-order arrival.

The subtlety a naive stateful funnel gets wrong: greedy-from-first
matching is NOT monotone under late data — a late-arriving EARLIER step-1
event changes ``t1`` and can invalidate every later match, so "advance a
step counter as events arrive" diverges from the batch answer. The fix is
the standard watermark discipline: per user, BUFFER events newer than the
watermark (bounded by rate × allowed lateness, the same bound every
event-time streaming aggregate carries), and FOLD through the funnel only
events the watermark has sealed (no event at-or-before it can still
arrive), in event-time order. The fold over sealed events in ts order is
exactly the batch greedy semantics: the first expected-type event
strictly after the previous match advances the step — so at any point the
emitted (t1..tk) equals ``ordered_funnel`` over every sealed event, and
when the stream drains it equals the batch answer exactly (pinned in
tests, late cross-batch arrivals included).

State per user: matched timestamps (k longs) + the sealed-fold cursor +
the bounded buffer. Output mode ``update``: one refreshed row per user
touched in the micro-batch.

At 100 TB: state is hash-partitioned by user in the state store; the
buffer is bounded by the watermark delay, never by stream length, and
events already sealed are folded once and dropped — the operator never
re-reads history.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _funnel_output_schema(
    steps: list[str], key_field: T.StructField
) -> T.StructType:
    # the key column inherits its NAME and TYPE from the input stream —
    # a string-keyed or differently-named user column flows through
    # unchanged instead of being coerced into a hardcoded user_id long
    return T.StructType(
        [
            T.StructField(key_field.name, key_field.dataType),
            T.StructField("steps_completed", T.IntegerType()),
            *[
                T.StructField(f"t{i}_us", T.LongType())
                for i in range(1, len(steps) + 1)
            ],
        ]
    )


def _funnel_state_schema(steps: list[str]) -> T.StructType:
    return T.StructType(
        [
            T.StructField("matches_us", T.ArrayType(T.LongType())),
            T.StructField("buf_ts_us", T.ArrayType(T.LongType())),
            T.StructField("buf_type", T.ArrayType(T.StringType())),
        ]
    )


def streaming_funnel(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "event_ts",
    type_col: str = "event_type",
) -> DataFrame:
    """``events`` must be a streaming DataFrame WITH a watermark on
    ``ts_col`` (the watermark defines the sealing boundary AND the buffer
    bound; an unwatermarked stream would buffer forever). Emits one row
    per touched user per micro-batch: ``steps_completed`` and
    ``t{i}_us`` epoch-micros per matched step (NULL from the first
    unreached step), always equal to the batch funnel over the sealed
    prefix."""
    if not steps:
        raise ValueError("streaming_funnel needs at least one step")
    step_list = list(steps)
    key_field = events.schema[user_col]
    out_schema = _funnel_output_schema(step_list, key_field)
    state_schema = _funnel_state_schema(step_list)
    key_name = key_field.name

    def update_fn(
        key: tuple, pdfs: Iterator[Any], state: GroupState
    ) -> Iterator[Any]:
        import pandas as pd

        if state.exists:
            matches, buf_ts, buf_type = state.get
            matches = list(matches)
            buf = list(zip(buf_ts, buf_type))
        else:
            matches, buf = [], []

        wm_us = state.getCurrentWatermarkMs() * 1000
        if not state.hasTimedOut:
            for pdf in pdfs:
                for row in pdf.itertuples(index=False):
                    rts = getattr(row, ts_col, None)
                    if rts is None or pd.isna(rts):
                        continue
                    r_us = int(pd.Timestamp(rts).value // 1000)
                    # the watermark contract: events at-or-before the
                    # current watermark may be dropped by upstream
                    # operators anyway — dropping them here keeps the fold
                    # replay-deterministic (they can never be
                    # distinguished from never-arrived)
                    if r_us <= wm_us:
                        continue
                    buf.append((r_us, getattr(row, type_col, None)))

        # seal and fold: everything at-or-before the watermark is final
        sealed = sorted(e for e in buf if e[0] <= wm_us)
        buf = [e for e in buf if e[0] > wm_us]
        for r_us, etype in sealed:
            k = len(matches)
            if k < len(step_list) and etype == step_list[k] and (
                k == 0 or r_us > matches[k - 1]
            ):
                matches.append(r_us)

        state.update(
            (matches, [t for t, _ in buf], [ty for _, ty in buf])
        )
        if buf:
            # wake this key when the watermark passes its oldest buffered
            # event, so idle users finalize WITHOUT needing another event
            # of their own (no per-key heartbeat requirement). The µs→ms
            # floor could land at-or-below the current watermark (which
            # Spark rejects / would re-fire without progress) — clamp to
            # watermark + 1 ms.
            state.setTimeoutTimestamp(
                max(min(t for t, _ in buf) // 1000, wm_us // 1000 + 1)
            )
        row_out = {
            key_name: key[0],
            "steps_completed": len(matches),
        }
        for i in range(1, len(step_list) + 1):
            row_out[f"t{i}_us"] = matches[i - 1] if len(matches) >= i else None
        # None here coerces the t*_us columns to float64 (the pandas
        # chunk pitfall fixed for 64-bit hashes via multimodal._exact_frame)
        # — SAFE for epoch micros, which stay < 2^53 until year ~2255
        yield pd.DataFrame([row_out])

    return events.groupBy(user_col).applyInPandasWithState(
        update_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
