"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference's DWD→DM stage keeps a running aggregate by re-reading the
mart and delta-merging every poll tick (``SRC/DWD2DM.scala:54-85``).
Re-platformed onto Structured Streaming, the running total belongs in
the STATE STORE: each micro-batch updates per-key state and emits the
new totals — no sink re-read, no double-add hazard, checkpointed state
recovery for free.

Exactness: money/quantity sums accumulate as ``decimal.Decimal`` inside
the Arrow-batched state function (the Spark side casts the value column
to ``DECIMAL(38,4)`` first, so pandas receives exact decimals, and the
state itself is carried as the decimal's string form). Double summation
order across micro-batches therefore can't perturb the result — the
emitted total is bit-identical to a one-shot batch aggregate.

Scale: state is partitioned by group key across the cluster's state
stores; each micro-batch shuffles only its own rows to their key's
partition (update-mode emission, no full-state scan per batch).
"""

from __future__ import annotations

from decimal import Decimal
from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def streaming_running_sum(
    stream_df: DataFrame,
    keys: list[str],
    value_col: str,
) -> DataFrame:
    """Per-key running sum + row count over a stream, emitted after every
    micro-batch that touches the key (update mode).

    ``stream_df[value_col]`` must already be DECIMAL (cast upstream) so
    the in-state accumulation is exact. Output columns: the keys,
    ``run_sum`` (STRING — the exact decimal, cast by the consumer) and
    ``n_rows`` (LONG).
    """
    key_fields = [stream_df.schema[k] for k in keys]
    out_schema = T.StructType(
        key_fields
        + [
            T.StructField("run_sum", T.StringType()),
            T.StructField("n_rows", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("total", T.StringType()),
            T.StructField("n", T.LongType()),
        ]
    )

    def update(key, pdfs: Iterable[pd.DataFrame], state):
        if state.exists:
            total, n = state.get
            total = Decimal(total)
        else:
            total, n = Decimal(0), 0
        for pdf in pdfs:
            vals = pdf[value_col].dropna()
            # Arrow delivers DECIMAL columns as decimal.Decimal objects —
            # python-exact addition, no float in the loop
            total += sum(vals, Decimal(0))
            n += len(vals)
        state.update((str(total), n))
        yield pd.DataFrame(
            [list(key) + [str(total), n]],
            columns=[f.name for f in out_schema.fields],
        )

    return stream_df.groupBy(*keys).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def streaming_first_seen(
    stream_df: DataFrame,
    keys: list[str],
    order_col: str | None = None,
) -> DataFrame:
    """Streaming exact-dedup: emit each key's row only the FIRST time it
    is ever seen (state = a per-key seen marker). The streaming analog
    of the exact-dedup keep-first batch operator — rows of replayed /
    duplicate keys in later micro-batches are dropped.

    Within one micro-batch a key's rows arrive in shuffle order; with
    ``order_col`` the MINIMUM row by that column is elected instead of
    an arbitrary first — making the operator fully deterministic
    (ACROSS batches arrival order wins, WITHIN a batch ``order_col``
    does), which is what lets an end-state be oracle-verified.

    Scale note: state per distinct key is one boolean — the smallest
    possible; keys partition across state stores. For unbounded key
    cardinality pair with a state TTL (event-time timeout) in a real
    deployment.
    """
    out_schema = stream_df.schema
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])
    cols = stream_df.columns

    def update(key, pdfs: Iterable[pd.DataFrame], state):
        if state.exists:
            return
        first = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            cand = (
                pdf.loc[[pdf[order_col].idxmin()]][cols]
                if order_col is not None
                else pdf.iloc[[0]][cols]
            )
            if first is None:
                first = cand
            elif order_col is not None and (
                cand[order_col].iloc[0] < first[order_col].iloc[0]
            ):
                first = cand
        state.update((True,))
        if first is not None:
            yield first

    return stream_df.groupBy(*keys).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
