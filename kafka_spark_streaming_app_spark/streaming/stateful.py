"""Custom stateful streaming operators via ``applyInPandasWithState``.

For semantics the built-in windowed/session aggregations can't express
(per-key accumulators with custom emission rules), Structured Streaming
exposes arbitrary per-key state with timeouts. The example operator
here is a running per-key spend tracker that emits an updated snapshot
every micro-batch — the shape any custom accumulator follows
(fraud velocity counters, per-user token budgets, dedup-seen sets).

Scale notes: state lives in the state store partitioned by key (one
shuffle); a pandas batch sees all rows for its keys in the micro-batch.
State size is the operator author's responsibility — keep per-key
state O(1) (this one stores 3 numbers per key).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.StringType(), True),
        T.StructField("n_orders", T.LongType(), True),
        T.StructField("total_spend", T.DoubleType(), True),
        T.StructField("max_order", T.DoubleType(), True),
    ]
)

RUNNING_TOTALS_STATE = T.StructType(
    [
        T.StructField("n_orders", T.LongType(), True),
        T.StructField("total_spend", T.DoubleType(), True),
        T.StructField("max_order", T.DoubleType(), True),
    ]
)


def running_totals(
    orders: DataFrame,
    key_col: str = "user_id",
    amount_col: str = "total_amount",
) -> DataFrame:
    """Per-key running (count, sum, max) across the whole stream —
    state carried between micro-batches, snapshot emitted per batch."""

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        n, total, mx = state.get if state.exists else (0, 0.0, None)
        for pdf in pdfs:
            amounts = pdf[amount_col].dropna()
            n += len(amounts)
            total += float(amounts.sum())
            if len(amounts):
                batch_max = float(amounts.max())
                mx = batch_max if mx is None else max(mx, batch_max)
        state.update((n, total, mx))
        yield pd.DataFrame(
            [
                {
                    "user_id": key[0],
                    "n_orders": n,
                    "total_spend": total,
                    # None (not a -inf sentinel) when no non-null amount
                    # has ever been seen for this key
                    "max_order": mx,
                }
            ]
        )

    return (
        orders.select(key_col, amount_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_TOTALS_OUTPUT,
            stateStructType=RUNNING_TOTALS_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- transformWithState (second-generation stateful API) --------------------

CATEGORY_SPEND_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.StringType(), True),
        T.StructField("n_orders", T.LongType(), True),
        T.StructField("n_categories", T.LongType(), True),
        T.StructField("total_spend", T.DoubleType(), True),
    ]
)


def category_spend_tracker(orders: DataFrame) -> DataFrame:
    """Per-user spend + distinct-category tracker on the
    second-generation stateful API (``transformWithStateInPandas``,
    Spark 4): a ValueState holds the O(1) running totals and a
    MapState holds the per-category order counts — composite typed
    state the first-generation ``applyInPandasWithState`` flat tuple
    cannot express incrementally.

    Emits an updated (user_id, n_orders, n_categories, total_spend)
    snapshot for every key seen in the micro-batch. Requires the
    RocksDB state store provider (transformWithState's backing store);
    the caller sets ``spark.sql.streaming.stateStore.providerClass``.
    The TWS runtime also needs the ``protobuf`` package (its Python
    worker speaks protobuf to the state server) — absent in this
    sandbox, so the covering test import-skips with remediation; the
    first-generation ``running_totals`` above is the fully-exercised
    stateful path here.

    Scale: state is per-key O(#categories) — bounded by the catalog,
    not the stream; the shuffle is the single groupBy(user_id).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _CategorySpend(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "n_orders long, total_spend double"
            )
            self._per_cat = handle.getMapState(
                "per_cat", "category string", "n long"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total = (
                self._totals.get() if self._totals.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["total_amount"].dropna().sum())
                for cat in pdf["category"].dropna():
                    prev = (
                        self._per_cat.getValue((cat,))[0]
                        if self._per_cat.containsKey((cat,))
                        else 0
                    )
                    self._per_cat.updateValue((cat,), (prev + 1,))
            self._totals.update((n, total))
            n_cats = sum(1 for _ in self._per_cat.keys())
            yield pd.DataFrame(
                [
                    {
                        "user_id": key[0],
                        "n_orders": n,
                        "n_categories": n_cats,
                        "total_spend": total,
                    }
                ]
            )

        def close(self) -> None:
            pass

    return (
        orders.select("user_id", "category", "total_amount")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_CategorySpend(),
            outputStructType=CATEGORY_SPEND_OUTPUT,
            outputMode="Update",
            timeMode="None",
        )
    )
