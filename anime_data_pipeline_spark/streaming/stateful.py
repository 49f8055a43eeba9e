"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY §2.9 streaming extension: "custom stateful operators").

``running_user_totals`` keeps one (count, total) state cell per
user_id across micro-batches and emits the updated running totals for
every user seen in the batch — the building block the built-in
windowed aggs can't express (arbitrary per-key state transition
functions: counters with custom merge, online ML, CEP-style rules).

State size = O(distinct users); at 100 TB-scale streams pair this
with a timeout (GroupStateTimeout) or watermark-based eviction so
dead keys age out — here NoTimeout since the replay harness is finite.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total_u bigint"


def _update_totals(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    # Money in exact integer ten-thousandths (compat.py convention):
    # the state cell is a BIGINT, so the running total is independent
    # of batch split and arrival order; the emitted dollars use the
    # same IEEE conversion as units_money / the DuckDB oracle.
    import numpy as np

    n, total_u = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        v = pdf["value"].to_numpy(dtype="float64")
        total_u += int(np.floor(v * 10000.0 + 0.5).astype("int64").sum())
    state.update((n, total_u))
    total = float(np.floor(np.float64(total_u) / 100.0 + 0.5) / 100.0)
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) maintained in the state
    store; one updated row per user per micro-batch."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
