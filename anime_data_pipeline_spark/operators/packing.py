"""Sequence packing: assign documents to fixed token-budget training
chunks (context windows).

Two variants with different semantics/scale tradeoffs:

- :func:`chunk_by_budget` — CONCATENATIVE packing: documents are laid
  out in a deterministic order and the stream is cut every ``budget``
  tokens (a document may straddle a cut; the trainer splits it). Pure
  window arithmetic — one shuffle+sort per group, whole-stage codegen,
  oracle-checkable — and the right default for GPT-style pretraining
  where documents are concatenated with separators anyway.

- :func:`pack_greedy` — DOCUMENT-PRESERVING packing: a document never
  straddles chunks; a new chunk starts when the next document would
  overflow the budget. The running remainder is inherently sequential
  state, so it runs as ``applyInPandas`` per group with a vectorized
  numpy loop inside — the custom-stateful-operator pattern (same as
  streaming's state ops). Per-group partial order is preserved;
  oversize documents (> budget) get a chunk of their own.

Group by a partition-ish column (``source``) so packing parallelizes:
state never crosses groups, so the sequential part is per-group, not
global.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def chunk_by_budget(
    df: DataFrame,
    group_col: str,
    order_col: str,
    weight_col: str,
    budget: int,
) -> DataFrame:
    """Concatenative packing: within each group (ordered by
    ``order_col``), cut the cumulative ``weight_col`` stream every
    ``budget`` tokens.

    Emits ``chunk_id`` = which chunk the document STARTS in
    (exclusive-prefix-sum div budget) and ``chunk_offset`` = its token
    offset inside that chunk."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_before = F.sum(weight_col).over(w) - F.col(weight_col)
    return df.withColumn("chunk_id", F.floor(cum_before / budget)).withColumn(
        "chunk_offset", (cum_before % budget).cast("long")
    )


def pack_greedy_py(weights: Iterable[int], budget: int) -> list[int]:
    """Pure-Python spec of greedy document-preserving packing — the
    golden oracle for the distributed form: sequential first-fit into
    the CURRENT chunk only (no look-back), new chunk on overflow."""
    chunks, acc, cur = [], 0, 0
    for wt in weights:
        if acc > 0 and acc + wt > budget:
            cur += 1
            acc = 0
        chunks.append(cur)
        acc += wt
    return chunks


def pack_greedy_np(weights, budget: int):
    """Vectorized pack_greedy_py: chunk starts found by a searchsorted
    CHASE over the prefix-sum array — the Python loop runs once per
    CHUNK (≈ total_tokens/budget iterations), not once per document,
    so a 10M-doc group costs ~10M/budget loop steps plus O(n log n)
    vectorized work. Byte-identical to :func:`pack_greedy_py` for
    non-negative weights (the golden property test pins it); negative
    weights (no real token count is negative) fall back to the spec
    loop because the chase needs a monotone prefix."""
    import numpy as np

    w = np.asarray(weights, dtype="int64")
    n = len(w)
    if n == 0:
        return np.empty(0, dtype="int64")
    if (w < 0).any():
        return np.asarray(pack_greedy_py(w.tolist(), budget), dtype="int64")
    prefix = np.cumsum(w)
    starts = []
    s = 0
    while s < n:
        starts.append(s)
        base = prefix[s - 1] if s > 0 else 0
        # first index whose inclusive prefix overflows the chunk
        j = int(np.searchsorted(prefix, base + budget, side="right"))
        if j >= n:
            break
        if j == s:
            # chunk OPENS with an oversize doc: it stays (the spec only
            # overflows when acc > 0), and every later doc overflows
            s = s + 1
        elif prefix[j - 1] == base:
            # zero-weight run then an oversize doc: acc is still 0 at
            # j, so doc j joins this chunk; the next doc starts fresh
            s = j + 1
        else:
            s = j
    return np.searchsorted(np.asarray(starts), np.arange(n), side="right") - 1


def pack_greedy(
    df: DataFrame,
    group_col: str,
    order_col: str,
    weight_col: str,
    budget: int,
    barrier_tokens: int | None = None,
) -> DataFrame:
    """Distributed greedy packing: ``applyInPandas`` per packing unit.

    Default (``barrier_tokens=None``): one unit per group — exact
    :func:`pack_greedy_py` semantics; the per-unit state scan is the
    vectorized chunk-chase (:func:`pack_greedy_np`), so even a hot
    group costs one loop step per CHUNK, not per document. Correct,
    but one giant group still lands on one task.

    Skew-safe mode (``barrier_tokens=k``, k >> budget): each group's
    ordered token stream is pre-split at deterministic cumulative-token
    barriers (a fresh chunk is forced at every k-token boundary), so
    units are (group, barrier window) — a group holding 90% of the
    corpus fans out over total_tokens/k independent tasks. Chunk ids
    stitch back exactly: window-cumsum the per-unit chunk counts and
    offset. Semantics are documented-and-tested: identical to
    pack_greedy_py applied per barrier window; vs the global pack the
    only divergence is at barrier crossings (a doc that would have
    joined the last partial chunk starts a new one — the training-side
    cost is one underfull context window per k tokens, the price of
    unbounded parallelism).
    """
    out_schema = T.StructType(
        df.schema.fields + [T.StructField("chunk_id", T.LongType())]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        pdf["chunk_id"] = pd.array(
            pack_greedy_np(pdf[weight_col].to_numpy(), budget), dtype="int64"
        )
        return pdf

    if barrier_tokens is None:
        return df.groupBy(group_col).applyInPandas(pack, out_schema)

    if barrier_tokens < budget:
        raise ValueError("barrier_tokens must be >= budget")
    w_order = Window.partitionBy(group_col).orderBy(F.col(order_col).asc())
    cum_before = F.sum(weight_col).over(
        w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ) - F.col(weight_col)
    with_bar = df.withColumn("_bar", F.floor(cum_before / barrier_tokens))
    bar_schema = T.StructType(
        with_bar.schema.fields + [T.StructField("chunk_id", T.LongType())]
    )
    packed = with_bar.groupBy(group_col, "_bar").applyInPandas(pack, bar_schema)
    # Exact stitch: chunk_id += chunks emitted by earlier barriers of
    # the same group. The counts table is ~(groups × windows) rows —
    # tiny next to the data — and the offset join is keyed on the same
    # (group, _bar) the units were computed on.
    counts = packed.groupBy(group_col, "_bar").agg(
        (F.max("chunk_id") + 1).alias("_n_chunks")
    )
    w_bar = (
        Window.partitionBy(group_col)
        .orderBy(F.col("_bar").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = counts.withColumn(
        "_offset", F.sum("_n_chunks").over(w_bar) - F.col("_n_chunks")
    ).select(group_col, "_bar", "_offset")
    return (
        packed.join(offsets, [group_col, "_bar"])
        .withColumn("chunk_id", F.col("chunk_id") + F.col("_offset"))
        .drop("_bar", "_offset")
    )
