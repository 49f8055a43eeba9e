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


def pack_greedy(
    df: DataFrame,
    group_col: str,
    order_col: str,
    weight_col: str,
    budget: int,
) -> DataFrame:
    """Distributed greedy packing: one ``applyInPandas`` per group.

    The state (current chunk's remaining budget) is a single scalar
    carried through a python loop over the group's weight array — the
    loop is per GROUP, executors run groups in parallel, and the
    sort feeding it is Spark's (spill-safe). Output schema = input +
    ``chunk_id``."""
    out_schema = T.StructType(
        df.schema.fields + [T.StructField("chunk_id", T.LongType())]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        pdf["chunk_id"] = pd.array(
            pack_greedy_py(pdf[weight_col].tolist(), budget), dtype="int64"
        )
        return pdf

    return df.groupBy(group_col).applyInPandas(pack, out_schema)
