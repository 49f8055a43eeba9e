"""snapshot_diff semantics: composite keys, null-safe comparison,
include_unchanged."""

from __future__ import annotations

from anime_data_pipeline_spark.operators.diff import snapshot_diff


def test_composite_key_and_null_safety(spark):
    old = spark.createDataFrame(
        [(1, "a", "x", None), (1, "b", "y", "p"), (2, "a", "z", None)],
        "k1 int, k2 string, v string, w string",
    )
    new = spark.createDataFrame(
        [(1, "a", "x", None), (1, "b", "y2", "p"), (3, "a", None, "q")],
        "k1 int, k2 string, v string, w string",
    )
    out = {
        (r["k1"], r["k2"]): r
        for r in snapshot_diff(
            old, new, ["k1", "k2"], ["v", "w"], include_unchanged=True
        ).collect()
    }
    assert out[(1, "a")]["change_type"] == "unchanged"  # null w == null w
    assert out[(1, "b")]["change_type"] == "modified"
    assert out[(1, "b")]["changed_cols"] == ["v"]
    assert out[(2, "a")]["change_type"] == "deleted"
    assert out[(3, "a")]["change_type"] == "added"
    # default drops unchanged
    assert (
        snapshot_diff(old, new, ["k1", "k2"], ["v", "w"]).count() == 3
    )
