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


# ---------------------------------------------------------------------------
# scd2_merge: every classification branch on a hand-made snapshot pair.
# ---------------------------------------------------------------------------
def test_scd2_merge_all_branches(spark):
    from anime_data_pipeline_spark.operators.diff import scd2_merge

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], "k long, v string"
    )
    rows = {
        (r["k"], r["valid_from"]): (r["v"], r["valid_to"], r["is_current"])
        for r in scd2_merge(old, new, ["k"], ["v"]).collect()
    }
    assert rows[(1, 1)] == ("a", 9999, True)          # unchanged: open v1
    assert rows[(2, 1)] == ("b", 2, False)            # modified: closed v1
    assert rows[(2, 2)] == ("B", 9999, True)          # modified: open v2
    assert rows[(3, 1)] == ("c", 2, False)            # deleted: closed v1
    assert rows[(4, 2)] == ("d", 9999, True)          # added: open v2
    assert len(rows) == 5
