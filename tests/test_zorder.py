"""Z-order clustering: Morton-key correctness, disjoint per-file
z-ranges after zorder_write, and pruning decisions from the manifest."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from anime_data_pipeline_spark.operators.zorder import (
    bucket_minmax_stats,
    pruned_for_rect,
    zorder_write,
    zvalue,
)


def _morton_py(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_matches_reference_fold(spark):
    cases = [(0, 0), (1, 0), (0, 1), (5, 3), (149, 11535), (65535, 65535)]
    df = spark.createDataFrame(cases, "x long, y long")
    rows = df.select("x", "y", zvalue(F.col("x"), F.col("y")).alias("z")).collect()
    for r in rows:
        assert r["z"] == _morton_py(r["x"], r["y"]), (r["x"], r["y"])


def test_zvalue_locality():
    # neighbors in (x, y) are close in z: the 2x2 cell (0,0)-(1,1) is
    # exactly z 0..3
    assert sorted(_morton_py(x, y) for x in (0, 1) for y in (0, 1)) == [0, 1, 2, 3]


def test_zorder_write_gives_disjoint_file_ranges(spark, sf_dir, tmp_path):
    from anime_data_pipeline_spark.catalog import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("epoch_day"),
    )
    out = str(tmp_path / "zorders")
    zorder_write(orders, out, "o_custkey", "epoch_day", n_files=8)
    back = spark.read.parquet(out)
    assert back.count() == orders.count()
    ranges = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(F.min("zval").alias("lo"), F.max("zval").alias("hi"))
        .collect()
    )
    spans = sorted((r["lo"], r["hi"]) for r in ranges)
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next, f"overlapping file z-ranges: {spans}"
    shutil.rmtree(out, ignore_errors=True)


def test_pruning_skips_nonoverlapping_buckets(spark):
    # two clusters far apart in both dims: probing one must prune the other
    rows = [(i, 5, 100) for i in range(50)] + [(i + 50, 60000, 60000) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    stats = bucket_minmax_stats(df, "x", "y", bucket_shift=20)
    out = pruned_for_rect(stats, 0, 10, 0, 200).collect()
    assert any(r["pruned"] for r in out), "far cluster must be prunable"
    kept = [r for r in out if not r["pruned"]]
    assert sum(r["n_rows"] for r in kept) == 50, "near cluster must survive"
