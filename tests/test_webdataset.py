"""WebDataset tar source/sink: byte-level roundtrip including binary
members, missing members → nulls, and shard determinism."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from anime_data_pipeline_spark.sources.webdataset import (
    read_webdataset,
    write_webdataset,
)


def _sample_df(spark):
    rows = [
        (f"k{i:04d}", f"caption {i}", bytes([i % 256, (i * 7) % 256, 0xFF]))
        for i in range(50)
    ]
    # every 5th sample has no binary member
    rows = [(k, t, None if i % 5 == 0 else b) for i, (k, t, b) in enumerate(rows)]
    return spark.createDataFrame(rows, "key string, caption string, payload binary")


def test_roundtrip_with_binary_members(spark, tmp_path):
    df = _sample_df(spark)
    out = str(tmp_path / "wds")
    manifest = write_webdataset(
        df,
        out,
        "key",
        text_members={"txt": "caption"},
        binary_members={"bin": "payload"},
        n_shards=4,
    ).collect()
    assert sum(m["n_samples"] for m in manifest) == 50
    assert {os.path.basename(m["path"]) for m in manifest} <= {
        f"shard-{i:05d}.tar" for i in range(4)
    }

    back = {
        r["key"]: r
        for r in read_webdataset(
            spark, out, text_exts=("txt",), binary_exts=("bin",)
        ).collect()
    }
    src = {r["key"]: r for r in df.collect()}
    assert set(back) == set(src)
    for k, r in src.items():
        assert back[k]["txt"] == r["caption"]
        if r["payload"] is None:
            assert back[k]["bin"] is None
        else:
            assert bytes(back[k]["bin"]) == bytes(r["payload"])


def test_shards_are_byte_deterministic(spark, tmp_path):
    df = _sample_df(spark)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for out in (a, b):
        write_webdataset(
            df, out, "key", text_members={"txt": "caption"}, n_shards=3
        ).collect()
    for name in sorted(os.listdir(a)):
        with open(os.path.join(a, name), "rb") as fa, open(
            os.path.join(b, name), "rb"
        ) as fb:
            assert fa.read() == fb.read(), name
