"""EP2/EP3 legacy-chain composition tests (upsert semantics, cleaning,
threshold + deterministic limit)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anime_data_pipeline_spark.plans.legacy import run_ep2, run_ep3, upsert_sidecars


@pytest.fixture(scope="module")
def pieces(spark):
    existing = spark.createDataFrame(
        [
            ("img0", "general", ["old_tag"], "old caption 0"),
            ("img1", "sensitive", ["keep_me"], None),
        ],
        "image_stem string, rating string, tags array<string>, caption string",
    )
    tags = spark.createDataFrame(
        [
            ("img0", "explicit", ["long_hair", "2girls", "short_hair"]),
            ("img2", "general", ["smile"]),
        ],
        "image_stem string, rating string, tags array<string>",
    )
    captions = spark.createDataFrame(
        [("img0", "young woman holding a cartoon drawing"), ("img2", "a girl")],
        "image_stem string, caption string",
    )
    images = spark.createDataFrame(
        [("img0", 900, 1300), ("img1", 640, 480), ("img2", 2400, 1800)],
        "image_stem string, width int, height int",
    )
    return existing, tags, captions, images


def test_upsert_semantics(spark, pieces):
    existing, tags, captions, _ = pieces
    out = {r["image_stem"]: r for r in upsert_sidecars(existing, tags, captions).collect()}
    assert set(out) == {"img0", "img1", "img2"}          # union of keys
    assert out["img0"]["rating"] == "explicit"            # new overwrites
    assert out["img0"]["tags"] == ["long_hair", "2girls", "short_hair"]
    assert out["img1"]["tags"] == ["keep_me"]             # old survives
    assert out["img2"]["caption"] == "a girl"             # pure insert


def test_ep2_clean_and_bucket(spark, pieces):
    existing, tags, captions, images = pieces
    out = {r["image_stem"]: r for r in run_ep2(existing, tags, captions, images).collect()}
    # cleaning: underscores normalized; 2girls triggers multi-person
    # family pruning of the two hair-length tags
    assert out["img0"]["tags_clean"] == ["2girls"]
    # fixpoint-ish caption replace: young woman → girl, cartoon drawing → drawing
    assert out["img0"]["caption_clean"] == "girl holding a drawing"
    # bucketing ran on joined dims
    assert out["img2"]["bucket_w"] % 64 == 0
    assert set(out) == {"img0", "img1", "img2"}


def test_ep3_threshold_and_limit(spark):
    scores = spark.createDataFrame(
        [(f"img{i}", 0.5 + 0.05 * i) for i in range(10)], "image_id string, score double"
    )
    tags = spark.createDataFrame(
        [(f"img{i}_p0", "general", ["smile", "1girl"]) for i in range(10)],
        "image_stem string, rating string, tags array<string>",
    )
    vocab = F.array(F.lit("smile"))
    out = run_ep3(scores, tags, vocab, threshold=0.8, limit_n=3).collect()
    # scores >= 0.8 → img6..img9 (4 rows), limit 3 keeps the 3 smallest stems
    assert [r["image_stem"] for r in out] == ["img6_p0", "img7_p0", "img8_p0"]
    # reference semantics keep the interior ',,' when the character
    # group is empty (novelai_order.py:37-39 strips ends only)
    assert all(r["ordered_tags"] == "1girl,,smile" for r in out)
