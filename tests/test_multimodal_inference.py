"""Multimodal binary-column plumbing + M1 inference contract tests
(SURVEY §5 item 4: stub model, never real weights; the Spark-side
schemas/batching/thresholds/ordering are the product under test)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anime_data_pipeline_spark.operators.inference import (
    collate_by_bucket,
    escape_prompt,
    predict_tag_probs,
    sort_by_confidence,
    tag_inference_stage,
    threshold_tags,
)
from anime_data_pipeline_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_image_meta,
    encode_fimg,
    extract_features,
    frame_sample_plan,
    resize_plan,
)

LABELS = ["long hair", "blue eyes", "smile", "hatsune miku", "holo (spice and wolf)"]
GENERAL = LABELS[:3]
CHARACTER = LABELS[3:]


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        ("img0", encode_fimg(640, 480, "RGB", b"payload-0")),
        ("img1", encode_fimg(1024, 1024, "RGBA", b"payload-1")),
        ("img2", encode_fimg(300, 900, "L", b"")),
        ("bad0", b"JPEG-not-fimg"),
        ("bad1", None),
    ]
    return spark.createDataFrame(rows, "image_key string, content binary")


def test_decode_meta_and_corrupt_nulls(media_df):
    out = {r["image_key"]: r["image_meta"] for r in decode_image_meta(media_df).collect()}
    assert out["img0"]["width"] == 640 and out["img0"]["height"] == 480
    assert out["img1"]["mode"] == "RGBA"
    assert out["img2"]["n_bytes"] == 13
    assert out["bad0"] is None and out["bad1"] is None
    # P6: corrupt filter drops exactly the undecodable rows
    ok = decode_image_meta(media_df).filter(F.col("image_meta").isNotNull())
    assert ok.count() == 3


def test_features_deterministic_shape(media_df):
    f1 = {r["image_key"]: r["features"] for r in extract_features(media_df).collect()}
    f2 = {r["image_key"]: r["features"] for r in extract_features(media_df).collect()}
    assert f1 == f2  # deterministic across runs
    assert len(f1["img0"]) == FEATURE_DIM
    assert f1["bad1"] is None
    assert f1["img0"] != f1["img1"]
    assert all(-1.0 <= x < 1.0 for x in f1["img0"])


def test_resize_plan_math(spark, media_df):
    decoded = decode_image_meta(media_df).filter(F.col("image_meta").isNotNull())
    out = {
        r["image_key"]: r
        for r in resize_plan(decoded, F.lit(512), F.lit(512)).collect()
    }
    # 640x480 → fit width: scale 0.8 → 512x384
    assert (out["img0"]["resized_w"], out["img0"]["resized_h"]) == (512, 384)
    # square stays square
    assert (out["img1"]["resized_w"], out["img1"]["resized_h"]) == (512, 512)
    # tall image fits height: scale 512/900
    r2 = out["img2"]
    assert r2["resized_h"] == 512 and r2["resized_w"] == int(300 * 512 / 900 + 0.5)


def test_frame_sample_plan(spark):
    vids = spark.createDataFrame(
        [("v0", 100), ("v1", 1000), ("v2", 5)], "video_key string, n_frames int"
    )
    out = frame_sample_plan(vids, "n_frames", every_n=30, max_frames=8)
    by_key = {}
    for r in out.collect():
        by_key.setdefault(r["video_key"], []).append((r["sample_pos"], r["frame_no"]))
    assert [f for _, f in sorted(by_key["v0"])] == [0, 30, 60, 90]
    assert [f for _, f in sorted(by_key["v1"])] == [0, 30, 60, 90, 120, 150, 180, 210]
    assert [f for _, f in sorted(by_key["v2"])] == [0]


def test_predict_probs_batched_and_null_safe(media_df):
    out = {r["image_key"]: r["tag_probs"] for r in predict_tag_probs(media_df, LABELS).collect()}
    assert set(out["img0"].keys()) == set(LABELS)
    assert all(0.0 <= p < 1.0 for p in out["img0"].values())
    assert out["bad1"] is None
    # determinism: same content → same probs
    again = {r["image_key"]: r["tag_probs"] for r in predict_tag_probs(media_df, LABELS).collect()}
    assert out == again


def test_threshold_and_sort_semantics(spark):
    rows = [
        (
            "k",
            {
                "long hair": 0.5,     # general, > 0.35 → keep
                "blue eyes": 0.2,     # general, below → drop
                "smile": 0.9,
                "hatsune miku": 0.85,  # character, > 0.8 → keep
                "holo (spice and wolf)": 0.5,  # character, below → drop
            },
        )
    ]
    df = spark.createDataFrame(rows, "image_key string, tag_probs map<string,double>")
    gen = F.array(*[F.lit(x) for x in GENERAL])
    char = F.array(*[F.lit(x) for x in CHARACTER])
    kept = sort_by_confidence(threshold_tags(F.col("tag_probs"), gen, char))
    out = df.select(F.transform(kept, lambda e: e["key"]).alias("tags")).collect()[0]
    assert out["tags"] == ["smile", "hatsune miku", "long hair"]  # prob desc


def test_escape_prompt(spark):
    df = spark.createDataFrame([("holo (spice and wolf)",)], "t string")
    got = df.select(escape_prompt(F.col("t")).alias("e")).collect()[0]["e"]
    assert got == "holo \\(spice and wolf\\)"


def test_full_inference_stage(media_df):
    staged = tag_inference_stage(
        media_df, LABELS, GENERAL, CHARACTER,
        general_threshold=0.0, character_threshold=0.0,
    )
    out = {r["image_key"]: r["synth_tags"] for r in staged.collect()}
    # zero thresholds → all 5 labels, ordered by stub confidence
    assert len(out["img0"].split(", ")) == len(LABELS)
    assert "\\(spice and wolf\\)" in out["img0"]
    assert out["bad1"] is None  # null probs stay null (undecodable row)


def test_decoder_loader_injection(media_df):
    """A 'real codec' stand-in with a DIFFERENT container format (magic
    'JPEG') drops into the decode seam without touching
    decode_image_meta. (Defined inline so cloudpickle ships it by value
    to the Python workers.)"""
    from anime_data_pipeline_spark.operators.multimodal import decode_image_meta

    def fake_codec_loader():
        def decode(content: bytes):
            if content[:4] == b"JPEG":
                return (111, 222, "RGB")
            return None

        return decode

    out = {
        r["image_key"]: r["image_meta"]
        for r in decode_image_meta(media_df, decoder_loader=fake_codec_loader).collect()
    }
    # the injected codec decodes what the stub calls corrupt, and vice versa
    assert out["bad0"]["width"] == 111 and out["bad0"]["height"] == 222
    assert out["img0"] is None and out["bad1"] is None


def test_real_session_seam_contract(media_df):
    """session_predict adapts an InferenceSession-shaped object into the
    loader contract and predict_tag_probs runs it unmodified — a real
    onnxruntime session (onnx_loader) drops in the same way. Fakes are
    defined inline so cloudpickle ships them by value to workers."""
    from anime_data_pipeline_spark.operators.inference import session_predict

    def loader():
        import numpy as np

        class FakeOrtInput:
            name = "input_1:0"

        class FakeSession:
            """InferenceSession-shaped: .get_inputs / .run only."""

            def get_inputs(self):
                return [FakeOrtInput()]

            def run(self, _out, feeds):
                arr = feeds["input_1:0"]
                # fake logits: a function of the preprocessed tensor
                return [
                    np.stack(
                        [
                            (arr[i].sum() % 97) / 97.0 * np.ones(5)
                            for i in range(len(arr))
                        ]
                    )
                ]

        def fake_preprocess(batch):
            """Stands in for the pad-square/BGR/resize pixel contract
            (absent codecs): bytes → deterministic fixed-shape tensor."""
            out = np.zeros((len(batch), 4), dtype=np.float32)
            for i, b in enumerate(batch):
                if b is not None:
                    out[i] = [len(b) % 7, len(b) % 5, len(b) % 3, 1.0]
            return out

        return session_predict(FakeSession(), preprocess=fake_preprocess)

    out = {
        r["image_key"]: r["tag_probs"]
        for r in predict_tag_probs(media_df, LABELS, loader=loader).collect()
    }
    assert set(out["img0"].keys()) == set(LABELS)
    assert all(0.0 <= p <= 1.0 for p in out["img0"].values())
    # determinism through the executor cache
    again = {
        r["image_key"]: r["tag_probs"]
        for r in predict_tag_probs(media_df, LABELS, loader=loader).collect()
    }
    assert out == again


def test_collate_by_bucket_partitioning(spark):
    df = spark.createDataFrame(
        [(i, (512 + 64 * (i % 3), 768)) for i in range(60)],
        "id int, bucket_reso struct<w:int,h:int>",
    )
    parted = collate_by_bucket(df, ["bucket_reso"])
    # every partition holds at most ... every bucket maps to exactly one
    # partition: count distinct (partition, bucket) pairs == n buckets
    pairs = (
        parted.withColumn("pid", F.spark_partition_id())
        .select("pid", "bucket_reso")
        .distinct()
    )
    assert pairs.count() == 3


# ---------------------------------------------------------------------------
# Codec-free tagger preprocessing math (dbimutils.py:29-43 + tagger.py
# :49-62 semantics on synthetic arrays — no image codec involved)
# ---------------------------------------------------------------------------
def test_make_square_white_centered_padding():
    import numpy as np

    from anime_data_pipeline_spark.operators.inference import make_square_white

    img = np.zeros((2, 4, 3), dtype=np.uint8)  # landscape 2×4
    sq = make_square_white(img, 4)
    assert sq.shape == (4, 4, 3)
    # delta_h=2 → top 1, bottom 1 of white; payload rows in the middle
    assert (sq[0] == 255).all() and (sq[3] == 255).all()
    assert (sq[1:3] == 0).all()


def test_make_square_white_odd_delta_goes_bottom_right():
    import numpy as np

    from anime_data_pipeline_spark.operators.inference import make_square_white

    img = np.zeros((3, 4, 3), dtype=np.uint8)  # delta_h = 1
    sq = make_square_white(img, 4)
    # reference split: top = 1//2 = 0, bottom = 1 — odd pixel at bottom
    assert (sq[3] == 255).all() and (sq[0] == 0).all()


def test_make_square_grows_to_target_when_image_smaller():
    import numpy as np

    from anime_data_pipeline_spark.operators.inference import make_square_white

    sq = make_square_white(np.zeros((2, 2, 3), dtype=np.uint8), 6)
    assert sq.shape == (6, 6, 3)  # desired = max(h, w, target)


def test_area_resize_integer_ratio_is_block_mean():
    import numpy as np

    from anime_data_pipeline_spark.operators.inference import area_resize

    img = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    out = area_resize(img, 2)
    # 2×2 block means of [[0..3],[4..7],[8..11],[12..15]]
    assert np.allclose(out[:, :, 0], [[2.5, 4.5], [10.5, 12.5]])


def test_area_resize_fractional_ratio_box_overlap():
    import numpy as np

    from anime_data_pipeline_spark.operators.inference import area_resize

    img = np.array([[10.0], [20.0], [40.0]]).reshape(3, 1, 1)
    img = np.repeat(img, 3, axis=1)  # 3×3
    out = area_resize(img, 2)
    # scale 1.5: out row 0 = (10 + 0.5·20)/1.5, row 1 = (0.5·20 + 40)/1.5
    assert np.allclose(out[0, 0, 0], (10 + 0.5 * 20) / 1.5)
    assert np.allclose(out[1, 0, 0], (0.5 * 20 + 40) / 1.5)


def test_normalize_pixels_variants():
    import numpy as np

    from anime_data_pipeline_spark.operators.inference import normalize_pixels

    # uint16 → /257
    u16 = np.full((2, 2, 3), 65535, dtype=np.uint16)
    assert (normalize_pixels(u16) == 255).all()
    # grayscale → 3 channels
    assert normalize_pixels(np.zeros((2, 2), dtype=np.uint8)).shape == (2, 2, 3)
    # RGBA: transparent pixel → white, alpha dropped
    rgba = np.zeros((1, 2, 4), dtype=np.uint8)
    rgba[0, 0] = [9, 9, 9, 255]   # opaque dark
    rgba[0, 1] = [9, 9, 9, 0]     # fully transparent
    out = normalize_pixels(rgba)
    assert out.shape == (1, 2, 3)
    assert (out[0, 0] == 9).all() and (out[0, 1] == 255).all()


def test_preprocess_rgb_batch_shape_bgr_and_none_handling():
    import numpy as np

    from anime_data_pipeline_spark.operators.inference import preprocess_rgb_batch

    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[:, :, 0] = 200  # strong R channel
    batch = preprocess_rgb_batch([img, None], size=4)
    assert batch.shape == (2, 4, 4, 3) and batch.dtype == np.float32
    # BGR swap: input R (200) must land in channel 2
    assert np.allclose(batch[0, :, :, 2], 200.0)
    assert np.allclose(batch[0, :, :, 0], 0.0)
    # None row → stable all-white geometry
    assert np.allclose(batch[1], 255.0)


def test_make_preprocess_composes_decoder():
    import numpy as np

    from anime_data_pipeline_spark.operators.inference import make_preprocess

    def fake_decode(b: bytes) -> np.ndarray:
        v = b[0] if b else 0
        return np.full((2, 2, 3), v, dtype=np.uint8)

    prep = make_preprocess(fake_decode, size=2)
    out = prep([bytes([7]), None])
    assert out.shape == (2, 2, 2, 3)
    assert np.allclose(out[0], 7.0) and np.allclose(out[1], 255.0)


def test_stub_features_are_well_mixed():
    """Distinct payloads must NOT produce near-parallel feature vectors.
    Pins the affine-hash bug class: any polyhash(payload+j) /
    polyhash(j+payload) spelling makes every vector an arithmetic
    progression mod P, and unrelated payloads reach cosine >= 0.99
    (which collapsed embedding dedup in q106 v1)."""
    import numpy as np

    from anime_data_pipeline_spark.functions.hashing import P, hash_chain, polyhash_py

    rs, ss = hash_chain(1, 16), hash_chain(2, 16)
    vecs = []
    for i in range(200):
        h = polyhash_py(f"synthetic payload number {i} with words")
        v = np.array([((r * h + s) % P) / P * 2 - 1 for r, s in zip(rs, ss)])
        vecs.append(v / np.linalg.norm(v))
    V = np.array(vecs)
    cos = np.abs(V @ V.T)
    np.fill_diagonal(cos, 0.0)
    assert float(cos.max()) < 0.99, float(cos.max())


def test_hash_chain_constants_not_affine():
    from anime_data_pipeline_spark.functions.hashing import hash_chain

    r = hash_chain(1, 16)
    assert len(set(r)) == 16
    diffs = {r[i + 1] - r[i] for i in range(15)}
    assert len(diffs) > 1, "chained constants must not form an arithmetic progression"
