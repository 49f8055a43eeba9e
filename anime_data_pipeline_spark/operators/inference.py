"""M1 — batched ML tagger inference (SURVEY §2.9; behavior studied
from /root/reference/dataruu/tagger/tagger.py).

The reference runs ONNX WD-1.4 per-row, batch size 1, in the driver
process (tagger.py:62, run.py:95-108). Spark-first redesign:

- inference lives in an Arrow-batched ``mapInPandas`` stage: one model
  session per EXECUTOR (lazy module-level cache — the cold start is
  amortized over every batch that worker processes, vs per-row in the
  reference), batched forward passes;
- the model is pluggable: ``set_model_loader`` injects any callable
  ``batch(np.ndarray | list[bytes]) -> np.ndarray[probs]``; the default
  is a deterministic stub (no ONNX runtime in this container), so the
  pipeline contract — shapes, thresholds, ordering — is fully testable
  without the real weights (SURVEY §5 item 4);
- ALL postprocessing is native expressions: per-category thresholds
  (P7, tagger.py:43-44/run.py:100-101) via map_filter-style array ops,
  confidence sort (O4, run.py:102-104) via array_sort, prompt escaping
  (F7, tagger.py:85-90) via regexp_replace.

GPU notes for the real model: set spark.task.resource.gpu.amount so
one task owns the device, keep the session cache per-executor, and
repartition('bucket_reso') first so batches share tensor shape (M5).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from anime_data_pipeline_spark.functions.hashing import P, polyhash_py
from anime_data_pipeline_spark.operators.multimodal import payload_text

# ---------------------------------------------------------------------------
# Pluggable executor-cached model. The loader callable travels INSIDE
# the mapInPandas closure (driver-set module globals do not exist in
# the Python worker processes); the constructed model is memoized in
# this per-worker cache so it is built once per worker, not per task —
# Python workers are reused across tasks by default.
# ---------------------------------------------------------------------------
_MODEL_CACHE: dict[str, Callable[[list[bytes | None]], np.ndarray]] = {}


def _load_cached(key: str, loader: Callable[[], Callable]) -> Callable:
    model = _MODEL_CACHE.get(key)
    if model is None:
        model = loader()
        _MODEL_CACHE[key] = model
    return model


def _stub_loader(n_labels: int) -> Callable[[], Callable]:
    """Deterministic fake logits: prob of label i = polyhash(payload
    '#' i) / P in [0, 1) over the FIMG payload text — recomputable by
    the DuckDB oracle from the source documents (see q73). Stands in
    for the ONNX session; the real loader would build
    onnxruntime.InferenceSession once per executor."""

    def load() -> Callable[[list[bytes | None]], np.ndarray]:
        def predict(batch: list[bytes | None]) -> np.ndarray:
            out = np.zeros((len(batch), n_labels), dtype=np.float64)
            for r, content in enumerate(batch):
                if content is None:
                    continue
                pay = payload_text(bytes(content))
                for i in range(n_labels):
                    out[r, i] = float(polyhash_py(f"{pay}#{i}")) / float(P)
            return out

        return predict

    return load


# ---------------------------------------------------------------------------
# Pixel preprocessing — the tagger's tensor-prep contract implemented
# CODEC-FREE in pure numpy (the reference composes it from PIL/cv2:
# tagger.py:49-62 + dbimutils.py:29-43). Everything below operates on
# already-decoded uint8 arrays; the ONLY environment-bound gap left is
# the literal byte→pixel decode (see _preprocess_batch).
# ---------------------------------------------------------------------------
def normalize_pixels(img: np.ndarray) -> np.ndarray:
    """uint8 RGB H×W×3 from the decode layer's variants (the
    smart_24bit + alpha-compositing contract, dbimutils.py:16-26 and
    tagger.py:49-54, in RGB order):

    - uint16 → uint8 via integer /257 (65535 → 255);
    - 2-D grayscale → replicated 3-channel;
    - H×W×4 RGBA → composite onto WHITE where alpha == 0 (the
      reference pastes onto a white canvas), drop alpha.
    """
    img = np.asarray(img)
    if img.dtype == np.uint16:
        img = (img / 257).astype(np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    elif img.shape[2] == 4:
        img = img.copy()
        img[img[:, :, 3] == 0] = [255, 255, 255, 255]
        img = img[:, :, :3]
    return np.ascontiguousarray(img.astype(np.uint8))


def make_square_white(img: np.ndarray, target_size: int) -> np.ndarray:
    """Centered pad to a square WHITE canvas (make_square,
    dbimutils.py:29-37): side = max(h, w, target_size); the odd pixel
    of an odd delta goes to the bottom/right, matching the reference's
    ``delta // 2`` / ``delta - delta // 2`` split."""
    h, w = img.shape[:2]
    side = max(h, w, target_size)
    dh, dw = side - h, side - w
    top, left = dh // 2, dw // 2
    return np.pad(
        img,
        ((top, dh - top), (left, dw - left), (0, 0)),
        mode="constant",
        constant_values=255,
    )


def _area_weights(n_in: int, n_out: int) -> np.ndarray:
    """(n_out × n_in) row-stochastic box-overlap weights: output cell i
    averages input cells over the span [i·s, (i+1)·s), s = n_in/n_out —
    the box filter cv2.INTER_AREA computes (in float, not cv2's
    fixed-point approximation)."""
    s = n_in / n_out
    w = np.zeros((n_out, n_in), dtype=np.float64)
    for i in range(n_out):
        lo, hi = i * s, (i + 1) * s
        j0, j1 = int(np.floor(lo)), int(np.ceil(hi))
        for j in range(j0, min(j1, n_in)):
            w[i, j] = min(hi, j + 1) - max(lo, j)
    return w / s


def area_resize(img: np.ndarray, size: int) -> np.ndarray:
    """Area-average downscale of a square H×H×C image to size×size×C
    (smart_resize's INTER_AREA branch, dbimutils.py:39-43 — after
    make_square the image is never SMALLER than the target, so the
    INTER_CUBIC upscale branch is unreachable in the tagger path).
    Separable: out = W_r · img · W_cᵀ per channel, two matmuls."""
    h, w = img.shape[:2]
    if h == size and w == size:
        return img.astype(np.float64)
    wr = _area_weights(h, size)
    wc = _area_weights(w, size)
    # (size, h) @ (h, w, c) along axis 0, then columns
    out = np.tensordot(wr, img.astype(np.float64), axes=(1, 0))
    out = np.tensordot(out, wc, axes=(1, 1))  # (size, c, size)
    return np.moveaxis(out, 1, 2)  # (size, size, c)


def preprocess_rgb_batch(
    images: list[np.ndarray | None], size: int
) -> np.ndarray:
    """Decoded RGB arrays → the tagger's NHWC float32 input tensor
    (tagger.py:55-62): normalize variants, RGB→BGR channel swap, white
    square pad, area resize to (size, size), float32 stack. ``None``
    entries (corrupt/absent images) become all-white tensors so batch
    geometry is stable; callers null out their outputs downstream."""
    out = np.full((len(images), size, size, 3), 255.0, dtype=np.float32)
    for r, img in enumerate(images):
        if img is None:
            continue
        px = normalize_pixels(img)[:, :, ::-1]  # RGB → BGR (tagger.py:57)
        px = make_square_white(px, size)
        out[r] = area_resize(px, size).astype(np.float32)
    return out


def make_preprocess(
    decode: Callable[[bytes], np.ndarray | None], size: int
) -> Callable[[list[bytes | None]], np.ndarray]:
    """Compose a byte decoder with :func:`preprocess_rgb_batch` into
    the ``session_predict`` preprocess contract. The decoder is the
    only codec-bound piece (e.g. multimodal.pil_decoder_loader's PIL
    seam); everything after it is the pure-numpy math above."""

    def prep(batch: list[bytes | None]) -> np.ndarray:
        return preprocess_rgb_batch(
            [None if b is None else decode(bytes(b)) for b in batch], size
        )

    return prep


def _preprocess_batch(batch: list[bytes | None]) -> np.ndarray:
    """Default preprocess: the full numpy pipeline above behind the one
    remaining environment gap — byte→pixel DECODE (no PIL/cv2 in this
    container). Inject a decoder via :func:`make_preprocess` (or a
    whole ``preprocess`` into :func:`session_predict`) to go live."""

    def _no_codec(_: bytes) -> np.ndarray:
        raise NotImplementedError(
            "image byte decoding needs a codec (PIL/cv2) not present in "
            "this environment; see make_preprocess"
        )

    return make_preprocess(_no_codec, 448)(batch)


def session_predict(
    session, preprocess: Callable[[list[bytes | None]], np.ndarray] | None = None
) -> Callable[[list[bytes | None]], np.ndarray]:
    """Adapt an ``onnxruntime.InferenceSession``-SHAPED object
    (``.get_inputs()[0].name`` + ``.run(None, {name: batch})`` —
    tagger.py:21-32's usage) to the batch-predict callable contract.
    The adapter is model-agnostic; the contract test drives it with a
    fake session, and a real session drops in without touching operator
    code."""
    input_name = session.get_inputs()[0].name
    prep = preprocess or _preprocess_batch

    def predict(batch: list[bytes | None]) -> np.ndarray:
        return np.asarray(session.run(None, {input_name: prep(batch)})[0])

    return predict


def onnx_loader(
    model_path: str,
    providers: list[str] | None = None,
    preprocess: Callable[[list[bytes | None]], np.ndarray] | None = None,
) -> Callable[[], Callable]:
    """Loader for the REAL ONNX path: builds one InferenceSession per
    Python worker (memoized by predict_tag_probs' executor cache — the
    cold start amortizes over every batch that worker processes, vs
    per-row in the reference's driver-side loop, tagger.py:62).
    onnxruntime is absent in this container; the loader imports lazily
    so the seam ships as working code."""

    def load() -> Callable[[list[bytes | None]], np.ndarray]:
        import onnxruntime as ort  # absent here; executor-side import

        session = ort.InferenceSession(
            model_path, providers=providers or ["CPUExecutionProvider"]
        )
        return session_predict(session, preprocess)

    return load


# ---------------------------------------------------------------------------
# Inference stage
# ---------------------------------------------------------------------------
def predict_tag_probs(
    df: DataFrame,
    labels: list[str],
    content_col: str = "content",
    loader: Callable[[], Callable] | None = None,
) -> DataFrame:
    """Append ``tag_probs: map<string, double>`` from batched inference.

    ``labels`` is the vocab name list in model output order
    (tagger.py:32-38). The map form keeps per-tag confidences typed for
    the native threshold/sort postprocessing.
    """
    loader = loader or _stub_loader(len(labels))
    cache_key = (
        f"{getattr(loader, '__module__', '?')}."
        f"{getattr(loader, '__qualname__', repr(type(loader)))}:{len(labels)}"
    )
    out_schema = T.StructType(
        df.schema.fields
        + [T.StructField("tag_probs", T.MapType(T.StringType(), T.DoubleType()))]
    )
    labels_tuple = tuple(labels)

    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = _load_cached(cache_key, loader)
        for pdf in batches:
            contents = [
                bytes(c) if c is not None else None for c in pdf[content_col]
            ]
            probs = model(contents)
            pdf = pdf.copy()
            pdf["tag_probs"] = [
                None if c is None else dict(zip(labels_tuple, row))
                for c, row in zip(contents, probs)
            ]
            yield pdf

    return df.mapInPandas(infer, schema=out_schema)


# ---------------------------------------------------------------------------
# Native postprocessing (P7 thresholds, O4 confidence sort, F7 escaping)
# ---------------------------------------------------------------------------
def collate_by_bucket(df: DataFrame, bucket_cols: list[str]) -> DataFrame:
    """M5 (legacy/bucketing_to_metadata.py:64-68,111-123): co-locate
    rows sharing a bucket resolution so every inference batch holds
    same-shape tensors — one hash repartition on the bucket key; the
    per-batch accumulate/flush the reference hand-rolls is what
    mapInPandas batches already are."""
    return df.repartition(*[F.col(c) for c in bucket_cols])


def threshold_tags(
    probs: Column,
    general_names: Column,
    character_names: Column,
    general_threshold: float = 0.35,
    character_threshold: float = 0.8,
) -> Column:
    """Per-category confidence thresholds (tagger.py:43-44,76,81):
    keep general tags with p > g_t and character tags with p > c_t.
    Returns the surviving entries as (tag, prob) structs."""
    entries = F.map_entries(probs)

    def keep(e: Column) -> Column:
        return (
            F.array_contains(general_names, e["key"]) & (e["value"] > general_threshold)
        ) | (
            F.array_contains(character_names, e["key"])
            & (e["value"] > character_threshold)
        )

    return F.filter(entries, keep)


def sort_by_confidence(entries: Column) -> Column:
    """O4: sort (tag, prob) structs by prob desc, tag asc tiebreak
    (run.py:102-104 sorts by confidence; the tiebreak pins distributed
    determinism)."""
    return F.array_sort(
        entries,
        lambda l, r: F.when(l["value"] > r["value"], -1)
        .when(l["value"] < r["value"], 1)
        .when(l["key"] < r["key"], -1)
        .when(l["key"] > r["key"], 1)
        .otherwise(0),
    )


def escape_prompt(tag: Column) -> Column:
    """F7 (tagger.py:85-90): '(' → '\\(' , ')' → '\\)' for prompt syntax."""
    return F.regexp_replace(F.regexp_replace(tag, r"\(", r"\\("), r"\)", r"\\)")


def tag_inference_stage(
    df: DataFrame,
    labels: list[str],
    general_names: list[str],
    character_names: list[str],
    content_col: str = "content",
    general_threshold: float = 0.35,
    character_threshold: float = 0.8,
    loader: Callable[[], Callable] | None = None,
) -> DataFrame:
    """Full M1 stage: batched inference + native postprocessing →
    ``synth_tags`` (escaped, comma-joined — tagger.py:84-93's output
    contract).

    Ordering matches the reference synthesize path (run.py:100-106):
    CHARACTER tags first, then general tags, each category independently
    sorted by confidence desc. Threshold defaults are tagger.predict's
    (tagger.py:43-44: 0.35 general / 0.8 character); NOTE run.py's
    synthesize path overrides both to 0.4/0.4 — pass those explicitly to
    reproduce the EP1 CLI end-to-end."""
    scored = predict_tag_probs(df, labels, content_col, loader)
    gen = F.array(*[F.lit(x) for x in general_names])
    char = F.array(*[F.lit(x) for x in character_names])
    entries = threshold_tags(
        F.col("tag_probs"), gen, char, general_threshold, character_threshold
    )
    is_char = lambda e: F.array_contains(char, e["key"])  # noqa: E731
    kept = F.concat(
        sort_by_confidence(F.filter(entries, is_char)),
        sort_by_confidence(F.filter(entries, lambda e: ~is_char(e))),
    )
    return scored.withColumn(
        "synth_tags",
        F.array_join(
            F.transform(kept, lambda e: escape_prompt(e["key"])), ", "
        ),
    )
