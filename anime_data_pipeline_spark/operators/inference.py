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


def _preprocess_batch(batch: list[bytes | None]) -> np.ndarray:
    """Pixel preprocessing contract for the REAL tagger (the reference's
    dbimutils.py:29-43 + tagger.py:57):

    1. decode to RGB uint8 (codec layer — see
       multimodal.pil_decoder_loader);
    2. pad to a centered square on a WHITE background
       (make_square, dbimutils.py:29-37);
    3. resize to the model's input size, cv2.INTER_AREA when shrinking
       (smart_resize, dbimutils.py:39-43);
    4. RGB → BGR channel swap, float32, NHWC batch (tagger.py:57).

    Pixel codecs are absent in this container, so this raises; inject a
    ``preprocess`` into :func:`session_predict` (or a whole loader into
    :func:`predict_tag_probs`) to supply a real implementation."""
    raise NotImplementedError("image codecs not available in this environment")


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
