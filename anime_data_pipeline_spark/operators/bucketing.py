"""Aspect-ratio bucketing as native Spark column expressions.

Re-expresses the reference's core domain operator family (SURVEY §2.8,
B1-B5; behavior studied from /root/reference/dataruu/bucketing/
bucket_manager.py) Spark-first:

- B1 ``make_bucket_resolutions`` (bucket_manager.py:8-27) runs on the
  driver — it yields ~40 rows, embedded as a literal array of structs.
- B2/B3 ``select_bucket`` (bucket_manager.py:99-159) becomes a pure
  column-expression projection: per-row math with NO join, NO shuffle,
  NO UDF. The 1-NN aspect-ratio search (np.argmin at
  bucket_manager.py:108-109) is an ``F.aggregate`` scan over the
  literal reso array — whole-stage codegen keeps it JVM-side, and at
  100 TB it scales embarrassingly (map-only).
- B4 ``get_crop_ltrb`` (bucket_manager.py:161-179) is likewise a
  projection.
- B5 bucket ids: the reference assigns ids on first sight
  (bucket_manager.py:87-93, order-dependent) — distributed engines
  need a deterministic rule, so ids follow the sorted-reso order the
  reference itself settles on after ``sort()`` (bucket_manager.py:61-75).

Tie-breaking parity notes:
- np.argmin returns the FIRST minimal index; the aggregate scan keeps
  the earlier element on ties (strict ``<``), over the same sorted
  reso order.
- ``int(x + 0.5)`` on positive floats == ``floor(x + 0.5)``.
- All arithmetic is IEEE double / integer ops, bit-identical across
  engines; the DuckDB oracle (``bucket_oracle_sql``) embeds the exact
  same literals.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class BucketConfig:
    """Bucketing geometry (defaults = the reference CLI defaults,
    dataruu/run.py:19-22)."""

    no_upscale: bool = False
    max_width: int = 1024
    max_height: int = 1024
    min_size: int = 256
    max_size: int = 2048
    reso_steps: int = 64

    @property
    def max_area(self) -> int:
        return self.max_width * self.max_height


def make_bucket_resolutions(cfg: BucketConfig) -> list[tuple[int, int]]:
    """Enumerate predefined bucket resolutions (behavior of
    bucket_manager.py:8-27): the max-area square plus every
    (w, h)/(h, w) pair with sides in [min_size, max_size], multiples of
    ``reso_steps``, area ≤ max_area. Driver-side: ≤ ~100 rows."""
    area = cfg.max_area
    div = cfg.reso_steps
    out: set[tuple[int, int]] = set()

    side = int(math.sqrt(area) // div) * div
    out.add((side, side))

    w = cfg.min_size
    while w <= cfg.max_size:
        h = min(cfg.max_size, int((area // w) // div) * div)
        if h >= cfg.min_size:
            out.add((w, h))
            out.add((h, w))
        w += div
    return sorted(out)


# ---------------------------------------------------------------------------
# Pure-Python executable spec — the oracle for golden tests. Same math as
# the column expressions below; kept deliberately simple and readable.
# ---------------------------------------------------------------------------
def select_bucket_py(
    width: int, height: int, cfg: BucketConfig, resos: list[tuple[int, int]] | None = None
) -> dict:
    """Reference-semantics bucket assignment for one (width, height).

    Returns bucket reso, resized size, signed ar_error and the 8-multiple
    train resolution (bucket_manager.py:99-159,196).
    """
    resos = resos if resos is not None else make_bucket_resolutions(cfg)
    ar = width / height

    def round_steps(x: float) -> int:
        # Clamped to one step: inputs smaller than reso_steps would
        # otherwise floor to a 0-sized bucket (division by zero — the
        # reference crashes identically on such degenerate images;
        # documented robustness divergence).
        r = int(x + 0.5)
        return max(cfg.reso_steps, r - r % cfg.reso_steps)

    if not cfg.no_upscale:
        if (width, height) in set(resos):
            reso = (width, height)
        else:
            best_i, best_err = 0, None
            for i, (bw, bh) in enumerate(resos):
                err = abs(bw / bh - ar)
                if best_err is None or err < best_err:
                    best_i, best_err = i, err
            reso = resos[best_i]
        ar_reso = reso[0] / reso[1]
        scale = reso[1] / height if ar > ar_reso else reso[0] / width
        resized = (int(width * scale + 0.5), int(height * scale + 0.5))
    else:
        if width * height > cfg.max_area:
            rw = math.sqrt(cfg.max_area * ar)
            rh = cfg.max_area / rw
            bwr = round_steps(rw)
            bh_in_wr = round_steps(bwr / ar)
            ar_wr = bwr / bh_in_wr
            bhr = round_steps(rh)
            bw_in_hr = round_steps(bhr * ar)
            ar_hr = bw_in_hr / bhr
            if abs(ar_wr - ar) < abs(ar_hr - ar):
                resized = (bwr, int(bwr / ar + 0.5))
            else:
                resized = (int(bhr * ar + 0.5), bhr)
        else:
            resized = (width, height)
        reso = (
            max(cfg.reso_steps, resized[0] - resized[0] % cfg.reso_steps),
            max(cfg.reso_steps, resized[1] - resized[1] % cfg.reso_steps),
        )

    return {
        "bucket_w": reso[0],
        "bucket_h": reso[1],
        "resized_w": resized[0],
        "resized_h": resized[1],
        "ar_error": reso[0] / reso[1] - ar,
        "train_w": reso[0] - reso[0] % 8,
        "train_h": reso[1] - reso[1] % 8,
    }


def crop_ltrb_py(bucket_w: int, bucket_h: int, img_w: int, img_h: int) -> tuple:
    """Center-crop box, Stability-AI-compatible (bucket_manager.py:161-179)."""
    bucket_ar = bucket_w / bucket_h
    image_ar = img_w / img_h
    if bucket_ar > image_ar:
        rw, rh = bucket_h * image_ar, float(bucket_h)
    else:
        rw, rh = float(bucket_w), bucket_w / image_ar
    left = (bucket_w - rw) // 2
    top = (bucket_h - rh) // 2
    return left, top, left + rw, top + rh


# ---------------------------------------------------------------------------
# Spark column expressions
# ---------------------------------------------------------------------------
def _round_steps(x: Column, steps: int) -> Column:
    # Clamped to one step (see select_bucket_py.round_steps).
    r = F.floor(x + F.lit(0.5))
    return F.greatest(F.lit(steps), r - r % F.lit(steps))


def assign_bucket_columns(
    df: DataFrame,
    width_col: str = "width",
    height_col: str = "height",
    cfg: BucketConfig | None = None,
) -> DataFrame:
    """Append bucket_w/bucket_h/resized_w/resized_h/ar_error/train_w/train_h.

    Map-only: scales linearly with the scan; no shuffle, no UDF. The
    predefined-reso table rides along as a literal array (≤ ~100 elems),
    equivalent to a broadcast of the B1 table but cheaper (no join).
    """
    cfg = cfg or BucketConfig()
    w = F.col(width_col).cast("double")
    h = F.col(height_col).cast("double")
    ar = w / h
    steps = cfg.reso_steps

    if not cfg.no_upscale:
        resos = make_bucket_resolutions(cfg)
        reso_arr = F.array(
            *[
                F.struct(
                    F.lit(bw).alias("bw"),
                    F.lit(bh).alias("bh"),
                    F.lit(bw / bh).alias("ar"),  # python-float literal == np float64
                )
                for bw, bh in resos
            ]
        )
        # 1-NN on aspect ratio: linear scan keeping the FIRST minimum
        # (strict <), matching np.argmin over the sorted reso order.
        init = F.struct(
            F.lit(-1).alias("bw"), F.lit(-1).alias("bh"), F.lit(float("inf")).alias("err")
        )
        best = F.aggregate(
            reso_arr,
            init,
            lambda acc, x: F.when(
                F.abs(x["ar"] - ar) < acc["err"],
                F.struct(
                    x["bw"].alias("bw"),
                    x["bh"].alias("bh"),
                    F.abs(x["ar"] - ar).alias("err"),
                ),
            ).otherwise(acc),
        )
        exact = F.exists(
            reso_arr,
            lambda x: (x["bw"] == F.col(width_col)) & (x["bh"] == F.col(height_col)),
        )
        bucket_w = F.when(exact, F.col(width_col)).otherwise(best["bw"]).cast("int")
        bucket_h = F.when(exact, F.col(height_col)).otherwise(best["bh"]).cast("int")
        ar_reso = bucket_w.cast("double") / bucket_h.cast("double")
        scale = F.when(ar > ar_reso, bucket_h / h).otherwise(bucket_w / w)
        resized_w = F.floor(w * scale + F.lit(0.5)).cast("int")
        resized_h = F.floor(h * scale + F.lit(0.5)).cast("int")
        out = (
            df.withColumn("bucket_w", bucket_w)
            .withColumn("bucket_h", bucket_h)
            .withColumn("resized_w", resized_w)
            .withColumn("resized_h", resized_h)
        )
    else:
        area_over = (F.col(width_col).cast("long") * F.col(height_col).cast("long")) > F.lit(
            cfg.max_area
        )
        rw = F.sqrt(F.lit(float(cfg.max_area)) * ar)
        rh = F.lit(float(cfg.max_area)) / rw
        bwr = _round_steps(rw, steps)
        bh_in_wr = _round_steps(bwr / ar, steps)
        ar_wr = bwr / bh_in_wr
        bhr = _round_steps(rh, steps)
        bw_in_hr = _round_steps(bhr * ar, steps)
        ar_hr = bw_in_hr / bhr
        use_wr = F.abs(ar_wr - ar) < F.abs(ar_hr - ar)
        resized_w = (
            F.when(
                area_over,
                F.when(use_wr, bwr).otherwise(F.floor(bhr * ar + F.lit(0.5))),
            )
            .otherwise(F.col(width_col))
            .cast("int")
        )
        resized_h = (
            F.when(
                area_over,
                F.when(use_wr, F.floor(bwr / ar + F.lit(0.5))).otherwise(bhr),
            )
            .otherwise(F.col(height_col))
            .cast("int")
        )
        out = df.withColumn("resized_w", resized_w).withColumn("resized_h", resized_h)
        out = out.withColumn(
            "bucket_w",
            F.greatest(
                F.lit(steps), F.col("resized_w") - F.col("resized_w") % steps
            ).cast("int"),
        ).withColumn(
            "bucket_h",
            F.greatest(
                F.lit(steps), F.col("resized_h") - F.col("resized_h") % steps
            ).cast("int"),
        )

    return (
        out.withColumn(
            "ar_error",
            F.col("bucket_w").cast("double") / F.col("bucket_h").cast("double") - ar,
        )
        .withColumn("train_w", (F.col("bucket_w") - F.col("bucket_w") % 8).cast("int"))
        .withColumn("train_h", (F.col("bucket_h") - F.col("bucket_h") % 8).cast("int"))
    )


def crop_ltrb_columns(
    df: DataFrame,
    bucket_w: str = "bucket_w",
    bucket_h: str = "bucket_h",
    width_col: str = "width",
    height_col: str = "height",
) -> DataFrame:
    """Append crop_left/crop_top/crop_right/crop_bottom (B4)."""
    bw = F.col(bucket_w).cast("double")
    bh = F.col(bucket_h).cast("double")
    image_ar = F.col(width_col).cast("double") / F.col(height_col).cast("double")
    bucket_ar = bw / bh
    rw = F.when(bucket_ar > image_ar, bh * image_ar).otherwise(bw)
    rh = F.when(bucket_ar > image_ar, bh).otherwise(bw / image_ar)
    left = F.floor((bw - rw) / 2).cast("double")
    top = F.floor((bh - rh) / 2).cast("double")
    return (
        df.withColumn("crop_left", left)
        .withColumn("crop_top", top)
        .withColumn("crop_right", left + rw)
        .withColumn("crop_bottom", top + rh)
    )


# ---------------------------------------------------------------------------
# DuckDB oracle generator: the same math as ANSI-ish SQL, with the same
# reso literals, for the driver's correctness gate.
# ---------------------------------------------------------------------------
def bucket_oracle_sql(imgs_select: str, cfg: BucketConfig | None = None) -> str:
    """Build DuckDB SQL computing bucket assignment for ``imgs_select``
    (a SELECT yielding image_key, width, height) under ``cfg``.

    Upscale path only (the reference's primary path); the no-upscale
    oracle is generated by ``bucket_noupscale_oracle_sql``.
    """
    cfg = cfg or BucketConfig()
    resos = make_bucket_resolutions(cfg)
    # The CAST forces DOUBLE: a bare float literal in a VALUES
    # table types as DECIMAL(18,17) in DuckDB, which makes
    # abs(bar - ar) non-double arithmetic. Found at the 100x tier in
    # r10: (w,h)=(45,92) ties EXACTLY between 704x1408 and 704x1472
    # (both errors are 1/92 in rationals, and equal as IEEE doubles),
    # so the reference semantics (np.argmin over doubles — first
    # minimum in reso order, bucket_manager.py:205-207) pick 704x1408;
    # the DECIMAL path computed unequal errors and silently flipped
    # the tie to 704x1472. Gate-SF doc_ids never produce the tie, so
    # only the stress sweep caught it.
    values = ",\n      ".join(
        f"({i}, {bw}, {bh}, CAST({bw / bh!r} AS DOUBLE))"
        for i, (bw, bh) in enumerate(resos)
    )
    return f"""
    WITH imgs AS ({imgs_select}),
    resos(idx, bw, bh, bar) AS (VALUES
      {values}
    ),
    cand AS (
      SELECT i.image_key, i.width, i.height, r.bw, r.bh,
             row_number() OVER (
               PARTITION BY i.image_key
               ORDER BY (CASE WHEN r.bw = i.width AND r.bh = i.height THEN 0 ELSE 1 END),
                        abs(r.bar - i.width / CAST(i.height AS DOUBLE)),
                        r.idx
             ) AS rn
      FROM imgs i CROSS JOIN resos r
    ),
    chosen AS (
      SELECT image_key, width, height, bw, bh,
             width / CAST(height AS DOUBLE) AS ar,
             CAST(bw AS DOUBLE) / bh        AS ar_reso
      FROM cand WHERE rn = 1
    )
    SELECT image_key,
           CAST(bw AS INTEGER) AS bucket_w,
           CAST(bh AS INTEGER) AS bucket_h,
           CAST(floor(width  * (CASE WHEN ar > ar_reso THEN bh / CAST(height AS DOUBLE)
                                     ELSE bw / CAST(width AS DOUBLE) END) + 0.5) AS INTEGER) AS resized_w,
           CAST(floor(height * (CASE WHEN ar > ar_reso THEN bh / CAST(height AS DOUBLE)
                                     ELSE bw / CAST(width AS DOUBLE) END) + 0.5) AS INTEGER) AS resized_h,
           ar_reso - ar AS ar_error,
           CAST(bw - bw % 8 AS INTEGER) AS train_w,
           CAST(bh - bh % 8 AS INTEGER) AS train_h
    FROM chosen
    """


def bucket_noupscale_oracle_sql(imgs_select: str, cfg: BucketConfig | None = None) -> str:
    """DuckDB SQL for the no-upscale path (bucket_manager.py:120-154)."""
    cfg = cfg or BucketConfig(no_upscale=True)
    steps = cfg.reso_steps
    area = cfg.max_area

    def rsteps(x: str) -> str:
        # Clamped to one step (see select_bucket_py.round_steps).
        return (
            f"greatest({steps}, floor(({x}) + 0.5) "
            f"- CAST(floor(({x}) + 0.5) AS BIGINT) % {steps})"
        )

    return f"""
    WITH imgs AS ({imgs_select}),
    base AS (
      SELECT image_key, width, height,
             width / CAST(height AS DOUBLE) AS ar,
             CAST(width AS BIGINT) * height > {area} AS over
      FROM imgs
    ),
    rounded AS (
      SELECT *, sqrt({area} * ar) AS rw, {area} / sqrt({area} * ar) AS rh FROM base
    ),
    sides AS (
      SELECT *,
             {rsteps("rw")} AS bwr,
             {rsteps("rh")} AS bhr
      FROM rounded
    ),
    oriented AS (
      SELECT *,
             abs(bwr / {rsteps("bwr / ar")} - ar) AS err_wr,
             abs({rsteps("bhr * ar")} / bhr - ar) AS err_hr
      FROM sides
    ),
    resized AS (
      SELECT image_key, width, height, ar,
             CAST(CASE WHEN NOT over THEN width
                       WHEN err_wr < err_hr THEN bwr
                       ELSE floor(bhr * ar + 0.5) END AS INTEGER) AS resized_w,
             CAST(CASE WHEN NOT over THEN height
                       WHEN err_wr < err_hr THEN floor(bwr / ar + 0.5)
                       ELSE bhr END AS INTEGER) AS resized_h
      FROM oriented
    )
    , floored AS (
      SELECT *,
             greatest({steps}, resized_w - resized_w % {steps}) AS bw,
             greatest({steps}, resized_h - resized_h % {steps}) AS bh
      FROM resized
    )
    SELECT image_key,
           CAST(bw AS INTEGER) AS bucket_w,
           CAST(bh AS INTEGER) AS bucket_h,
           resized_w, resized_h,
           CAST(bw AS DOUBLE) / bh - ar AS ar_error,
           CAST(bw - bw % 8 AS INTEGER) AS train_w,
           CAST(bh - bh % 8 AS INTEGER) AS train_h
    FROM floored
    """
