"""Simulate the driver's correctness gate locally.

Runs ``entry(spark)`` as a smoke check, then every ``queries()`` entry
at the given sf dir side-by-side with its ``oracle_sql()`` in DuckDB,
comparing row count, column names, and (order-insensitively) values.

Usage: python scripts/driver_check.py [sf_dir] [--exact] [name_substring ...]

With name substrings, only matching queries run (fast iteration on a
query under development); the driver itself always runs everything.

``--exact`` mirrors the driver's value-hash instead of the default
1e-9 float tolerance: output dtypes must agree (a Spark DECIMAL
surfacing as ``object``/Decimal against a DuckDB DOUBLE/float64 is a
FAIL even when every value is numerically identical — exactly the
r5 q172 driver mismatch this tolerance hole let through), and values
are compared with zero tolerance on their canonical string form.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2:]
EXACT = "--exact" in ONLY
if EXACT:
    ONLY.remove("--exact")


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _canon_strs(col: pd.Series) -> pd.Series:
    """Canonical per-value strings for exact-mode comparison: repr of
    the value (so ``Decimal('1.720000')`` != ``1.72`` — a dtype
    divergence the driver's hash also sees), with NaN/None unified."""
    return col.map(lambda v: "<null>" if pd.isna(v) else repr(v))


def _dt_kind(col: pd.Series) -> bool:
    """Datetime-like: datetime64 of any resolution, or an object
    column of datetime.date/datetime values (Spark DATE → pandas
    object). The driver's hash stringifies these to the same form, so
    exact mode canonicalizes the unit but keeps zero value
    tolerance."""
    if pd.api.types.is_datetime64_any_dtype(col):
        return True
    if col.dtype == object:
        import datetime

        nn = col.dropna()
        return len(nn) > 0 and isinstance(nn.iloc[0], (datetime.date, datetime.datetime))
    return False


def compare_exact(a: pd.DataFrame, e: pd.DataFrame) -> None:
    for c in a.columns:
        if _dt_kind(a[c]) or _dt_kind(e[c]):
            da = pd.to_datetime(a[c]).astype("datetime64[us]")
            de = pd.to_datetime(e[c]).astype("datetime64[us]")
            bad = ~((da == de) | (da.isna() & de.isna()))
            assert not bad.any(), (
                f"col {c}: {int(bad.sum())} datetime values differ "
                f"(first: {da[bad].iloc[0]!r} vs {de[bad].iloc[0]!r})"
            )
            continue
        ka = "float" if pd.api.types.is_float_dtype(a[c]) else (
            "int" if pd.api.types.is_integer_dtype(a[c]) else str(a[c].dtype)
        )
        ke = "float" if pd.api.types.is_float_dtype(e[c]) else (
            "int" if pd.api.types.is_integer_dtype(e[c]) else str(e[c].dtype)
        )
        assert ka == ke, f"col {c}: dtype kind {ka} (spark) vs {ke} (oracle)"
        if ka == "float":
            fa, fe = a[c].astype("float64"), e[c].astype("float64")
            bad = ~((fa == fe) | (fa.isna() & fe.isna()))
            assert not bad.any(), (
                f"col {c}: {int(bad.sum())} values differ at zero tolerance "
                f"(first: {fa[bad].iloc[0]!r} vs {fe[bad].iloc[0]!r})"
            )
        elif ka == "int":
            fa, fe = a[c].astype("int64"), e[c].astype("int64")
            bad = fa != fe
            assert not bad.any(), f"col {c}: {int(bad.sum())} int values differ"
        else:
            sa, se = _canon_strs(a[c]), _canon_strs(e[c])
            bad = (sa != se).sum()
            assert bad == 0, f"col {c}: {bad} mismatched values (exact)"


def main() -> int:
    import __spark_entry__ as ent
    from anime_data_pipeline_spark.catalog import TABLES
    from anime_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="driver_check")

    res = ent.entry(spark)
    rows = res.collect()
    print(f"entry(): {len(rows)} rows, schema={res.columns}")
    assert len(rows) >= 0

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.isdir(p):
            # directory-of-parts shape (the 100x stress tier, any real
            # ingest drop zone) — DuckDB needs the glob form
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = ent.queries(), ent.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    names = list(qs)
    if "--first50" in ONLY:
        # Simulate the driver's exact sample: the first 50 entries of
        # queries() iteration order (verified against CORRECTNESS_r02).
        ONLY.remove("--first50")
        names = names[:50]
    for name in sorted(names):
        if ONLY and not any(s in name for s in ONLY):
            continue
        # Timestamped stderr marker BEFORE the query runs (mirrors
        # bench.py's per-query line) so any executor warning burst in
        # the interleaved log — WindowExec, BlockManager, codegen — is
        # attributable to the query that emitted it.
        print(
            f"[driver_check {time.strftime('%H:%M:%S')}] {name}",
            file=sys.stderr,
            flush=True,
        )
        t0 = time.monotonic()
        try:
            sdf = qs[name](spark, SF_DIR)
            if name not in oracles:
                n = sdf.count()
                print(f"  {name}: rows-only ({n} rows) [{time.monotonic() - t0:.1f}s]")
                n_rows_only += 1
                continue
            a = norm(sdf.toPandas())
            t_spark = time.monotonic() - t0
            e = norm(con.execute(oracles[name]).fetch_df())
            assert list(a.columns) == list(e.columns), (
                f"cols {list(a.columns)} vs {list(e.columns)}"
            )
            assert len(a) == len(e), f"rows {len(a)} vs {len(e)}"
            if EXACT:
                compare_exact(a, e)
            else:
                for c in a.columns:
                    if pd.api.types.is_float_dtype(a[c]) or pd.api.types.is_float_dtype(e[c]):
                        diff = (a[c].astype(float) - e[c].astype(float)).abs().max()
                        assert not (diff > 1e-9), f"col {c} max diff {diff}"
                    else:
                        sa = a[c].astype(str).where(a[c].notna(), "<null>")
                        se = e[c].astype(str).where(e[c].notna(), "<null>")
                        bad = (sa != se).sum()
                        assert bad == 0, f"col {c}: {bad} mismatched values"
            t_all = time.monotonic() - t0
            print(
                f"  {name}: OK ({len(a)} rows) "
                f"[spark {t_spark:.1f}s, oracle {t_all - t_spark:.1f}s]"
            )
            n_pass += 1
        except Exception as exc:  # noqa: BLE001
            print(f"  {name}: FAIL — {exc}")
            n_fail += 1
        finally:
            # Cache lifecycle (r11 verdict #3): queries that persist()
            # multi-consumer intermediates (q35/q86/q88/q104, the
            # tf/vocab side-tables) return lazy plans, so the operator
            # cannot unpersist without forcing eager evaluation —
            # CALLERS own the lifecycle. Releasing per query keeps a
            # 195-query sweep's block manager flat instead of leaking
            # pinned MEMORY_AND_DISK partitions until LRU eviction.
            spark.catalog.clearCache()
    print(f"\n{n_pass} oracle-match, {n_rows_only} rows-only, {n_fail} FAIL at {SF_DIR}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
