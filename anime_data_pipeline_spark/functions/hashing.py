"""Cross-engine deterministic hashing primitives.

Spark's ``hash()`` (Murmur3) and DuckDB's ``hash()`` are different
functions, so oracle-checked dedup/similarity operators use an explicit
31-base polynomial rolling hash mod p — plain integer arithmetic that
is bit-identical in any engine (and cheap under whole-stage codegen).

h(s) = fold(chars(s), 0, (acc, c) -> (acc * 31 + codepoint(c)) mod P)

MinHash permutations are the classic (a*h + b) mod P family with fixed
deterministic constants (no runtime randomness — reproducible runs and
resumable pipelines at scale).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

P = 1_000_000_007
_A_SEED = 2_654_435_761
_B_SEED = 40_503


def perm_constants(k: int) -> list[tuple[int, int]]:
    """k deterministic (a, b) pairs for the permutation family."""
    return [((_A_SEED * (i + 1)) % P, (_B_SEED * (i + 7) + 1) % P) for i in range(k)]


def polyhash(col: Column) -> Column:
    """Polynomial rolling hash of a string column → long in [0, P)."""
    return F.aggregate(
        F.transform(F.split(col, ""), lambda c: F.ascii(c).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + c) % F.lit(P),
    )


def polyhash2(col: Column) -> Column:
    """Base-37 twin of :func:`polyhash` — an INDEPENDENT second content
    hash for collision verification. Two distinct same-length strings
    colliding under base 31 satisfy D(31) ≡ 0 mod P for the difference
    polynomial D; also colliding under base 37 additionally requires
    D(37) ≡ 0, so pairwise false-match probability drops from ~1/P to
    ~1/P² (≈1e-18) — the second-independent-hash fix for exact-dup
    declarations made from hashes alone (a prefix/suffix-salted base-31
    hash would NOT work: same-length base-31 collisions survive any
    affine salt)."""
    return F.aggregate(
        F.transform(F.split(col, ""), lambda c: F.ascii(c).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 37 + c) % F.lit(P),
    )


def polyhash2_sql(expr: str) -> str:
    """The identical base-37 hash as DuckDB SQL text."""
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({expr}, ''), c -> CAST(ascii(c) AS BIGINT))), "
        f"(a, b) -> (a * 37 + b) % {P})"
    )


def polyhash_py(s: str) -> int:
    """Pure-Python twin of :func:`polyhash` / :func:`polyhash_sql` —
    used by stub models (operators/multimodal.py, operators/inference.py)
    so that their fake logits are recomputable by the DuckDB oracle."""
    acc = 0
    for c in s:
        acc = (acc * 31 + ord(c)) % P
    return acc


def polyhash_sql(expr: str) -> str:
    """The identical hash as DuckDB SQL text."""
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({expr}, ''), c -> CAST(ascii(c) AS BIGINT))), "
        f"(a, b) -> (a * 31 + b) % {P})"
    )


def perm_hash(h: Column, a: int, b: int) -> Column:
    return (F.lit(a) * h + F.lit(b)) % F.lit(P)


def perm_hash_sql(h_expr: str, a: int, b: int) -> str:
    return f"(({a} * {h_expr} + {b}) % {P})"


def shingle_hashes(th: Column, n: int = 3) -> Column:
    """n-token shingle hashes folded from a token-hash array: the hash
    of shingle i is ``fold(th[i..i+n-1], (acc, t) -> (acc*31 + t) % P)``
    (first element taken as-is). O(n) per shingle from precomputed token
    hashes — ~10× cheaper than re-hashing each shingle's characters.

    ``th`` MUST be a materialized column attribute (withColumn), not a
    nested expression: it is referenced per shingle element and a nested
    expression would be re-evaluated at each reference.
    """
    size = F.size(th)
    idx = F.sequence(F.lit(1), size - (n - 1))

    def mk(i: Column) -> Column:
        v = F.element_at(th, i)
        for j in range(1, n):
            v = (v * 31 + F.element_at(th, i + F.lit(j))) % F.lit(P)
        return v

    return F.when(size >= n, F.transform(idx, mk)).otherwise(
        F.array().cast("array<long>")
    )


def polyhash_spark_expr(v: str) -> str:
    """:func:`polyhash` as Spark-SQL TEXT — parses to the identical
    Aggregate/Transform Catalyst nodes as the Column spelling, for ONE
    py4j round-trip instead of ~20 (the expression-build latency class
    documented on operators/dedup.shingle_hash_sets)."""
    return (
        f"aggregate(transform(split({v}, ''), c -> CAST(ascii(c) AS BIGINT)), "
        f"CAST(0 AS BIGINT), (acc, c) -> (acc * 31 + c) % {P})"
    )


def tokens_spark_expr(text_col: str) -> str:
    """functions.text.tokens as Spark-SQL text (same nodes)."""
    return f"filter(split(`{text_col}`, ' '), t -> t != '')"


def token_hashes_spark_expr(toks_expr: str) -> str:
    """Per-token :func:`polyhash` array as Spark-SQL text."""
    return f"transform({toks_expr}, t -> {polyhash_spark_expr('t')})"


def shingle_hashes_spark_expr(th: str, n: int = 3) -> str:
    """:func:`shingle_hashes` as Spark-SQL text (identical nodes; the
    py4j cost of the Column form grows with n — n=10 span hashing costs
    ~100 round-trips per consumer)."""
    v = f"element_at({th}, i)"
    for j in range(1, n):
        v = f"(({v}) * 31 + element_at({th}, i + {j})) % {P}"
    return (
        f"CASE WHEN size({th}) >= {n} THEN "
        f"transform(sequence(1, size({th}) - {n - 1}), i -> {v}) "
        f"ELSE CAST(array() AS ARRAY<BIGINT>) END"
    )


def shingle_hashes_sql(th_expr: str, n: int = 3) -> str:
    """The identical shingle-hash fold as DuckDB SQL (1-based lists)."""
    v = f"{th_expr}[i]"
    for j in range(1, n):
        v = f"((({v}) * 31 + {th_expr}[i + {j}]) % {P})"
    return (
        f"CASE WHEN len({th_expr}) >= {n} THEN "
        f"list_transform(generate_series(1, len({th_expr}) - {n - 1}), i -> {v}) "
        f"ELSE CAST([] AS BIGINT[]) END"
    )


def hash_chain(seed: int, n: int) -> list[int]:
    """n unrelated pseudorandom constants in [0, P): iterated
    string-rehashing (x → polyhash(str(x) + "/mix")). Unlike the
    (a·i + b) perm family or polyhash of strings differing in one
    character — both AFFINE families with a constant step — chained
    values have no linear relation, which matters when the constants
    multiply a variable (e.g. the stub feature encoder: affine
    constants made every vector an arithmetic progression and
    embedding-cosine dedup collapsed unrelated items)."""
    out, x = [], seed
    for _ in range(n):
        x = polyhash_py(str(x) + "/mix")
        out.append(x)
    return out
