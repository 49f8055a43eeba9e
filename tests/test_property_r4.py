"""Hypothesis property tests for the round-4 operators — pure-Python
mirrors of the engine math (no Spark job per example; the Spark↔spec
equivalence is covered by the DuckDB oracle gate)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from anime_data_pipeline_spark.functions.hashing import P, hash_chain, polyhash_py

# ---------------------------------------------------------------------------
# int8 quantization: the pure math of operators/similarity.quantize_int8
# ---------------------------------------------------------------------------
_vec = st.lists(
    st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    ),
    min_size=1,
    max_size=64,
)


def _quantize_py(v: list[float]) -> tuple[float, list[int]]:
    import math

    maxabs = max(abs(x) for x in v)
    # guard on the DIVIDED value: subnormal maxabs underflows the
    # division to 0.0 (hypothesis found v=[5e-324]) — zero-vector path
    scale = maxabs / 127.0 if maxabs / 127.0 > 0 else 1.0
    q = [max(-127.0, min(127.0, math.floor(x / scale + 0.5))) for x in v]
    return scale, [int(x) for x in q]


@settings(max_examples=300, deadline=None)
@given(v=_vec)
def test_quantize_codes_bounded_and_error_below_half_step(v):
    scale, q = _quantize_py(v)
    assert all(-127 <= c <= 127 for c in q)
    for x, c in zip(v, q):
        # reconstruction error is at most half a quantization step
        assert abs(x - c * scale) <= scale / 2 + 1e-9 * max(1.0, abs(x))


@settings(max_examples=300, deadline=None)
@given(v=_vec)
def test_quantize_scale_invariance_of_codes(v):
    # scaling the vector scales the codes' reconstruction proportionally:
    # codes themselves are invariant to positive uniform scaling
    _, q1 = _quantize_py(v)
    _, q2 = _quantize_py([x * 4.0 for x in v])
    assert q1 == q2


# ---------------------------------------------------------------------------
# rank-based quantile / band filters: exact drop counts at any shape
# ---------------------------------------------------------------------------
@settings(max_examples=300, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=400),
    lo=st.floats(min_value=0.0, max_value=0.5),
    hi=st.floats(min_value=0.5, max_value=1.0),
)
def test_rank_band_cardinality(n, lo, hi):
    import math

    # the band (lo, hi] by rank keeps exactly floor(hi n) - floor(lo n)
    kept = [r for r in range(1, n + 1) if math.floor(lo * n) < r <= math.floor(hi * n)]
    assert len(kept) == math.floor(hi * n) - math.floor(lo * n)


# ---------------------------------------------------------------------------
# span dedup coverage: interval union math
# ---------------------------------------------------------------------------
@settings(max_examples=300, deadline=None)
@given(
    starts=st.lists(st.integers(min_value=1, max_value=50), max_size=12),
    n=st.integers(min_value=2, max_value=10),
)
def test_span_coverage_union_bounds(starts, n):
    covered = set()
    for p in starts:
        covered.update(range(p, p + n))
    # union is at most sum of span lengths, at least the longest span
    assert len(covered) <= len(starts) * n
    if starts:
        assert len(covered) >= n
        assert min(covered) == min(starts)
        assert max(covered) == max(starts) + n - 1


# ---------------------------------------------------------------------------
# Bloom filter: no false negatives, ever (the defining invariant)
# ---------------------------------------------------------------------------
@settings(max_examples=200, deadline=None)
@given(
    members=st.sets(st.integers(min_value=0, max_value=P - 1), max_size=50),
    probes=st.sets(st.integers(min_value=0, max_value=P - 1), max_size=50),
    m_exp=st.integers(min_value=5, max_value=16),
)
def test_bloom_no_false_negatives(members, probes, m_exp):
    m = 1 << m_exp
    consts = [(a, b) for a, b in zip(hash_chain(7, 4), hash_chain(8, 4))]
    bits = {((a * x + b) % P) % m for x in members for a, b in consts}
    for x in members | probes:
        hit = all(((a * x + b) % P) % m in bits for a, b in consts)
        if x in members:
            assert hit  # a member can NEVER be missed
    # and the filter is not degenerate-full unless tiny
    if members and m > 8 * len(members) * 4:
        assert len(bits) <= 4 * len(members)


# ---------------------------------------------------------------------------
# DSIR log-weights: sum over docs of weights equals 0 iff target == raw
# (distribution-matching sanity via the pure formula)
# ---------------------------------------------------------------------------
@settings(max_examples=200, deadline=None)
@given(
    counts=st.dictionaries(
        st.integers(min_value=0, max_value=31),
        st.integers(min_value=1, max_value=20),
        min_size=1,
        max_size=16,
    )
)
def test_dsir_weight_zero_when_target_equals_raw(counts):
    import math

    B = 32
    tot = sum(counts.values())
    # target == raw ⇒ logp == logq per bucket ⇒ every doc's weight is 0
    for bucket, c in counts.items():
        logp = math.log((c + 1.0) / (tot + B))
        logq = math.log((c + 1.0) / (tot + B))
        assert logp - logq == 0.0


def test_hash_chain_deterministic_and_seed_sensitive():
    assert hash_chain(1, 8) == hash_chain(1, 8)
    assert hash_chain(1, 8) != hash_chain(2, 8)
    assert all(0 <= x < P for x in hash_chain(3, 32))


def test_cdc_chunks_realign_after_prefix_edit(spark):
    """The CDC property: prepending words shifts every FIXED-size chunk,
    but content-defined chunks re-align at the next boundary — the two
    versions must share most chunk hashes (revision-tolerant dedup)."""
    from pyspark.sql import functions as F

    from anime_data_pipeline_spark.operators.textstats import cdc_chunks

    words = " ".join(f"w{i * 7919 % 1000}x{i % 13}" for i in range(400))
    df = spark.createDataFrame(
        [(1, words), (2, "inserted preamble words here " + words)],
        "doc_id long, text string",
    )
    out = cdc_chunks(df, "doc_id", "text", divisor=16)
    h1 = {r["chunk_hash"] for r in out.filter(F.col("doc") == 1).collect()}
    h2 = {r["chunk_hash"] for r in out.filter(F.col("doc") == 2).collect()}
    shared = len(h1 & h2)
    assert shared >= max(1, int(0.7 * len(h1))), (
        f"chunks failed to re-align: {shared}/{len(h1)} shared"
    )
    # spans tile the doc exactly: starts/ends contiguous, cover 1..n
    rows = sorted(
        ((r["chunk_idx"], r["start"], r["end"]) for r in
         out.filter(F.col("doc") == 1).collect())
    )
    assert rows[0][1] == 1
    for (ia, sa, ea), (ib, sb, eb) in zip(rows, rows[1:]):
        assert sb == ea + 1 and ib == ia + 1
