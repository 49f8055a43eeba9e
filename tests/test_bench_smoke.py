"""Bench smoke gate: every headline query must run end-to-end.

Round 2's bench crashed (q19 AnalysisException) without any test
noticing, so the driver recorded BENCH_r02 as rc=1/no-timings. This
test executes each BENCH_QUERIES entry once at sf0.001 through the
same noop sink bench.py uses — a crashing headline query now fails
the suite before it can reach the driver's bench run.
"""

from __future__ import annotations

import pytest

import bench
from anime_data_pipeline_spark.registry import all_queries

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", bench.BENCH_QUERIES + bench.EXTRA_QUERIES)
def test_headline_query_runs(spark, name):
    qs = all_queries()
    assert name in qs, f"bench names unregistered query {name}"
    qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()


def test_final_bench_line_fits_driver_tail():
    """The driver keeps only the last 2000 bytes of bench stdout;
    BENCH_r06/r07 went parsed:null when the verbose record outgrew it.
    Pin the compact final line (worst-case 8-char timings) under 1500B
    so headline growth can't silently blind the regression gate again."""
    import json

    compact = {
        "metric": "headline_queries_total",
        "value": 99999.999,
        "unit": "sec",
        "median_total": 99999.999,
        "extra_total": 99999.999,
        "queries": {q: 9999.999 for q in bench.BENCH_QUERIES},
        "sf": 0.1,
    }
    assert len(json.dumps(compact)) <= 1500
