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
