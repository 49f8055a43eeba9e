"""anime_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference pipeline (``toilaluan/anime_data_pipeline``), re-expressed as
idiomatic Spark DataFrame/SQL operators and designed for 100 TB scale:

- declarative DataFrame plans (Catalyst optimizes: pushdown, pruning, AQE)
- broadcast joins for small dimension tables, shuffle-minimal aggregations
- Pandas UDFs / ``mapInPandas`` only where built-ins cannot express semantics
- Parquet as the primary storage format; JSON only as a compatibility export

Package layout (per SURVEY.md §7):

- ``session``    — tuned SparkSession builder
- ``catalog``    — test-table loading / temp-view registration
- ``functions``  — column-expression libraries (keys, tags, text, math)
- ``operators``  — bucketing, tag ordering, dedup, similarity, text analysis
- ``sources``    — sidecar text, dict-keyed JSON, binary images, CSV vocab
- ``plans``      — end-to-end pipeline composition (EP1/EP2/EP3 equivalents)
- ``streaming``  — Structured Streaming extensions over event streams
"""

__version__ = "0.1.0"

from anime_data_pipeline_spark.session import get_spark  # noqa: E402,F401


def __getattr__(name: str):
    """Lazy convenience imports: `adps.operators`, `adps.sources`, ...
    without importing pyspark-heavy modules at package import time."""
    import importlib

    if name in {
        "catalog", "config", "functions", "operators", "plans",
        "queries", "registry", "sources", "streaming",
    }:
        return importlib.import_module(f"{__name__}.{name}")
    raise AttributeError(name)
