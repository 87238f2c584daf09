"""Custom grouped operators via ``applyInPandas`` — the Arrow-batched
per-group escape hatch for semantics the built-in aggregates can't
express (SURVEY.md §2.2 "UDF/UDAF/UDTF surface").

Scale shape: one shuffle on the grouping key, then each group is
processed as a pandas frame on an executor. Correct when groups fit in
executor memory (bounded-cardinality keys like event_type); for
unbounded keys, pre-aggregate or salt first.

The UDF bodies are nested closures (shipped by value) so harness
sessions without this package on executor PYTHONPATH still run them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dump_es_parquet_spark.operators.tables import load

MEDIAN_SCHEMA = (
    "event_type string, n_events long, median_value double, "
    "iqr double, mad double"
)


def robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type robust statistics (median / IQR / MAD) — rank
    statistics need the whole group, the canonical applyInPandas case.
    numpy's linear-interpolated quantiles match DuckDB's
    ``quantile_cont`` bit-for-bit on the same doubles."""
    e = load(spark, sf_dir, "events")

    def _stats(pdf):
        import numpy as _np
        import pandas as _pd

        v = _np.sort(pdf["value"].to_numpy(dtype="float64"))
        med = _np.quantile(v, 0.5)
        q1, q3 = _np.quantile(v, 0.25), _np.quantile(v, 0.75)
        mad = _np.quantile(_np.sort(_np.abs(v - med)), 0.5)
        return _pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_events": [len(v)],
                "median_value": [round(med, 6)],
                "iqr": [round(q3 - q1, 6)],
                "mad": [round(mad, 6)],
            }
        )

    return (
        e.select("event_type", "value")
        .groupBy("event_type")
        .applyInPandas(_stats, MEDIAN_SCHEMA)
        .orderBy("event_type")
    )
