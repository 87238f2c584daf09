"""Analytics operators — the layer the reference defers to DuckDB
(``README.md:99-103``), kept in Spark instead (SURVEY.md §2.2), plus
the large-scale training-data pipeline extensions (dedup, similarity
search, text analysis, multimodal columns)."""
