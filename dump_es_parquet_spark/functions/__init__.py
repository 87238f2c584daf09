"""User-defined function surface (SURVEY.md §2.2 "UDF/UDAF/UDTF"):

- scalar pandas UDFs / mapInPandas: ``operators/multimodal.py``,
  ``operators/embedding_block.py``
- grouped UDAF (applyInPandas): ``operators/grouped.py``
- stateful (applyInPandasWithState): ``streaming/stateful.py``
- table function (UDTF): ``functions.udtf.ShingleExplode`` here
"""
