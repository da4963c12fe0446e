"""vector_search_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of the reference RAG/vector-search system
(p1va/3-2-1-vector-search, surveyed in SURVEY.md).

Design (SURVEY.md §7): a library of DataFrame-composable operators —
everything is expressed against the PySpark DataFrame/SQL API so Catalyst
plans it (predicate pushdown, column pruning, broadcast joins, AQE), with
pandas UDFs only for the genuinely non-relational seams (model inference,
HTML parsing).  No server, no external vector store: the "index" is a
partitioned Parquet table and KNN is exact distributed DataFrame math.

Subpackages
-----------
- ``sources``   — readers/writers (parquet tables, document files, URL tables)
- ``functions`` — scalar/column functions (vector math, text stats, scalars)
- ``operators`` — relational operators (KNN, similarity join, dedup, chunker,
                  filters, text analysis, multimodal plumbing)
- ``plans``     — composed end-to-end pipelines (search, ingest)
- ``streaming`` — Structured Streaming demonstrators (windowed event aggs)

The name mirrors ``3_2_1_vector_search`` (not a valid Python identifier).
"""

__version__ = "0.1.0"
