"""search_engine_spark — a PySpark-native full-text indexing + BM25 engine.

A from-scratch rebuild of the capabilities of ironsupr/Search_Engine
(reference at /root/reference, read-only) as a pure batch Spark engine:

- HTML -> text extraction as a vectorized Arrow UDF (reference:
  backend/crawler_service/crawler.py:333-361)
- canonical tokenizer: lowercase / punctuation strip / stopword removal /
  len>=2 / Porter stem (reference: backend/ranking_service/tfidf.py:111-144)
- inverted-index build: salted, range-partitioned posting-list construction
  with delta+varint compression and per-block max-score metadata
- BM25 top-k query engine with block-max pruning over broadcast term stats
- TF-IDF scoring variants, PageRank, dedup / similarity / text-analysis ops
  for large-scale training-data pipelines

Everything is DataFrame-first: Catalyst plans the physical execution; Python
appears only in Arrow-vectorized UDFs (extraction, stemming, block codecs).
"""

__version__ = "0.1.0"
