"""searchengine_spark — a from-scratch PySpark-native inverted-index + BM25
top-k engine with the query/data-processing capabilities of the reference
GuyShimony/SearchEngine (see SURVEY.md), re-expressed as idiomatic Spark.

Subpackages:
  tokenizer   — vectorized Arrow tokenizer + stopword filter (ref: Part A/parser_module.py)
  postings    — (doc, term, tf) relational core, doc stats, dictionary (ref: Part A/indexer.py)
  scoring     — BM25 / inner-product / cosine scorers (ref: Part C/ranker.py)
  index       — varbyte+delta block codec, salted segment build, manifests (ref: Part A/merger.py, posting_file_factory.py)
  query       — segment pruning, block-max WAND, bounded-heap top-k (ref: Part C/searcher.py)
  ops         — dedup / similarity / text-stats / multimodal for training-data pipelines
  streaming   — Structured-Streaming incremental ingestion (foreachBatch segments)
  tweetparser — tweet-mode parity parser (SURVEY §2.2 T5-T15)
  expansion   — query rewriters: spell / synonym / embedding 2-NN (§2.11)
  stemming    — opt-in T16 stemmer (py / Arrow UDF / Catalyst expr)
  porter2     — snowball-exact English stemmer (published Porter2 algorithm)
  metrics     — MAP / P@k / recall as DataFrame ops
  oracle      — pure-Python rank-identity oracle
"""

__version__ = "0.1.0"

BM25_K1 = 1.5
BM25_B = 0.75
