"""Declared StructTypes for every engine table.

The reference declares all schemas by hand (SQL DDL backend/database/
schema.sql, Pydantic shared/models.py, ES mapping indexer.py:163-206);
we do the same — no schema inference anywhere.
"""

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Input corpus (BASELINE.json input_hint; Common-Crawl-style pages).
PAGES = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

# Per-document table (reference IndexDocument, indexer.py:52-76).
DOCS = StructType(
    [
        StructField("doc_id", LongType(), False),  # dense id for delta coding
        StructField("url", StringType(), False),
        StructField("url_hash", StringType(), False),  # sha2(url,256), utils.py:11-13
        StructField("title", StringType(), True),
        StructField("description", StringType(), True),
        StructField("domain", StringType(), True),
        StructField("warc_ts", TimestampType(), True),
        StructField("doclen", LongType(), False),  # non-stopword token count
    ]
)

# Posting-list blocks (north-rule format; FIXTURES.md §3).
POSTINGS = StructType(
    [
        StructField("term", StringType(), False),
        StructField("term_bucket", IntegerType(), False),  # pmod(xxhash64(term), B)
        StructField("first_doc_id", LongType(), False),
        StructField("last_doc_id", LongType(), False),
        StructField("count", IntegerType(), False),  # postings in block
        StructField("doc_ids", BinaryType(), False),  # delta+varint
        StructField("tfs", BinaryType(), False),  # varint
        StructField("doclens", BinaryType(), False),  # varint (join-free scoring)
        StructField("block_max_score", DoubleType(), False),  # exact max BM25 in block
        # Merge-safe pruning metadata: BM25 is increasing in tf and
        # decreasing in dl, so score(max_tf, min_dl, idf_now, avgdl_now)
        # upper-bounds every posting in the block under CURRENT corpus
        # stats — unlike block_max_score, which is exact only under the
        # stats of the build that wrote it and goes stale after an
        # incremental merge changes N/avgdl (index/merge.py).
        StructField("max_tf", IntegerType(), False),
        StructField("min_dl", LongType(), False),
    ]
)

# Positional posting blocks (Lucene .prx analogue; built only when
# build_index(index_positions=True)).  Positions are 0-based offsets in
# the FILTERED token stream (stopwords removed, stemmed) — the same
# stream tokens_stage stores — so phrase adjacency means "adjacent after
# stopword removal", like Lucene's StopFilter without position
# increments.  Payload layout per block: doc_ids delta+varint,
# pos_counts varint (positions per doc), positions = concatenated
# per-doc sorted position lists, segmented-delta+varint; doclens varint
# for join-free phrase BM25 scoring.
POS_POSTINGS = StructType(
    [
        StructField("term", StringType(), False),
        StructField("term_bucket", IntegerType(), False),
        StructField("first_doc_id", LongType(), False),
        StructField("last_doc_id", LongType(), False),
        StructField("count", IntegerType(), False),  # docs in block
        StructField("doc_ids", BinaryType(), False),
        StructField("pos_counts", BinaryType(), False),
        StructField("positions", BinaryType(), False),
        StructField("doclens", BinaryType(), False),
    ]
)

# Per-term statistics (broadcast at query time).
TERM_STATS = StructType(
    [
        StructField("term", StringType(), False),
        StructField("df", LongType(), False),
        StructField("max_score", DoubleType(), True),  # global UB for WAND (exact at build stats; NULL after merge)
        StructField("term_bucket", IntegerType(), False),
        StructField("max_tf", IntegerType(), False),  # merge-safe UB inputs
        StructField("min_dl", LongType(), False),
    ]
)

# Deleted-document bitmap analogue (index/merge.py): a re-crawled url
# tombstones its old doc_id, exactly like Lucene's per-segment deleted
# docs; compaction rewrites postings without them.
TOMBSTONES = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("url", StringType(), False),
        StructField("build_id", StringType(), False),
    ]
)

# Bigram (shingle) language-model stats for the phrase suggester
# (builder.build_shingle_stats; ES shingle-field analogue).  `bigram`
# is the concatenated "w1 w2" sort/lookup key the table is range-
# partitioned by; cnt is the total occurrence count of the adjacent
# pair in the canonical stemmed token stream.
SHINGLE_STATS = StructType(
    [
        StructField("bigram", StringType(), False),
        StructField("w1", StringType(), False),
        StructField("w2", StringType(), False),
        StructField("cnt", LongType(), False),
    ]
)

# Total term occurrences (Σtf, content field) — the unigram model
# backing Stupid-Backoff smoothing in the phrase suggester.
UNIGRAM_STATS = StructType(
    [
        StructField("term", StringType(), False),
        StructField("cnt", LongType(), False),
    ]
)

# Corpus scalars.
CORPUS_STATS = StructType(
    [
        StructField("n_docs", LongType(), False),
        StructField("avgdl", DoubleType(), False),
        StructField("total_tokens", LongType(), False),
    ]
)

# Checkpoint / lineage manifest (north rule: resumable builds).
MANIFEST = StructType(
    [
        StructField("build_id", StringType(), False),
        StructField("stage", StringType(), False),
        StructField("partition_key", IntegerType(), False),  # term_bucket
        StructField("status", StringType(), False),
        StructField("rows", LongType(), True),
        StructField("bytes", LongType(), True),
        StructField("wall_ms", LongType(), True),
        StructField("input_fingerprint", StringType(), True),
    ]
)

# Query log (schema.sql:53-61; written main.py:270-279).
QUERY_LOG = StructType(
    [
        StructField("query", StringType(), False),
        StructField("results_count", IntegerType(), False),
        StructField("response_time_ms", IntegerType(), False),
        StructField("cache_hit", BooleanType(), False),
        StructField("queried_at", TimestampType(), False),
    ]
)

# Query-result cache (main.py:146-158,235 — the Redis SETEX response
# cache as an append-only parquet table; key = md5(q:page:size)).
QUERY_CACHE = StructType(
    [
        StructField("cache_key", StringType(), False),
        StructField("response_json", StringType(), False),
        StructField("cached_at", TimestampType(), False),
    ]
)

# Link graph (schema.sql:24-31).
EDGES = StructType(
    [
        StructField("src", StringType(), False),
        StructField("dst", StringType(), False),
    ]
)

TOKENS = ArrayType(StringType())
