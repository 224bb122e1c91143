"""Shared building blocks for the training-data pipeline ops.

Every op here exists twice — as a Spark Column expression and as a
DuckDB-SQL string — generated from the same constants, so the driver's
Spark-vs-DuckDB correctness gate exercises identical semantics.

Portability notes (verified):
- md5 hex digests are identical in Spark, DuckDB, and Python
- 60-bit ints from the first 15 hex chars: Spark
  conv(substr(md5(x),1,15),16,10) == DuckDB
  CAST('0x' || substr(md5(x),1,15) AS BIGINT) == Python int(h[:15],16)
- tokenization: Spark \\s and RE2 \\s differ only on \\x0B — absent
  from all corpus text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from search_engine_spark.text.stopwords import STOPWORDS_SORTED

# ---------------------------------------------------------------------------
# md5 -> 60-bit int
# ---------------------------------------------------------------------------


def md5int_col(c: Column) -> Column:
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5int_sql(expr: str) -> str:
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


# ---------------------------------------------------------------------------
# canonical tokenizer, no-stem variant (SQL-expressible on both engines)
# ---------------------------------------------------------------------------

_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS_SORTED)


def tokens_sql(text_expr: str) -> str:
    """DuckDB list of canonical (unstemmed) tokens."""
    return (
        "list_filter("
        f"string_split_regex(regexp_replace(lower({text_expr}), '[^a-z0-9\\s]', ' ', 'g'), '\\s+'), "
        f"t -> length(t) >= 2 AND t NOT IN ({_STOP_SQL}))"
    )


# ---------------------------------------------------------------------------
# word k-shingles over a token array
# ---------------------------------------------------------------------------


def shingles_col(tokens: Column, k: int = 3) -> Column:
    n = F.size(tokens)
    mk = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens, i + j + 1) for j in range(k)]
        ),
    )
    return F.when(n >= k, mk).otherwise(F.array().cast("array<string>"))


def shingles_sql(col: str = "l", k: int = 3) -> str:
    """DuckDB shingle list over a token-list COLUMN NAME (use in a CTE
    where the tokens are already aliased, e.g. `... AS l`)."""
    parts = " || ' ' || ".join(f"{col}[i + {j}]" for j in range(k))
    return (
        f"(CASE WHEN len({col}) >= {k} THEN "
        f"list_transform(range(1, len({col}) - {k - 2}), i -> {parts}) "
        f"ELSE [] END)"
    )


# ---------------------------------------------------------------------------
# MinHash family: h_i(x) = (a_i * (x mod p) + b_i) mod p
# ---------------------------------------------------------------------------

MINHASH_P = 2_147_483_647  # 2^31 - 1


def minhash_seeds(num_hashes: int) -> list[tuple[int, int]]:
    out = []
    for i in range(num_hashes):
        a = (1103515245 * (i + 1) + 12345) % MINHASH_P
        b = (1103515245 * (i + 101) + 54321) % MINHASH_P
        out.append((max(a, 1), b))
    return out


def minhash_col(x: Column, a: int, b: int) -> Column:
    return (F.lit(a) * (x % F.lit(MINHASH_P)) + F.lit(b)) % F.lit(MINHASH_P)


def minhash_sql(x_expr: str, a: int, b: int) -> str:
    return f"(({a} * (({x_expr}) % {MINHASH_P}) + {b}) % {MINHASH_P})"


# ---------------------------------------------------------------------------
# cosine similarity over array<float> embeddings (float64 math)
# ---------------------------------------------------------------------------


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_col(a: Column, b: Column) -> Column:
    # try_divide: a zero-norm vector (real corpora contain them —
    # empty docs, padding rows) must yield NULL cosine, not abort the
    # whole scan with DIVIDE_BY_ZERO under ANSI mode.  NULL is also
    # exactly what the DuckDB oracles produce for x/0, and both
    # engines sort NULLs last under ORDER BY cosine DESC, so top-k
    # parity holds.  Found by the retriever fuzzer (test_retriever_fuzz).
    return F.try_divide(
        dot_col(a, b), F.sqrt(dot_col(a, a)) * F.sqrt(dot_col(b, b))
    )
