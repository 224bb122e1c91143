"""Pinned English stopword list.

This is the reference's fallback stopword set
(backend/ranking_service/tfidf.py:98-109), pinned as a constant so the
engine is deterministic and hermetic — we deliberately do NOT download
NLTK data at runtime (the reference's silent nltk.download fallback is a
reproducibility hazard we don't copy).
"""

STOPWORDS = frozenset(
    {
        "a", "an", "and", "are", "as", "at", "be", "by", "for", "from",
        "has", "he", "in", "is", "it", "its", "of", "on", "that", "the",
        "to", "was", "were", "will", "with", "this", "but", "they",
        "have", "had", "what", "when", "where", "who", "which", "why", "how",
        "all", "each", "every", "both", "few", "more", "most", "other",
        "some", "such", "no", "nor", "not", "only", "own", "same", "so",
        "than", "too", "very", "can", "just", "should", "now", "i", "you",
        "your", "we", "our", "my", "me", "her", "him", "them", "their",
    }
)

# Deterministic ordering for building literal SQL / array expressions.
STOPWORDS_SORTED = tuple(sorted(STOPWORDS))
