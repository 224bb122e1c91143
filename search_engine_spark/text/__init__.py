from search_engine_spark.text.stopwords import STOPWORDS
from search_engine_spark.text.porter import porter_stem
from search_engine_spark.text.tokenizer import tokenize_py, tokens_col, stem_terms_udf
from search_engine_spark.text.extract import extract_content

__all__ = [
    "STOPWORDS",
    "porter_stem",
    "tokenize_py",
    "tokens_col",
    "stem_terms_udf",
    "extract_content",
]
