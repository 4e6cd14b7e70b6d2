from es_indexer_spark.analysis.tokenizer import (
    code_tokenize_series,
    code_tokenizer_udf,
    shingle_series,
    shingle_udf,
    standard_tokenize_series,
    standard_tokenizer_udf,
    tokenize_one,
)

__all__ = [
    "code_tokenize_series",
    "code_tokenizer_udf",
    "shingle_series",
    "shingle_udf",
    "standard_tokenize_series",
    "standard_tokenizer_udf",
    "tokenize_one",
]
