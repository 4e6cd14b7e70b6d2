from es_indexer_spark.index.codec import (
    decode_varints,
    delta_decode,
    delta_encode,
    encode_varints,
)

__all__ = ["encode_varints", "decode_varints", "delta_encode", "delta_decode"]
