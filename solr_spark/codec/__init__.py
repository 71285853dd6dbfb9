from solr_spark.codec.smallfloat import int4_to_long, int_to_byte4, norm_length_table
from solr_spark.codec.varint import (
    decode_postings,
    encode_postings,
    varint_decode,
    varint_encode,
)

__all__ = [
    "int4_to_long",
    "int_to_byte4",
    "norm_length_table",
    "varint_decode",
    "varint_encode",
    "encode_postings",
    "decode_postings",
]
