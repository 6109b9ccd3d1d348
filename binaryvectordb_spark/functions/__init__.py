from binaryvectordb_spark.functions.vector import (  # noqa: F401
    NUM_LANES,
    binary_dot,
    cosine,
    dot,
    hamming,
    int8_cosine,
    int8_quantize,
    norm,
    pack_bits,
    popcount_vec,
)
