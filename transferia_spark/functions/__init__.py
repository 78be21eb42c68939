"""Scalar/vector function library shared by operators and oracles."""

from transferia_spark.functions.portable import (  # noqa: F401
    band_keys,
    cosine,
    floor_bp,
    hyperplane_bucket,
    minhash_signature,
    pt_hash,
    shingles,
    sql_band_keys,
    sql_cosine,
    sql_floor_bp,
    sql_hyperplane_bucket,
    sql_minhash_signature,
    sql_pt_hash,
    sql_shingles,
    sql_vec_dot,
    sql_vec_norm2,
    sql_words,
    vec_dot,
    vec_norm2,
    words,
)
