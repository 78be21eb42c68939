from transferia_spark.schema.colschema import ColSchema, TableSchema, TableID  # noqa: F401
from transferia_spark.schema.typesystem import (  # noqa: F401
    yt_to_spark,
    spark_to_yt,
    strictify,
    apply_fallbacks,
    LATEST_TYPESYSTEM_VERSION,
)
