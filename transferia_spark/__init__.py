"""transferia_spark — a PySpark-native data-movement & analytics engine.

Re-expresses the capabilities of the reference EL(T) engine
(transferia/transferia, Go) on top of Apache Spark: snapshot scans,
streaming replication (CDC), a chain of stateless transformers, sinks,
parsers/serializers — plus the large-scale training-data operators
(dedup, similarity search, text analysis, multimodal plumbing) a 100 TB
pipeline needs.

Architecture is Spark-first: logical plans are declared with the
DataFrame / Spark SQL API and optimized by Catalyst; Python touches data
only through Arrow-vectorized Pandas UDFs on genuinely non-relational
operators.
"""

__version__ = "0.1.0"

from transferia_spark.session import get_spark  # noqa: F401
