"""Parsers: bytes → rows (SURVEY §2.6, queue-source surface).

≈ ``pkg/parsers/registry/{json,tskv,debezium,...}`` and the core
``GenericParser`` (``pkg/parsers/generic/generic_parser.go`` in
transferia/transferia). Every parser takes a raw-message DataFrame with
Kafka-shaped columns (key binary, value binary, topic, partition,
offset, timestamp) and returns typed rows plus:

- aux system columns ``_timestamp/_partition/_offset/_idx``
  (≈ generic_parser.go:115-166)
- a ``_rest`` overflow column for fields not in the declared schema
- unparsed rows dead-lettered with the raw payload + error
  (≈ NewUnparsed, generic_parser.go:575 → ``<table>_unparsed``)

All parsing is JVM-side (`from_json`, `str_to_map`) — no Python UDFs.
"""

from transferia_spark.parsers.registry import (  # noqa: F401
    build_parser,
    debezium_parser,
    json_parser,
    raw_parser,
    register_parser,
    tskv_parser,
)
