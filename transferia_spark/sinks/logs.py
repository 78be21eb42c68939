"""Log-API sinks: Datadog and Coralogix (insert-only observability
targets).

≈ transferia/transferia ``pkg/providers/datadog/sink.go`` and
``pkg/providers/coralogix/sink.go`` — both share one shape: keep ONLY
insert items (other kinds are logged and dropped, sink.go:52), render
a per-row message from a column template, split each table's batch
into ``chunk_size`` pieces, and POST each chunk with retry; a 403 is
fatal, not retryable. Datadog items carry
``{ddsource: fqtn, ddtags: tag:val pairs, hostname, service, message}``
(``mapChanges:90-126``); Coralogix entries carry
``{applicationName, subsystemName, severity, timestamp, text}``.

Spark-first: item construction is planned as ONE ``to_json(struct)``
Column — template rendering, tag assembly, column picks all happen
JVM-side — so executors only group prepared strings into chunks and
POST per partition (executor→endpoint, never through the driver). The
transport is stdlib urllib, driven in tests by a recording HTTP stub
(same pattern as the search and ClickHouse sinks).

Message templates use ``{column}`` placeholders (the public analog of
the reference's Go text/template over the row map).
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from transferia_spark.cdc.changeitem import OP_COL, OP_INSERT
from transferia_spark.schema.colschema import TableID
from transferia_spark.sinks.base import Sink, register_sink

_PLACEHOLDER = re.compile(r"\{([A-Za-z0-9_]+)\}")


def render_template(template: str) -> Column:
    """``"user {user_id} spent {value}"`` → a concat Column. NULLs
    render as empty strings (concat_ws semantics), matching the Go
    template's missing-key behavior closely enough for log text."""
    parts: list[Column] = []
    pos = 0
    for m in _PLACEHOLDER.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos : m.start()]))
        parts.append(F.coalesce(F.col(m.group(1)).cast("string"), F.lit("")))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    return F.concat(*parts) if parts else F.lit(template)


def datadog_item(
    table: TableID,
    message_template: str,
    tag_columns: list[str],
    host_column: str | None = None,
    service_column: str | None = None,
) -> Column:
    """One HTTPLogItem as a JSON string (``mapChanges:90``): ddsource =
    the fqtn, ddtags = ``col:value`` pairs joined by commas."""
    tags = F.concat_ws(
        ",",
        *[
            F.concat(F.lit(f"{c}:"), F.coalesce(F.col(c).cast("string"), F.lit("")))
            for c in tag_columns
        ],
    )
    fields = [
        F.lit(f'"{table.namespace}"."{table.name}"').alias("ddsource"),
        tags.alias("ddtags"),
        render_template(message_template).alias("message"),
    ]
    if host_column:
        fields.append(F.col(host_column).cast("string").alias("hostname"))
    if service_column:
        fields.append(F.col(service_column).cast("string").alias("service"))
    return F.to_json(F.struct(*fields))


def coralogix_entry(
    application: str,
    subsystem: str,
    message_template: str,
    ts_column: str | None = None,
    severity: int = 3,
) -> Column:
    """One Coralogix 'singles' entry as a JSON string."""
    fields = [
        F.lit(application).alias("applicationName"),
        F.lit(subsystem).alias("subsystemName"),
        F.lit(severity).alias("severity"),
        render_template(message_template).alias("text"),
    ]
    if ts_column:
        fields.append(
            (F.col(ts_column).cast("timestamp").cast("double") * 1000)
            .cast("long")
            .alias("timestamp")
        )
    return F.to_json(F.struct(*fields))


class LogHttpClient:
    """Minimal JSON-POST client (stdlib only). 403 raises FatalPush —
    the reference's non-retryable class."""

    def __init__(self, url: str, headers: dict[str, str], timeout: int = 60):
        self.url = url
        self.headers = headers
        self.timeout = timeout

    def post(self, body: bytes) -> bytes:
        import urllib.error
        import urllib.request

        req = urllib.request.Request(self.url, data=body, method="POST")
        req.add_header("Content-Type", "application/json")
        for k, v in self.headers.items():
            req.add_header(k, v)
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return resp.read()
        except urllib.error.HTTPError as e:
            if e.code == 403:
                raise FatalPushError("403 Forbidden from log API") from e
            raise


class FatalPushError(RuntimeError):
    """Non-retryable push failure (≈ ``FatalErrors`` set, sink.go:38)."""


class _LogApiSink(Sink):
    """Shared shape: insert-only, planned JSON items, chunked POSTs."""

    def __init__(
        self,
        url: str,
        headers: dict[str, str],
        chunk_size: int = 1000,
        client_factory: Callable[..., LogHttpClient] = LogHttpClient,
    ):
        self.url = url
        self.headers = headers
        self.chunk_size = chunk_size
        self.client_factory = client_factory

    def item_column(self, df: DataFrame, table: TableID) -> Column:
        raise NotImplementedError

    def plan_items(self, df: DataFrame, table: TableID) -> DataFrame:
        """Insert rows only (the reference warns-and-drops the rest) →
        one prepared JSON string per row."""
        if OP_COL in df.columns:
            df = df.filter(F.col(OP_COL) == OP_INSERT)
        return df.select(self.item_column(df, table).alias("item"))

    def write(self, df: DataFrame, table: TableID, keys: list[str] | None = None) -> None:
        items = self.plan_items(df, table)
        url, headers = self.url, self.headers
        chunk, factory = self.chunk_size, self.client_factory

        def push(rows):
            client = factory(url, headers)
            buf: list[str] = []
            for r in rows:
                buf.append(r.item)
                if len(buf) >= chunk:
                    client.post(("[" + ",".join(buf) + "]").encode())
                    buf.clear()
            if buf:
                client.post(("[" + ",".join(buf) + "]").encode())

        items.foreachPartition(push)


@register_sink
class DatadogSink(_LogApiSink):
    TYPE = "datadog"

    def __init__(
        self,
        url: str,
        api_key: str,
        message_template: str,
        tag_columns: list[str] | None = None,
        host_column: str | None = None,
        service_column: str | None = None,
        chunk_size: int = 1000,
        client_factory: Callable[..., LogHttpClient] = LogHttpClient,
    ):
        super().__init__(
            url, {"DD-API-KEY": api_key}, chunk_size, client_factory
        )
        self.message_template = message_template
        self.tag_columns = tag_columns or []
        self.host_column = host_column
        self.service_column = service_column

    def item_column(self, df: DataFrame, table: TableID) -> Column:
        return datadog_item(
            table,
            self.message_template,
            self.tag_columns,
            self.host_column,
            self.service_column,
        )


@register_sink
class CoralogixSink(_LogApiSink):
    TYPE = "coralogix"

    def __init__(
        self,
        url: str,
        private_key: str,
        application: str,
        subsystem: str,
        message_template: str,
        ts_column: str | None = None,
        severity: int = 3,
        chunk_size: int = 1000,
        client_factory: Callable[..., LogHttpClient] = LogHttpClient,
    ):
        super().__init__(
            url, {"Authorization": f"Bearer {private_key}"}, chunk_size, client_factory
        )
        self.application = application
        self.subsystem = subsystem
        self.message_template = message_template
        self.ts_column = ts_column
        self.severity = severity

    def item_column(self, df: DataFrame, table: TableID) -> Column:
        return coralogix_entry(
            self.application,
            self.subsystem,
            self.message_template,
            self.ts_column,
            self.severity,
        )


__all__ = [
    "DatadogSink",
    "CoralogixSink",
    "LogHttpClient",
    "FatalPushError",
    "render_template",
    "datadog_item",
    "coralogix_entry",
]
