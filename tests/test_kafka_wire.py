"""Pure-Python Kafka wire protocol (sinks/kafka_wire.py): CRC-32C and
murmur2 against published vectors, RecordBatch v2 round-trip, Produce
frame layout, and the sink's wire-engine end-to-end with a recorded
transport (no broker in this container)."""

from __future__ import annotations

import json
import struct
import tempfile

import pytest
from hypothesis import given, settings, strategies as st

from transferia_spark.schema.colschema import TableID
from transferia_spark.sinks.base import build_sink
from transferia_spark.sinks.kafka_wire import (
    crc32c,
    decode_record_batch,
    encode_metadata_request,
    encode_produce_request,
    encode_record_batch,
    murmur2,
    partition_for,
)


def test_crc32c_published_vector():
    # the check-value every CRC-32C implementation must produce
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


def test_murmur2_matches_java_client_vectors():
    # org.apache.kafka.common.utils.UtilsTest.testMurmur2 (sign-extended
    # in Java; masked to uint32 here)
    vectors = {
        b"21": -973932308,
        b"foobar": -790332482,
        b"a-little-bit-long-string": -985981536,
        b"": 275646681,
    }
    for k, want in vectors.items():
        assert murmur2(k) == want & 0xFFFFFFFF
    assert partition_for(b"foobar", 16) == (murmur2(b"foobar") & 0x7FFFFFFF) % 16
    assert partition_for(None, 16, fallback=5) == 5


def test_record_batch_round_trip():
    records = [
        (b"k1", b"v1"),
        (None, b"null-key"),
        (b"k3", None),
    ]
    headers = [[("h", b"x")], [], []]
    batch = encode_record_batch(
        records, base_offset=7, base_timestamp=1234,
        headers_per_record=headers,
    )
    out = decode_record_batch(batch)
    assert out["base_offset"] == 7
    assert out["last_offset_delta"] == 2
    assert [(r["key"], r["value"]) for r in out["records"]] == records
    assert [r["offset"] for r in out["records"]] == [7, 8, 9]
    assert out["records"][0]["headers"] == [("h", b"x")]
    assert all(r["timestamp"] == 1234 for r in out["records"])

    # corruption is detected by the CRC
    corrupt = bytearray(batch)
    corrupt[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_record_batch(bytes(corrupt))


@settings(max_examples=50, deadline=None)
@given(
    recs=st.lists(
        st.tuples(
            st.one_of(st.none(), st.binary(max_size=20)),
            st.one_of(st.none(), st.binary(max_size=40)),
        ),
        min_size=1,
        max_size=10,
    )
)
def test_record_batch_round_trip_property(recs):
    out = decode_record_batch(encode_record_batch(recs))
    assert [(r["key"], r["value"]) for r in out["records"]] == recs


def test_produce_request_frame_layout():
    batch = encode_record_batch([(b"k", b"v")])
    frame = encode_produce_request(
        "events", {0: batch}, acks=-1, timeout_ms=1000, correlation_id=42
    )
    # int32 length prefix covers the rest
    (length,) = struct.unpack_from(">i", frame, 0)
    assert length == len(frame) - 4
    # header: api_key=0 (Produce), api_version=3, correlation_id
    assert struct.unpack_from(">hhi", frame, 4) == (0, 3, 42)
    # the record batch is embedded verbatim
    assert batch in frame
    meta = encode_metadata_request(["events"], correlation_id=1)
    assert struct.unpack_from(">hhi", meta, 4) == (3, 1, 1)
    assert b"events" in meta


def _file_transport(path: str):
    def transport(frame: bytes) -> None:
        with open(path, "a") as f:
            f.write(json.dumps({"frame": frame.hex()}) + "\n")

    return transport


def test_sink_wire_engine_end_to_end(spark):
    """Without the jar, a transport-equipped sink encodes rows into
    Produce frames whose batches decode back to the exact (key, value)
    set, partitioned by murmur2(key)."""
    with tempfile.NamedTemporaryFile(suffix=".jsonl") as tf:
        sink = build_sink(
            "kafka",
            bootstrap_servers="b:9092",
            num_partitions=4,
            transport=_file_transport(tf.name),
        )
        df = spark.createDataFrame(
            [(f"k{i}", f"payload-{i}") for i in range(20)],
            "key string, value string",
        )
        sink.write(df, TableID("", "events"))

        frames = [
            bytes.fromhex(json.loads(line)["frame"])
            for line in open(tf.name)
            if line.strip()
        ]
        assert frames
        got = {}
        for frame in frames:
            # header(api 0 v3) then skip to the single record batch:
            # locate by the magic-v2 layout via the embedded batch we
            # can decode from the partition_data section
            assert struct.unpack_from(">hh", frame, 4)[0] == 0  # Produce
            # walk: len(4) hdr(8) client_id txn_id acks+timeout topic...
            # simpler: scan for the batch by trying every offset
            decoded = None
            for off in range(len(frame) - 61):
                try:
                    decoded = decode_record_batch(frame[off:])
                    break
                except Exception:
                    continue
            assert decoded is not None, "no valid record batch in frame"
            # partition id sits 8 bytes before the int32 batch-size
            # prefix which precedes the batch
            part = struct.unpack_from(">i", frame, off - 8)[0]
            for r in decoded["records"]:
                got[r["key"].decode()] = (r["value"].decode(), part)
        assert {k: v[0] for k, v in got.items()} == {
            f"k{i}": f"payload-{i}" for i in range(20)
        }
        # partition assignment is the stock murmur2 rule
        for k, (_, part) in got.items():
            assert part == partition_for(k.encode(), 4)


def test_sink_wire_engine_requires_value_column(spark):
    """ADVICE r4: a frame without a 'value' column is a contract error —
    never guess cols[0] (it could silently ship the key as the payload)."""
    sink = build_sink(
        "kafka",
        bootstrap_servers="b:9092",
        transport=lambda frame: None,
    )
    df = spark.createDataFrame([("k", "v")], "key string, payload string")
    with pytest.raises(ValueError, match="'value' column"):
        sink.write(df, TableID("", "t"))


def test_sink_without_jar_or_transport_raises_with_both_remedies(spark):
    sink = build_sink("kafka", bootstrap_servers="b:9092")
    df = spark.createDataFrame([("k", "v")], "key string, value string")
    with pytest.raises(NotImplementedError, match="spark-sql-kafka.*transport"):
        sink.write(df, TableID("", "t"))
