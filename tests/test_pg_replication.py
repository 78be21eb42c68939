"""PG streaming-replication wire client (streaming/pg_replication.py):
LSN algebra, frame codecs against hand-built protocol vectors, and the
recorded-transport replay feeding the existing waljson DataSource —
r4 verdict item 5. ≈ postgres/publisher_replication.go:75 +
lsn_slot.go:128."""

from __future__ import annotations

import json
import struct

import pytest

from transferia_spark.streaming.pg_replication import (
    ReplicationTailer,
    create_slot_command,
    decode_copydata,
    decode_standby_status,
    encode_keepalive,
    encode_standby_status,
    encode_xlog_data,
    format_lsn,
    parse_lsn,
    start_replication_command,
)


def test_lsn_algebra_vectors():
    # pg_lsn textual form: hex high word / hex low word
    assert parse_lsn("0/16B374") == 0x16B374
    assert parse_lsn("1/0") == 1 << 32
    assert parse_lsn("A/2F") == (0xA << 32) | 0x2F
    assert format_lsn(0x16B374) == "0/16B374"
    assert format_lsn((0xA << 32) | 0x2F) == "A/2F"
    for v in (0, 7, 0x16B374, (5 << 32) | 123456):
        assert parse_lsn(format_lsn(v)) == v
    # ordering is plain integer ordering — the ack comparison the
    # reference's committed-LSN logic relies on
    assert parse_lsn("1/0") > parse_lsn("0/FFFFFFFF")


def test_replication_command_strings():
    assert (
        create_slot_command("s1") == "CREATE_REPLICATION_SLOT s1 LOGICAL wal2json"
    )
    assert "TEMPORARY" in create_slot_command("s1", temporary=True)
    cmd = start_replication_command(
        "s1", parse_lsn("0/16B374"),
        options={"format-version": "2", "include-lsn": "true"},
    )
    assert cmd == (
        "START_REPLICATION SLOT s1 LOGICAL 0/16B374 "
        "(\"format-version\" '2', \"include-lsn\" 'true')"
    )


def test_frame_codecs_round_trip_and_wire_layout():
    payload = b'{"action":"I"}'
    frame = encode_xlog_data(100, 150, payload, server_clock_us=42)
    # wire layout: 'w' + 3 big-endian int64s + payload
    assert frame[:1] == b"w"
    assert struct.unpack_from(">qqq", frame, 1) == (100, 150, 42)
    assert frame[25:] == payload
    x = decode_copydata(frame)
    assert (x.wal_start, x.wal_end, x.server_clock_us, x.payload) == (
        100, 150, 42, payload,
    )

    ka = encode_keepalive(777, reply_requested=True)
    assert ka[:1] == b"k" and len(ka) == 18
    k = decode_copydata(ka)
    assert k.wal_end == 777 and k.reply_requested

    st = encode_standby_status(10, 8, 8, clock_us=5, reply_requested=False)
    assert st[:1] == b"r" and len(st) == 34
    assert decode_standby_status(st) == (10, 8, 8, 5, False)


def _wal2json(action, lsn=None, **cols):
    doc = {"action": action,
           "columns": [{"name": k, "value": v} for k, v in cols.items()]}
    if lsn is not None:
        doc["lsn"] = lsn
    return json.dumps(doc).encode()


def test_tailer_recorded_transport_replay(tmp_path):
    """Recorded CopyBoth session → tailer writes the wal2json dir and
    acks flushed LSNs: the frame header's walStart overrides any payload
    lsn, keepalive reply requests trigger an honest (flushed-first)
    ack, close() acks the final position."""
    frames = [
        encode_xlog_data(10, 11, _wal2json("I", id=1, v="a")),
        encode_xlog_data(20, 21, _wal2json("U", lsn=999, id=1, v="b")),
        encode_keepalive(25, reply_requested=True),
        encode_xlog_data(30, 31, _wal2json("D", id=1)),
    ]
    acks = []
    out = str(tmp_path / "wal")
    tailer = ReplicationTailer(iter(frames), acks.append, out, lines_per_file=2)
    n = tailer.run()
    assert n == 3

    lines = []
    import os

    for name in sorted(os.listdir(out)):
        with open(os.path.join(out, name)) as f:
            lines += [json.loads(ln) for ln in f if ln.strip()]
    assert [ln["lsn"] for ln in lines] == [10, 20, 30]  # header wins
    assert [ln["action"] for ln in lines] == ["I", "U", "D"]

    decoded = [decode_standby_status(a) for a in acks]
    # keepalive-triggered ack: flushed == received at that point (25,
    # after flushing the two buffered lines); final ack: 31
    assert decoded[0][1] == 25 and decoded[-1][1] == 31
    for received, flushed, applied, _, _ in decoded:
        assert flushed <= received and applied == flushed


def test_tailer_feeds_existing_waljson_source(spark, tmp_path):
    """The wire client is a drop-in front for the existing slot-direct
    DataSource: replay a recorded session through the tailer, then read
    the directory with WalJsonStreamReader — rows, pre-images, and LSN
    offsets all flow exactly as with a file-produced slot log."""
    from transferia_spark.streaming.wal_source import (
        WalJsonDataSource,
        wal_output_schema,
    )

    frames = [
        encode_xlog_data(10, 11, _wal2json("I", id=1, v="a")),
        encode_xlog_data(20, 21, _wal2json("I", id=2, v="b")),
        encode_xlog_data(30, 31, _wal2json("U", id=2, v="b2")),
    ]
    out = str(tmp_path / "wal")
    ReplicationTailer(iter(frames), lambda b: None, out).run()

    spark.dataSource.register(WalJsonDataSource)
    got = []
    q = (
        spark.readStream.format("waljson")
        .schema(wal_output_schema("id int, v string"))
        .option("path", out)
        .load()
        .writeStream.foreachBatch(lambda df, _b: got.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert [(r.id, r.v, r._op, r._lsn) for r in sorted(got, key=lambda r: r._lsn)] == [
        (1, "a", "i", 10),
        (2, "b", "i", 20),
        (2, "b2", "u", 30),
    ]


def test_tailer_acks_only_after_fsync(tmp_path, monkeypatch):
    """r5 verdict item 2: the flushed LSN in a standby-status ack
    authorizes the server to TRIM the slot, so it must mean
    crash-durable — the data file is fsync'd before the rename, the
    directory entry after it, and only then does an ack carry the
    advanced watermark. Covered on the keepalive-reply path (the ack
    the server explicitly requests) and on close()."""
    import os as _os
    import stat as _stat

    events: list[tuple] = []
    real_fsync = _os.fsync

    def spy_fsync(fd):
        kind = "dir" if _stat.S_ISDIR(_os.fstat(fd).st_mode) else "file"
        events.append(("fsync", kind))
        return real_fsync(fd)

    monkeypatch.setattr(_os, "fsync", spy_fsync)

    def send(frame):
        events.append(("ack", decode_standby_status(frame)[1]))

    frames = [
        encode_xlog_data(10, 11, _wal2json("I", id=1, v="a")),
        encode_keepalive(15, reply_requested=True),
        encode_xlog_data(20, 21, _wal2json("I", id=2, v="b")),
    ]
    tailer = ReplicationTailer(
        iter(frames), send, str(tmp_path / "wal"), lines_per_file=100
    )
    tailer.run()

    acks = [e for e in events if e[0] == "ack"]
    # keepalive-requested ack flushed=15, close() ack flushed=21
    assert [a[1] for a in acks] == [15, 21]
    # before EACH advanced ack: data-file fsync, then directory fsync,
    # in that order, with no ack sneaking in between
    first_ack = events.index(("ack", 15))
    assert events[:first_ack] == [("fsync", "file"), ("fsync", "dir")]
    between = events[first_ack + 1 : events.index(("ack", 21))]
    assert between == [("fsync", "file"), ("fsync", "dir")]


def test_frame_codec_properties():
    """Hypothesis: XLogData / keepalive / standby-status frames and the
    LSN text form round-trip for arbitrary values."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from transferia_spark.streaming.pg_replication import (
        PrimaryKeepalive,
        XLogData,
    )

    lsn = st.integers(0, (1 << 63) - 1)

    @settings(max_examples=80, deadline=None)
    @given(lsn, lsn, st.integers(0, (1 << 62)), st.binary(max_size=128))
    def check_xlog(ws, we, clock, payload):
        m = decode_copydata(encode_xlog_data(ws, we, payload, clock))
        assert isinstance(m, XLogData)
        assert (m.wal_start, m.wal_end, m.server_clock_us, m.payload) == (
            ws, we, clock, payload,
        )

    @settings(max_examples=60, deadline=None)
    @given(lsn, st.integers(0, 1 << 62), st.booleans())
    def check_keepalive(we, clock, reply):
        m = decode_copydata(encode_keepalive(we, clock, reply))
        assert isinstance(m, PrimaryKeepalive)
        assert (m.wal_end, m.server_clock_us, m.reply_requested) == (
            we, clock, reply,
        )

    @settings(max_examples=60, deadline=None)
    @given(lsn, lsn, lsn, st.integers(0, 1 << 62), st.booleans())
    def check_status(r, f, a, clock, reply):
        assert decode_standby_status(
            encode_standby_status(r, f, a, clock, reply)
        ) == (r, f, a, clock, reply)

    @settings(max_examples=80, deadline=None)
    @given(lsn)
    def check_lsn_text(v):
        assert parse_lsn(format_lsn(v)) == v

    check_xlog()
    check_keepalive()
    check_status()
    check_lsn_text()


def test_message_stream_framing_and_errors(tmp_path):
    """The PG backend message layer: CopyBothResponse consumed, CopyData
    payloads yielded, CopyDone ends, ErrorResponse raises with parsed
    fields — and the framed stream drives the tailer end-to-end with
    CopyData-wrapped standby acks."""
    import io
    import struct as _struct

    from transferia_spark.streaming.pg_replication import (
        PgServerError,
        encode_copydata_message,
        message_stream,
    )

    def msg(tag, body=b""):
        return tag + _struct.pack(">I", len(body) + 4) + body

    x1 = encode_xlog_data(10, 11, _wal2json("I", id=1, v="a"))
    k1 = encode_keepalive(15, reply_requested=True)
    wire = (
        msg(b"W", b"\x00\x00\x00")
        + encode_copydata_message(x1)
        + encode_copydata_message(k1)
        + msg(b"c")
    )
    buf = io.BytesIO(wire)
    frames = list(message_stream(buf.read))
    assert frames == [x1, k1]

    # ErrorResponse: parsed severity/code/message
    err_body = b"SERROR\x00C42601\x00Msyntax error\x00\x00"
    buf = io.BytesIO(msg(b"E", err_body))
    with pytest.raises(PgServerError, match="ERROR 42601: syntax error"):
        list(message_stream(buf.read))

    # socket→tailer: acks travel back as CopyData-wrapped 'r' frames
    sent: list[bytes] = []
    buf = io.BytesIO(
        msg(b"W", b"\x00\x00\x00")
        + encode_copydata_message(x1)
        + encode_copydata_message(k1)
        + msg(b"Z", b"I")
    )
    out = str(tmp_path / "wal")
    tailer = ReplicationTailer(
        message_stream(buf.read),
        lambda p: sent.append(encode_copydata_message(p)),
        out,
    )
    assert tailer.run() == 1
    assert all(m[:1] == b"d" for m in sent)
    inner = sent[-1][5:]  # strip CopyData tag + length
    assert decode_standby_status(inner)[1] == 15  # flushed advanced
