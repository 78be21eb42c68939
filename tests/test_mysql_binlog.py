"""MySQL binlog wire client (streaming/mysql_binlog.py): lenenc and
GTID-set algebra, frame codecs against hand-built vectors, CRC
verification, the tailer feeding the existing binlogjson DataSource,
and the replicate verb on a recorded wire session — r5 verdict item 4.
≈ mysql/canal.go + source.go:35 + utils.go:204."""

from __future__ import annotations

import json
import os
import pytest

from transferia_spark.streaming.mysql_binlog import (
    DELETE_ROWS_EVENT_V2,
    TYPE_BLOB,
    TYPE_DOUBLE,
    TYPE_LONG,
    TYPE_LONGLONG,
    TYPE_VARCHAR,
    UPDATE_ROWS_EVENT_V2,
    WRITE_ROWS_EVENT_V2,
    BinlogTailer,
    decode_gtid,
    decode_header,
    decode_lenenc,
    decode_query,
    decode_rows_event,
    decode_table_map,
    drain_recorded_binlog,
    encode_format_description,
    encode_gtid,
    encode_lenenc,
    encode_query,
    encode_rotate,
    encode_rows_event,
    encode_table_map,
    encode_xid,
    format_gtid_set,
    gtid_set_add,
    gtid_set_contains,
    parse_gtid_set,
)

SID = "3e11fa47-71ca-11e1-9e33-c80aa9429562"


def test_lenenc_vectors():
    # wire-layout vectors from the public protocol docs
    assert encode_lenenc(0) == b"\x00"
    assert encode_lenenc(250) == b"\xfa"
    assert encode_lenenc(251) == b"\xfc\xfb\x00"
    assert encode_lenenc(65535) == b"\xfc\xff\xff"
    assert encode_lenenc(65536) == b"\xfd\x00\x00\x01"
    assert encode_lenenc(1 << 24) == b"\xfe" + (1 << 24).to_bytes(8, "little")
    for n in (0, 1, 250, 251, 65535, 65536, (1 << 24) + 7, 1 << 33):
        buf = encode_lenenc(n) + b"tail"
        v, pos = decode_lenenc(buf, 0)
        assert v == n and buf[pos:] == b"tail"


def test_gtid_set_algebra():
    s = parse_gtid_set(f"{SID}:1-5:7, aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee:3")
    assert s[SID] == [[1, 5], [7, 7]]
    gtid_set_add(s, SID, 6)  # bridges 1-5 and 7
    assert s[SID] == [[1, 7]]
    gtid_set_add(s, SID, 9)
    assert format_gtid_set(s) == (
        f"{SID}:1-7:9,aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee:3"
    )
    assert gtid_set_contains(s, SID, 7) and not gtid_set_contains(s, SID, 8)
    assert parse_gtid_set(format_gtid_set(s)) == s
    with pytest.raises(ValueError, match="not a GTID set"):
        parse_gtid_set("no-colons-here")


def test_header_and_crc_vectors():
    ev = encode_rotate("binlog.000002", checksum=True)
    hdr = decode_header(ev)
    assert hdr.type_code == 0x04 and hdr.event_size == len(ev)
    # truncated frame: loud
    with pytest.raises(ValueError, match="does not match frame length"):
        decode_header(ev[:-1])
    # corrupt payload: the CRC check must catch it
    t = BinlogTailer(iter([]), "/tmp/unused_mysql_tailer")
    t.checksum = True
    bad = ev[:25] + bytes([ev[25] ^ 0xFF]) + ev[26:]
    with pytest.raises(ValueError, match="CRC mismatch"):
        t._strip(bad)
    assert t._strip(ev) == ev[:-4]


def test_gtid_event_round_trip():
    ev = encode_gtid(SID, 42, log_pos=500, checksum=False)
    sid, gno = decode_gtid(ev[19:])
    assert sid == SID and gno == 42


def test_table_map_round_trip_names_and_signedness():
    ev = encode_table_map(
        7, "shop", "items",
        [TYPE_LONGLONG, TYPE_VARCHAR, TYPE_DOUBLE, TYPE_LONG],
        [None, 300, 8, None],
        col_names=["id", "v", "price", "qty"],
        unsigned=[False, False, False, True],
        checksum=False,
    )
    tid, tm = decode_table_map(ev[19:])
    assert tid == 7
    assert (tm.schema, tm.table) == ("shop", "items")
    assert tm.col_types == [TYPE_LONGLONG, TYPE_VARCHAR, TYPE_DOUBLE, TYPE_LONG]
    assert tm.col_metas == [None, 300, 8, None]
    assert tm.col_names == ["id", "v", "price", "qty"]
    assert tm.unsigned == [False, False, False, True]


def test_rows_events_round_trip_with_nulls_and_types():
    types = [TYPE_LONGLONG, TYPE_VARCHAR, TYPE_DOUBLE, TYPE_BLOB]
    metas = [None, 40, 8, 2]
    _, tm = decode_table_map(encode_table_map(
        9, "db", "t", types, metas, col_names=["id", "v", "x", "b"],
        checksum=False,
    )[19:])
    w = encode_rows_event(
        WRITE_ROWS_EVENT_V2, 9, types, metas,
        [[1, "héllo", 2.5, b"\x01\x02"], [2, None, -0.5, None]],
        checksum=False,
    )
    rows = decode_rows_event(WRITE_ROWS_EVENT_V2, w[19:], tm)
    assert rows == [
        {"after": {"id": 1, "v": "héllo", "x": 2.5, "b": b"\x01\x02"}},
        {"after": {"id": 2, "v": None, "x": -0.5, "b": None}},
    ]
    u = encode_rows_event(
        UPDATE_ROWS_EVENT_V2, 9, types, metas,
        [([1, "a", 1.0, b""], [1, "a2", 1.5, b"z"])],
        checksum=False,
    )
    rows = decode_rows_event(UPDATE_ROWS_EVENT_V2, u[19:], tm)
    assert rows == [{
        "before": {"id": 1, "v": "a", "x": 1.0, "b": b""},
        "after": {"id": 1, "v": "a2", "x": 1.5, "b": b"z"},
    }]
    d = encode_rows_event(
        DELETE_ROWS_EVENT_V2, 9, types, metas, [[2, "gone", 0.0, b""]],
        checksum=False,
    )
    rows = decode_rows_event(DELETE_ROWS_EVENT_V2, d[19:], tm)
    assert rows == [{"before": {"id": 2, "v": "gone", "x": 0.0, "b": b""}}]
    # signed negative ints survive (LE two's complement)
    neg = encode_rows_event(
        WRITE_ROWS_EVENT_V2, 9, [TYPE_LONG], [None], [[-12345]],
        checksum=False,
    )
    _, tm2 = decode_table_map(encode_table_map(
        9, "db", "t", [TYPE_LONG], [None], col_names=["n"], checksum=False,
    )[19:])
    assert decode_rows_event(WRITE_ROWS_EVENT_V2, neg[19:], tm2) == [
        {"after": {"n": -12345}}
    ]


def test_query_event_classification():
    schema, q = decode_query(
        encode_query("TRUNCATE TABLE items", schema="shop", checksum=False)[19:]
    )
    assert (schema, q) == ("shop", "TRUNCATE TABLE items")


def _session_frames(checksum=True):
    """One coherent recorded session: FDE, ROTATE, GTID, TABLE_MAP,
    rows, a TRUNCATE and a DDL statement."""
    types = [TYPE_LONGLONG, TYPE_VARCHAR]
    metas = [None, 40]
    return [
        encode_format_description(checksum=checksum),
        encode_rotate("binlog.000002", checksum=checksum),
        encode_gtid(SID, 1, log_pos=110, checksum=checksum),
        encode_table_map(5, "shop", "items", types, metas,
                         col_names=["id", "v"], log_pos=120, checksum=checksum),
        encode_rows_event(WRITE_ROWS_EVENT_V2, 5, types, metas,
                          [[1, "a"], [2, "b"]], log_pos=130, checksum=checksum),
        encode_rows_event(UPDATE_ROWS_EVENT_V2, 5, types, metas,
                          [([2, "b"], [2, "b2"])], log_pos=140,
                          checksum=checksum),
        encode_query("TRUNCATE TABLE items", schema="shop", log_pos=150,
                     checksum=checksum),
        encode_rows_event(WRITE_ROWS_EVENT_V2, 5, types, metas,
                          [[3, "c"]], log_pos=160, checksum=checksum),
        encode_query("ALTER TABLE items ADD COLUMN w text", schema="shop",
                     log_pos=170, checksum=checksum),
        encode_rows_event(DELETE_ROWS_EVENT_V2, 5, types, metas,
                          [[3, "c"]], log_pos=180, checksum=checksum),
        # commit marker: the executed GTID set advances HERE, not at
        # the GTID event (a mid-transaction drain must not skip rows
        # on resume)
        encode_xid(log_pos=190, checksum=checksum),
    ]


def test_tailer_session_to_binlog_json(tmp_path):
    out = str(tmp_path / "binlog")
    tailer = BinlogTailer(iter(_session_frames()), out)
    n = tailer.run()
    assert n == 7  # 3 inserts + 1 update + 1 delete + truncate + ddl
    lines = []
    for name in sorted(os.listdir(out)):
        if name.endswith(".jsonl"):
            with open(os.path.join(out, name)) as f:
                lines += [json.loads(ln) for ln in f if ln.strip()]
    assert [
        (ln["action"], ln["log_file"], ln["log_pos"]) for ln in lines
    ] == [
        ("insert", "binlog.000002", 130),
        ("insert", "binlog.000002", 130),
        ("update", "binlog.000002", 140),
        ("truncate", "binlog.000002", 150),
        ("insert", "binlog.000002", 160),
        ("ddl", "binlog.000002", 170),
        ("delete", "binlog.000002", 180),
    ]
    by_action = {}
    for ln in lines:
        by_action.setdefault(ln["action"], []).append(ln)
    assert by_action["insert"][0]["after"] == {"id": 1, "v": "a"}
    assert by_action["insert"][0]["row_idx"] == 0
    assert by_action["insert"][1]["after"] == {"id": 2, "v": "b"}
    assert by_action["insert"][1]["row_idx"] == 1
    assert by_action["update"][0]["before"] == {"id": 2, "v": "b"}
    assert by_action["update"][0]["after"] == {"id": 2, "v": "b2"}
    assert by_action["truncate"][0]["table"] == "items"
    assert by_action["ddl"][0]["query"].startswith("ALTER TABLE items")
    assert by_action["delete"][0]["before"] == {"id": 3, "v": "c"}
    assert all(ln["schema"] == "shop" for ln in lines if "schema" in ln)
    # the GTID of the session's transaction landed in the executed set
    assert gtid_set_contains(tailer.gtid_executed, SID, 1)


def test_drain_recorded_binlog_incremental(tmp_path):
    frames_dir = str(tmp_path / "frames")
    out = str(tmp_path / "out")
    os.makedirs(frames_dir)
    frames = _session_frames()
    with open(os.path.join(frames_dir, "000.jsonl"), "w") as f:
        for fr in frames[:5]:
            f.write(json.dumps({"frame": fr.hex()}) + "\n")
    n1 = drain_recorded_binlog(frames_dir, out)
    assert n1 == 2  # the two insert rows
    # same captures again: nothing new
    assert drain_recorded_binlog(frames_dir, out) == 0
    # a new capture file arrives — only IT is decoded. It must restate
    # the session prologue (FDE/ROTATE/TABLE_MAP), as a reconnecting
    # live client would re-receive it.
    with open(os.path.join(frames_dir, "001.jsonl"), "w") as f:
        for fr in frames[:4] + frames[5:6]:
            f.write(json.dumps({"frame": fr.hex()}) + "\n")
    assert drain_recorded_binlog(frames_dir, out) == 1  # the update row


def test_tailer_feeds_binlogjson_source(spark, tmp_path):
    """The wire client is a drop-in front for the existing binlogjson
    DataSource: decoded captures stream as ChangeItems with the
    mysql LSN algebra (file index × 10^12 + position)."""
    out = str(tmp_path / "binlog")
    BinlogTailer(iter(_session_frames()), out).run()

    from transferia_spark.streaming.cdc_sources import (
        BinlogJsonStreamReader,
        binlog_output_schema,
    )

    reader = BinlogJsonStreamReader(
        binlog_output_schema("id long, v string"), {"path": out}
    )
    start = reader.initialOffset()
    end = reader.latestOffset()
    assert end == {"lsn": 2 * 10**12 + 180}
    rows = []
    for part in reader.partitions(start, end):
        rows += list(reader._read_tuples(part))
    # (id, v, _op, _lsn)
    assert [(r[0], r[1], r[2], r[3]) for r in rows] == [
        (1, "a", "i", 2 * 10**12 + 130),
        (2, "b", "i", 2 * 10**12 + 130),
        (2, "b2", "u", 2 * 10**12 + 140),
        (3, "c", "i", 2 * 10**12 + 160),
        (3, "c", "d", 2 * 10**12 + 180),
    ]


@pytest.mark.slow
def test_replicate_verb_on_recorded_mysql_wire_session(spark, tmp_path):
    """End-to-end mirror of the pgwire test: transfer.yaml with a
    mysqlwire source drains the recorded binlog wire captures and
    replicates through the verb — snapshot seed, then catch-up applies
    the decoded row events from the Spark checkpoint."""
    from transferia_spark.plans.config import transfer_from_yaml
    from transferia_spark.tasks.replicate import run_replication

    src = str(tmp_path / "items.parquet")
    frames_dir = str(tmp_path / "frames")
    binlog = str(tmp_path / "binlog")
    target = str(tmp_path / "target")
    state = str(tmp_path / "state")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string"
    ).coalesce(1).write.parquet(src)
    os.makedirs(frames_dir)
    spec = transfer_from_yaml(f"""
type: SNAPSHOT_AND_INCREMENT
src: {{type: file, params: {{path: {src}, format: parquet}}}}
dst: {{type: file, params: {{path: {tmp_path}/unused, format: parquet}}}}
replication:
  source:
    format: mysqlwire
    frames_path: {frames_dir}
    path: {binlog}
    schema: "id long, v string"
  target: {{kind: bucketed, root: {target}, keys: [id], n_buckets: 4}}
""")
    run_replication(spark, spec, state_dir=state, once=True, retry_interval=0.0)

    types = [TYPE_LONGLONG, TYPE_VARCHAR]
    metas = [None, 40]
    frames = [
        encode_format_description(),
        encode_rotate("binlog.000003"),
        encode_table_map(5, "shop", "items", types, metas,
                         col_names=["id", "v"], log_pos=50),
        encode_rows_event(WRITE_ROWS_EVENT_V2, 5, types, metas,
                          [[3, "c"]], log_pos=60),
        encode_rows_event(UPDATE_ROWS_EVENT_V2, 5, types, metas,
                          [([2, "b"], [2, "b2"])], log_pos=70),
        encode_rows_event(DELETE_ROWS_EVENT_V2, 5, types, metas,
                          [[1, "a"]], log_pos=80),
    ]
    with open(os.path.join(frames_dir, "000.jsonl"), "w") as f:
        for fr in frames:
            f.write(json.dumps({"frame": fr.hex()}) + "\n")
    run_replication(spark, spec, state_dir=state, once=True, retry_interval=0.0)

    from transferia_spark.streaming.bucketed_table import BucketedParquetTable

    table = BucketedParquetTable(spark, target, keys=["id"], n_buckets=4)
    assert {(r.id, r.v) for r in table.read().collect()} == {
        (2, "b2"), (3, "c"),
    }


@pytest.mark.slow
def test_replicate_mysqlwire_truncate_controls_through_verb(spark, tmp_path):
    """Wire composition: a recorded binlog session whose QUERY event is
    a TRUNCATE, with replication.controls enabled — the tailer decodes
    it into a truncate control line, the binlogjson reader emits the
    control ChangeItem, and ControlRouter wipes the target before the
    post-truncate rows apply."""
    from transferia_spark.plans.config import transfer_from_yaml
    from transferia_spark.tasks.replicate import run_replication

    src = str(tmp_path / "items.parquet")
    frames_dir = str(tmp_path / "frames")
    binlog = str(tmp_path / "binlog")
    target = str(tmp_path / "target")
    state = str(tmp_path / "state")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string"
    ).coalesce(1).write.parquet(src)
    os.makedirs(frames_dir)
    spec = transfer_from_yaml(f"""
type: SNAPSHOT_AND_INCREMENT
src: {{type: file, params: {{path: {src}, format: parquet}}}}
dst: {{type: file, params: {{path: {tmp_path}/unused, format: parquet}}}}
replication:
  source:
    format: mysqlwire
    frames_path: {frames_dir}
    path: {binlog}
    schema: "id long, v string"
  target: {{kind: bucketed, root: {target}, keys: [id], n_buckets: 4}}
  controls: {{enabled: true}}
""")
    run_replication(spark, spec, state_dir=state, once=True, retry_interval=0.0)

    types = [TYPE_LONGLONG, TYPE_VARCHAR]
    metas = [None, 40]
    frames = [
        encode_format_description(),
        encode_rotate("binlog.000004"),
        encode_table_map(5, "shop", "items", types, metas,
                         col_names=["id", "v"], log_pos=50),
        encode_rows_event(WRITE_ROWS_EVENT_V2, 5, types, metas,
                          [[3, "c"]], log_pos=60),
        encode_query("TRUNCATE TABLE items", schema="shop", log_pos=70),
        encode_rows_event(WRITE_ROWS_EVENT_V2, 5, types, metas,
                          [[4, "d"]], log_pos=80),
    ]
    with open(os.path.join(frames_dir, "000.jsonl"), "w") as f:
        for fr in frames:
            f.write(json.dumps({"frame": fr.hex()}) + "\n")
    run_replication(spark, spec, state_dir=state, once=True, retry_interval=0.0)

    from transferia_spark.streaming.bucketed_table import BucketedParquetTable

    table = BucketedParquetTable(spark, target, keys=["id"], n_buckets=4)
    # the wire TRUNCATE wiped the seed and row 3; only row 4 survives
    assert {(r.id, r.v) for r in table.read().collect()} == {(4, "d")}


def test_gtid_state_accumulates_across_drains(tmp_path):
    """The executed GTID set persists in the tailed directory: a second
    drain (reconnect) resumes with the first drain's set, exactly what
    a live client presents to COM_BINLOG_DUMP_GTID."""
    from transferia_spark.streaming.mysql_binlog import load_gtid_state

    frames_dir = str(tmp_path / "frames")
    out = str(tmp_path / "out")
    os.makedirs(frames_dir)
    with open(os.path.join(frames_dir, "000.jsonl"), "w") as f:
        for fr in [encode_format_description(), encode_gtid(SID, 1, 10),
                   encode_gtid(SID, 2, 20), encode_xid(log_pos=25)]:
            f.write(json.dumps({"frame": fr.hex()}) + "\n")
    drain_recorded_binlog(frames_dir, out)
    assert load_gtid_state(out) == {SID: [[1, 2]]}
    with open(os.path.join(frames_dir, "001.jsonl"), "w") as f:
        for fr in [encode_format_description(), encode_gtid(SID, 3, 30),
                   encode_xid(log_pos=35)]:
            f.write(json.dumps({"frame": fr.hex()}) + "\n")
    drain_recorded_binlog(frames_dir, out)
    assert load_gtid_state(out) == {SID: [[1, 3]]}  # merged interval


def test_rows_event_property_round_trip():
    """Hypothesis: arbitrary row images over the supported type matrix
    survive encode→decode byte-exactly (values, NULLs, row multiplicity,
    update before/after pairing)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    types = [TYPE_LONGLONG, TYPE_LONG, TYPE_VARCHAR, TYPE_DOUBLE, TYPE_BLOB]
    metas = [None, None, 300, 8, 2]

    def value_strategies():
        return [
            st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1)),
            st.one_of(st.none(), st.integers(-(2**31), 2**31 - 1)),
            st.one_of(st.none(), st.text(max_size=40)),
            st.one_of(
                st.none(),
                st.floats(allow_nan=False, allow_infinity=True, width=64),
            ),
            st.one_of(st.none(), st.binary(max_size=64)),
        ]

    rows_st = st.lists(st.tuples(*value_strategies()), min_size=1, max_size=5)

    _, tm = decode_table_map(encode_table_map(
        3, "d", "t", types, metas, col_names=["a", "b", "c", "x", "z"],
        checksum=False,
    )[19:])

    @settings(max_examples=60, deadline=None)
    @given(rows_st)
    def check_write(rows):
        ev = encode_rows_event(
            WRITE_ROWS_EVENT_V2, 3, types, metas,
            [list(r) for r in rows], checksum=False,
        )
        got = decode_rows_event(WRITE_ROWS_EVENT_V2, ev[19:], tm)
        assert got == [
            {"after": dict(zip(["a", "b", "c", "x", "z"], r))} for r in rows
        ]

    @settings(max_examples=30, deadline=None)
    @given(rows_st, rows_st)
    def check_update(befores, afters):
        pairs = list(zip(befores, afters))
        ev = encode_rows_event(
            UPDATE_ROWS_EVENT_V2, 3, types, metas,
            [(list(b), list(a)) for b, a in pairs], checksum=False,
        )
        got = decode_rows_event(UPDATE_ROWS_EVENT_V2, ev[19:], tm)
        names = ["a", "b", "c", "x", "z"]
        assert got == [
            {"before": dict(zip(names, b)), "after": dict(zip(names, a))}
            for b, a in pairs
        ]

    check_write()
    check_update()


def test_gtid_set_property_merge_invariants():
    """Hypothesis: after any add sequence the interval set is sorted,
    disjoint, gap-separated, contains exactly the added gnos, and
    round-trips through format/parse."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from transferia_spark.streaming.mysql_binlog import (
        format_gtid_set,
        gtid_set_add,
        gtid_set_contains,
        parse_gtid_set,
    )

    @settings(max_examples=80, deadline=None)
    @given(st.lists(st.integers(1, 40), min_size=1, max_size=30))
    def check(gnos):
        s = {}
        for g in gnos:
            gtid_set_add(s, SID, g)
        ivs = s[SID]
        for (lo1, hi1), (lo2, hi2) in zip(ivs, ivs[1:]):
            assert hi1 + 1 < lo2  # disjoint AND gap-separated (merged)
        want = set(gnos)
        for g in range(0, 45):
            assert gtid_set_contains(s, SID, g) == (g in want)
        assert parse_gtid_set(format_gtid_set(s)) == s

    check()


def test_packet_stream_framing_and_errors():
    """The network packet layer (3-byte LE length + seq + payload):
    binlog events unwrap from their 0x00 OK marker, sequence gaps and
    ERR packets are loud, EOF ends the stream."""
    import io

    from transferia_spark.streaming.mysql_binlog import (
        MySqlServerError,
        encode_packet,
        packet_stream,
    )

    ev1 = encode_rotate("binlog.000009", checksum=False)
    ev2 = encode_gtid(SID, 5, 100, checksum=False)
    wire = (
        encode_packet(b"\x00" + ev1, 1)
        + encode_packet(b"\x00" + ev2, 2)
        + encode_packet(b"\xfe\x00\x00\x02\x00", 3)  # EOF
    )
    buf = io.BytesIO(wire)
    assert list(packet_stream(buf.read)) == [ev1, ev2]

    # sequence gap: desynced stream must not decode garbage
    wire = encode_packet(b"\x00" + ev1, 1) + encode_packet(b"\x00" + ev2, 9)
    buf = io.BytesIO(wire)
    with pytest.raises(ValueError, match="sequence gap"):
        list(packet_stream(buf.read))

    # ERR packet: parsed code + SQLSTATE + message
    err = b"\xff" + (1236).to_bytes(2, "little") + b"#HY000" + \
        b"Could not find first log file name"
    buf = io.BytesIO(encode_packet(err, 1))
    with pytest.raises(MySqlServerError, match="ERROR 1236 .HY000."):
        list(packet_stream(buf.read))

    # a full socket→tailer path over framed packets
    frames = _session_frames()
    wire = b"".join(
        encode_packet(b"\x00" + fr, i + 1) for i, fr in enumerate(frames)
    )
    buf = io.BytesIO(wire)
    import tempfile

    out = tempfile.mkdtemp(prefix="pkt_tailer_")
    n = BinlogTailer(packet_stream(buf.read), out).run()
    assert n == 7


def test_fde_checksum_detection_survives_real_post_header_table(tmp_path):
    """Self-review r6: a server FDE with checksum OFF carries a
    populated post-header-length table; a naive ev[-5] peek can land on
    a byte that happens to be 1 and misdetect CRC32. Detection now also
    VALIDATES the would-be trailer, so such an FDE stays checksum-off."""
    import struct as _struct

    from transferia_spark.streaming.mysql_binlog import (
        FORMAT_DESCRIPTION_EVENT,
        encode_header,
    )

    # checksum-off FDE whose post-header table ends ...,1,x,x,x,alg=0:
    # ev[-5] == 1 but there is no CRC trailer
    body = _struct.pack("<H", 4)
    body += b"8.0.0-public".ljust(50, b"\x00")
    body += _struct.pack("<I", 0)
    body += bytes([19])
    body += bytes(35) + bytes([1, 7, 7, 7])  # table tail lands at ev[-5]
    body += bytes([0])  # alg byte: OFF
    fde = encode_header(FORMAT_DESCRIPTION_EVENT, len(body), 0) + body
    assert fde[-5] == 1  # the trap the naive peek falls into

    rot = encode_rotate("binlog.000002", checksum=False)
    out = str(tmp_path / "b")
    tailer = BinlogTailer(iter([fde, rot]), out)
    tailer.run()  # would raise 'CRC mismatch' under the naive detection
    assert tailer.checksum is False and tailer.log_file == "binlog.000002"

    # and a REAL checksummed FDE still detects on
    t2 = BinlogTailer(iter([encode_format_description(checksum=True)]), out)
    t2.run()
    assert t2.checksum is True


def test_drain_numbering_survives_pruned_files(tmp_path):
    """Self-review r6: prune_committed deletes low-numbered drained
    files; a later drain must continue PAST the highest surviving
    index, never reuse (and clobber) an existing number."""
    frames_dir = str(tmp_path / "frames")
    out = str(tmp_path / "out")
    os.makedirs(frames_dir)
    os.makedirs(out)

    def capture(name, frs):
        with open(os.path.join(frames_dir, name), "w") as f:
            for fr in frs:
                f.write(json.dumps({"frame": fr.hex()}) + "\n")

    types, metas = [TYPE_LONGLONG], [None]
    prologue = [
        encode_format_description(),
        encode_rotate("binlog.000002"),
        encode_table_map(5, "d", "t", types, metas, col_names=["id"]),
    ]
    capture("000.jsonl", prologue + [
        encode_rows_event(WRITE_ROWS_EVENT_V2, 5, types, metas, [[1]],
                          log_pos=10),
    ])
    drain_recorded_binlog(frames_dir, out)
    capture("001.jsonl", prologue + [
        encode_rows_event(WRITE_ROWS_EVENT_V2, 5, types, metas, [[2]],
                          log_pos=20),
    ])
    drain_recorded_binlog(frames_dir, out)
    assert sorted(
        n for n in os.listdir(out) if n.endswith(".jsonl")
    ) == ["000000000.jsonl", "000000001.jsonl"]

    # the committed prefix gets trimmed (what prune_committed does)
    os.remove(os.path.join(out, "000000000.jsonl"))
    capture("002.jsonl", prologue + [
        encode_rows_event(WRITE_ROWS_EVENT_V2, 5, types, metas, [[3]],
                          log_pos=30),
    ])
    drain_recorded_binlog(frames_dir, out)
    # 000000001.jsonl (uncommitted) survives untouched; the new file
    # numbers PAST it
    names = sorted(n for n in os.listdir(out) if n.endswith(".jsonl"))
    assert names == ["000000001.jsonl", "000000002.jsonl"]
    with open(os.path.join(out, "000000001.jsonl")) as f:
        assert json.loads(f.readline())["after"] == {"id": 2}  # not clobbered


def test_packet_stream_truncation_is_loud():
    """ADVICE r6: a mid-packet EOF or a 1-3 byte header is a truncated
    stream and must raise, not end cleanly — only a zero-byte header
    read is a clean EOF."""
    import io

    from transferia_spark.streaming.mysql_binlog import (
        encode_packet,
        packet_stream,
    )

    ev = encode_rotate("binlog.000009", checksum=False)
    whole = encode_packet(b"\x00" + ev, 1)

    # mid-packet EOF: header promises len(payload) bytes, stream ends
    buf = io.BytesIO(whole[: 4 + 3])
    with pytest.raises(ValueError, match="truncated binlog packet"):
        list(packet_stream(buf.read))

    # truncated header (2 of 4 bytes)
    buf = io.BytesIO(whole[:2])
    with pytest.raises(ValueError, match="truncated binlog packet header"):
        list(packet_stream(buf.read))

    # clean EOF after a whole packet still works
    buf = io.BytesIO(whole)
    assert list(packet_stream(buf.read)) == [ev]


def test_truncate_without_table_keyword_scopes_table(tmp_path):
    """ADVICE r6: 'TRUNCATE t' (no TABLE keyword) is valid MySQL — the
    control doc must still carry the table name so multi-table
    pipelines can scope the wipe."""
    out = str(tmp_path / "binlog")
    frames = [
        encode_format_description(),
        encode_rotate("binlog.000002"),
        encode_query("TRUNCATE items", schema="shop", log_pos=50),
        encode_query("ALTER TABLE `shop`.`items` ADD COLUMN w text",
                     schema="shop", log_pos=60),
    ]
    n = BinlogTailer(iter(frames), out).run()
    assert n == 2
    lines = []
    for name in sorted(os.listdir(out)):
        if name.endswith(".jsonl"):
            with open(os.path.join(out, name)) as f:
                lines += [json.loads(ln) for ln in f if ln.strip()]
    assert [(ln["action"], ln["table"]) for ln in lines] == [
        ("truncate", "items"),
        ("ddl", "items"),
    ]


def test_non_table_ddl_leaves_table_unset(tmp_path):
    """ADVICE r7: TRUNCATE is the ONLY verb where MySQL makes the TABLE
    keyword optional before a table name — ALTER/DROP/RENAME without it
    target another object class, and guessing would emit a mis-scoped
    control ('ALTER DATABASE x' → table="DATABASE") that a multi-table
    pipeline would act on."""
    out = str(tmp_path / "binlog")
    frames = [
        encode_format_description(),
        encode_rotate("binlog.000002"),
        encode_query("ALTER DATABASE shop CHARACTER SET utf8mb4",
                     schema="shop", log_pos=40),
        encode_query("DROP INDEX idx_v ON items", schema="shop", log_pos=50),
        encode_query("DROP TABLE items", schema="shop", log_pos=60),
    ]
    n = BinlogTailer(iter(frames), out).run()
    assert n == 3
    lines = []
    for name in sorted(os.listdir(out)):
        if name.endswith(".jsonl"):
            with open(os.path.join(out, name)) as f:
                lines += [json.loads(ln) for ln in f if ln.strip()]
    assert [(ln["action"], ln.get("table")) for ln in lines] == [
        ("ddl", None),       # ALTER DATABASE: not a table DDL
        ("ddl", None),       # DROP INDEX: table rides the ON clause
        ("ddl", "items"),    # keyword path still scopes
    ]


def test_ddl_statement_commits_its_gtid(tmp_path):
    """DDL/TRUNCATE transactions have no XID (GTID → QUERY, implicit
    commit): a drain ending right after the statement persists its
    GTID — the control doc is already buffered, so reconnect must not
    re-deliver the transaction."""
    import json as _json

    out = str(tmp_path / "binlog")
    frames_dir = str(tmp_path / "frames")
    os.makedirs(frames_dir)
    from transferia_spark.streaming.mysql_binlog import load_gtid_state

    with open(os.path.join(frames_dir, "000.jsonl"), "w") as f:
        for fr in [
            encode_format_description(),
            encode_gtid(SID, 1, 10),
            encode_query("ALTER TABLE items ADD COLUMN w INT",
                         schema="shop", log_pos=20),
            # txn 2 announced, rows never arrive: stays pending
            encode_gtid(SID, 2, 30),
        ]:
            f.write(_json.dumps({"frame": fr.hex()}) + "\n")
    drain_recorded_binlog(frames_dir, out)
    assert load_gtid_state(out) == {SID: [[1, 1]]}  # DDL committed, 2 not


def test_ctas_transaction_commits_at_xid(tmp_path):
    """Atomic CREATE TABLE ... SELECT (MySQL 8.0.21+) logs ONE
    transaction under ONE GTID: Query('CREATE ... START TRANSACTION')
    → Table_map → Write_rows → Xid. A drain ending right after the
    Query event must NOT persist the GTID — a reconnect presenting it
    would skip the inserted rows forever; the Xid commits it."""
    import json as _json

    from transferia_spark.streaming.mysql_binlog import load_gtid_state

    types, metas = [TYPE_LONGLONG], [None]
    head = [
        encode_format_description(),
        encode_gtid(SID, 1, 10),
        encode_query(
            "CREATE TABLE `t2` (`id` BIGINT) START TRANSACTION",
            schema="shop", log_pos=20,
        ),
    ]
    tail = [
        encode_table_map(7, "shop", "t2", types, metas,
                         col_names=["id"], log_pos=30),
        encode_rows_event(WRITE_ROWS_EVENT_V2, 7, types, metas,
                          [[1], [2]], log_pos=40),
        encode_xid(log_pos=50),
    ]

    def drain(frames, name):
        frames_dir = str(tmp_path / f"f_{name}")
        out = str(tmp_path / f"b_{name}")
        os.makedirs(frames_dir)
        with open(os.path.join(frames_dir, "000.jsonl"), "w") as f:
            for fr in frames:
                f.write(_json.dumps({"frame": fr.hex()}) + "\n")
        drain_recorded_binlog(frames_dir, out)
        return out

    # drain ends right after the CTAS Query event: GTID stays pending
    out = drain(head, "partial")
    assert load_gtid_state(out) == {}
    # the ddl control doc itself still flowed
    docs = []
    for n in sorted(os.listdir(out)):
        if n.endswith(".jsonl"):
            with open(os.path.join(out, n)) as f:
                docs += [_json.loads(line) for line in f]
    assert [d["action"] for d in docs] == ["ddl"]
    # the full transaction: rows delivered, Xid commits the GTID
    out = drain(head + tail, "full")
    assert load_gtid_state(out) == {SID: [[1, 1]]}
    docs = []
    for n in sorted(os.listdir(out)):
        if n.endswith(".jsonl"):
            with open(os.path.join(out, n)) as f:
                docs += [_json.loads(line) for line in f]
    assert [d["action"] for d in docs] == ["ddl", "insert", "insert"]
