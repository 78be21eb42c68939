"""MySQL connection establishment (r7 verdict item 6): HandshakeV10
decode, mysql_native_password / caching_sha2_password scrambles
verified the way the SERVER verifies them, HandshakeResponse41 and
COM_BINLOG_DUMP_GTID wire layouts, the full auth dance over a scripted
duplex, and the persistent live connection presenting the PERSISTED
executed GTID set on reconnect — live `mysqlwire` parity with the PG
side. Reference shape: ``pkg/providers/mysql/canal.go``.
"""

from __future__ import annotations

import hashlib
import json
import os
import struct

import pytest

from transferia_spark.streaming.mysql_binlog import (
    CLIENT_CONNECT_WITH_DB,
    CLIENT_PLUGIN_AUTH,
    CLIENT_PROTOCOL_41,
    CLIENT_SECURE_CONNECTION,
    COM_BINLOG_DUMP_GTID,
    MySqlLiveConnection,
    MySqlServerError,
    MySqlWireSession,
    caching_sha2_scramble,
    decode_handshake_v10,
    decode_lenenc,
    encode_com_binlog_dump_gtid,
    encode_format_description,
    encode_gtid,
    encode_handshake_response,
    encode_packet,
    encode_rotate,
    encode_rows_event,
    encode_xid,
    encode_table_map,
    mysql_live_drain_tcp,
    mysql_native_scramble,
    scramble_for,
)

NONCE = b"abcdefghijklmnopqrst"  # 20-byte auth nonce


class FakeDuplex:
    """Scripted server bytes in, captured client bytes out (the same
    seam shape as the PG session tests)."""

    def __init__(self, script: bytes = b"", when_empty: str = "eof"):
        self.incoming = bytearray(script)
        self.sent = bytearray()
        self.when_empty = when_empty
        self.closed = False

    def read(self, n: int) -> bytes:
        if not self.incoming:
            if self.when_empty == "block":
                raise RuntimeError("read past the scripted data")
            if self.when_empty == "timeout":
                raise TimeoutError("fake socket timeout")
            return b""
        out = bytes(self.incoming[:n])
        del self.incoming[:n]
        return out

    def write(self, b: bytes) -> None:
        self.sent += b

    def poll(self, t: float) -> bool:
        return bool(self.incoming) or self.when_empty == "eof"

    def feed(self, b: bytes) -> None:
        self.incoming += b

    def close(self) -> None:
        self.closed = True


def handshake_payload(
    scramble: bytes = NONCE,
    plugin: str = "mysql_native_password",
    extra_caps: int = 0,
) -> bytes:
    part1, part2 = scramble[:8], scramble[8:] + b"\x00"
    caps = (
        CLIENT_PROTOCOL_41 | CLIENT_SECURE_CONNECTION | CLIENT_PLUGIN_AUTH
        | extra_caps
    )
    return (
        bytes([10])
        + b"8.0.36\x00"
        + struct.pack("<I", 99)
        + part1
        + b"\x00"
        + struct.pack("<H", caps & 0xFFFF)
        + bytes([33])
        + struct.pack("<H", 2)
        + struct.pack("<H", caps >> 16)
        + bytes([len(scramble) + 1])
        + b"\x00" * 10
        + part2
        + plugin.encode()
        + b"\x00"
    )


def ok_packet() -> bytes:
    return b"\x00\x00\x00\x02\x00\x00\x00"  # OK, status=2, no warnings


def err_packet(code: int, msg: str) -> bytes:
    return b"\xff" + struct.pack("<H", code) + b"#28000" + msg.encode()


# ------------------------------------------------------------ codecs


def test_decode_handshake_v10():
    hs = decode_handshake_v10(
        handshake_payload(plugin="caching_sha2_password")
    )
    assert hs.server_version == "8.0.36"
    assert hs.thread_id == 99
    assert hs.scramble == NONCE and len(hs.scramble) == 20
    assert hs.auth_plugin == "caching_sha2_password"
    assert hs.capabilities & CLIENT_PLUGIN_AUTH
    with pytest.raises(ValueError, match="protocol version"):
        decode_handshake_v10(bytes([9]) + b"5.0\x00")


def test_mysql_native_scramble_server_side_verification():
    """Verify the scramble exactly the way the server does: with only
    the STORED hash SHA1(SHA1(pwd)) (mysql.user) and the nonce, recover
    SHA1(pwd) = scramble XOR SHA1(nonce + stored) and check its SHA1
    equals the stored hash — an independent check of the recipe, not a
    mirror of the client code."""
    pwd = "pencil"
    scr = mysql_native_scramble(pwd, NONCE)
    assert len(scr) == 20
    stored = hashlib.sha1(hashlib.sha1(pwd.encode()).digest()).digest()
    mask = hashlib.sha1(NONCE + stored).digest()
    recovered_h1 = bytes(a ^ b for a, b in zip(scr, mask))
    assert hashlib.sha1(recovered_h1).digest() == stored
    assert mysql_native_scramble("", NONCE) == b""  # empty password


def test_caching_sha2_scramble_server_side_verification():
    """Fast-auth check as the server performs it against its CACHED
    SHA256(pwd): scramble XOR SHA256(SHA256(cached) + nonce) must
    recover the cached digest."""
    pwd = "pencil"
    scr = caching_sha2_scramble(pwd, NONCE)
    assert len(scr) == 32
    cached = hashlib.sha256(pwd.encode()).digest()
    mask = hashlib.sha256(hashlib.sha256(cached).digest() + NONCE).digest()
    assert bytes(a ^ b for a, b in zip(scr, mask)) == cached


def test_scramble_for_rejects_unknown_plugin():
    with pytest.raises(ValueError, match="auth plugin"):
        scramble_for("sha256_password", "x", NONCE)


def test_handshake_response_layout():
    auth = mysql_native_scramble("pw", NONCE)
    out = encode_handshake_response(
        "repl", auth, "mysql_native_password", database="shop"
    )
    caps, max_packet, charset = struct.unpack_from("<IIB", out, 0)
    assert caps & CLIENT_PROTOCOL_41 and caps & CLIENT_CONNECT_WITH_DB
    assert out[9:32] == b"\x00" * 23
    rest = out[32:]
    user, rest = rest.split(b"\x00", 1)
    assert user == b"repl"
    n, pos = decode_lenenc(rest, 0)
    assert rest[pos:pos + n] == auth
    tail = rest[pos + n:]
    assert tail == b"shop\x00mysql_native_password\x00"


def test_com_binlog_dump_gtid_layout():
    sid = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
    payload = encode_com_binlog_dump_gtid(
        43, {sid: [[1, 5], [7, 7]]}, filename="binlog.000002", pos=4
    )
    assert payload[0] == COM_BINLOG_DUMP_GTID
    flags, server_id = struct.unpack_from("<HI", payload, 1)
    assert (flags, server_id) == (0, 43)
    (name_len,) = struct.unpack_from("<I", payload, 7)
    name = payload[11:11 + name_len]
    assert name == b"binlog.000002"
    pos_ = 11 + name_len
    (binlog_pos,) = struct.unpack_from("<Q", payload, pos_)
    assert binlog_pos == 4
    (blk_len,) = struct.unpack_from("<I", payload, pos_ + 8)
    blk = payload[pos_ + 12:]
    assert len(blk) == blk_len
    (n_sids,) = struct.unpack_from("<Q", blk, 0)
    assert n_sids == 1
    assert blk[8:24] == bytes.fromhex(sid.replace("-", ""))
    (n_ivs,) = struct.unpack_from("<Q", blk, 24)
    assert n_ivs == 2
    # EXCLUSIVE interval ends on the wire
    assert struct.unpack_from("<QQ", blk, 32) == (1, 6)
    assert struct.unpack_from("<QQ", blk, 48) == (7, 8)


# ----------------------------------------------------------- sessions


def test_connect_native_password():
    fd = FakeDuplex(
        encode_packet(handshake_payload(), 0) + encode_packet(ok_packet(), 2)
    )
    sess = MySqlWireSession(fd.read, fd.write)
    sess.connect(user="repl", password="pw")
    assert sess.handshake.server_version == "8.0.36"
    sent = bytes(fd.sent)
    # one packet at seq 1 carrying the response with the right scramble
    assert sent[3] == 1
    body = sent[4:]
    assert mysql_native_scramble("pw", NONCE) in body
    assert b"repl\x00" in body


def test_connect_caching_sha2_fast_auth():
    fd = FakeDuplex(
        encode_packet(handshake_payload(plugin="caching_sha2_password"), 0)
        + encode_packet(b"\x01\x03", 2)  # AuthMoreData: fast-auth success
        + encode_packet(ok_packet(), 3)
    )
    sess = MySqlWireSession(fd.read, fd.write)
    sess.connect(user="repl", password="pw")
    assert caching_sha2_scramble("pw", NONCE) in bytes(fd.sent)


def test_connect_caching_sha2_full_auth_is_loud():
    fd = FakeDuplex(
        encode_packet(handshake_payload(plugin="caching_sha2_password"), 0)
        + encode_packet(b"\x01\x04", 2)  # full auth required
    )
    sess = MySqlWireSession(fd.read, fd.write)
    with pytest.raises(MySqlServerError, match="FULL authentication"):
        sess.connect(user="repl", password="pw")


def test_connect_auth_switch():
    """Server demands a different plugin mid-dance: the client must
    re-scramble with the NEW nonce and plugin."""
    new_nonce = b"ZYXWVUTSRQPONMLKJIHG"
    switch = (
        b"\xfe" + b"mysql_native_password\x00" + new_nonce + b"\x00"
    )
    fd = FakeDuplex(
        encode_packet(handshake_payload(plugin="caching_sha2_password"), 0)
        + encode_packet(switch, 2)
        + encode_packet(ok_packet(), 4)
    )
    sess = MySqlWireSession(fd.read, fd.write)
    sess.connect(user="repl", password="pw")
    assert mysql_native_scramble("pw", new_nonce) in bytes(fd.sent)


def test_connect_wrong_password_err():
    fd = FakeDuplex(
        encode_packet(handshake_payload(), 0)
        + encode_packet(err_packet(1045, "Access denied for user"), 2)
    )
    sess = MySqlWireSession(fd.read, fd.write)
    with pytest.raises(MySqlServerError, match="1045"):
        sess.connect(user="repl", password="wrong")


def test_query_ok_and_resultset_rejection():
    fd = FakeDuplex(
        encode_packet(handshake_payload(), 0)
        + encode_packet(ok_packet(), 2)
        + encode_packet(ok_packet(), 1)  # SET → OK
        + encode_packet(b"\x01", 1)  # SELECT → column-count: rejected
    )
    sess = MySqlWireSession(fd.read, fd.write)
    sess.connect(user="r", password="p")
    sess.query_ok("SET @master_binlog_checksum='CRC32'")
    sent_before = len(fd.sent)
    with pytest.raises(ValueError, match="result-set"):
        sess.query_ok("SELECT 1")
    assert len(fd.sent) > sent_before  # the command did go out


# -------------------------------------------------- live binlog drains

SID = "3e11fa47-71ca-11e1-9e33-c80aa9429562"


def _event_packets(events: list[bytes], start_seq: int = 1) -> bytes:
    return b"".join(
        encode_packet(b"\x00" + ev, start_seq + i)
        for i, ev in enumerate(events)
    )


def _session_script(events: list[bytes]) -> bytes:
    """handshake → OK → (SET checksum) OK → dump-stream events."""
    return (
        encode_packet(handshake_payload(), 0)
        + encode_packet(ok_packet(), 2)
        + encode_packet(ok_packet(), 1)
        + _event_packets(events)
    )


def _row_events(gno: int, rows: list[list], log_pos: int = 120) -> list[bytes]:
    tm = encode_table_map(
        7, "shop", "items", [3, 15], [None, 40],
        col_names=["id", "v"], log_pos=100,
    )
    return [
        encode_format_description(),
        encode_rotate("binlog.000002"),
        encode_gtid(SID.replace("-", ""), gno, log_pos=90),
        tm,
        encode_rows_event(0x1E, 7, [3, 15], [None, 40], rows,
                          log_pos=log_pos),
        encode_xid(log_pos=log_pos + 10),  # commit: GTID becomes executed
    ]


def _read_lines(out: str) -> list[dict]:
    lines = []
    for name in sorted(os.listdir(out)):
        if name.endswith(".jsonl"):
            with open(os.path.join(out, name)) as f:
                lines += [json.loads(ln) for ln in f if ln.strip()]
    return lines


def test_live_connection_drain_and_gtid_resume(tmp_path):
    """One connection: caught-up drains terminate (blocking fake), rows
    land, the executed GTID set persists; after a server close the
    reconnect PRESENTS the persisted set in COM_BINLOG_DUMP_GTID — the
    resume algebra the r7 verdict called the only missing piece."""
    out = str(tmp_path / "binlog")
    fds = [
        FakeDuplex(
            _session_script(_row_events(5, [[1, "a"], [2, "b"]])),
            when_empty="eof",  # server closes after the catch-up
        ),
        FakeDuplex(
            _session_script(_row_events(6, [[3, "c"]])),
            when_empty="block",
        ),
    ]
    dials = []

    def factory(host, port, timeout):
        fd = fds.pop(0)
        dials.append(fd)
        return fd.read, fd.write, fd.close, fd.poll

    conn = MySqlLiveConnection(
        {"host": "db", "user": "repl", "password": "pw", "server_id": 43,
         "idle_timeout": 0.01},
        out, transport_factory=factory,
    )
    assert conn.drain() == 2
    with open(os.path.join(out, "_gtid.state")) as f:
        assert f.read().strip() == f"{SID}:5"
    assert not conn.connected  # EOF observed
    # reconnect: drains new rows AND presented the persisted set
    assert conn.drain() == 1
    assert conn.connects == 2
    sent = bytes(dials[1].sent)
    ix = sent.find(bytes([COM_BINLOG_DUMP_GTID]))
    assert ix > 0
    blk = sent[ix:]
    assert bytes.fromhex(SID.replace("-", "")) in blk
    # interval [5,5] → exclusive (5,6) on the wire
    assert struct.pack("<QQ", 5, 6) in blk
    with open(os.path.join(out, "_gtid.state")) as f:
        assert f.read().strip() == f"{SID}:5-6"
    rows = [
        (ln["action"], ln["after"]["id"], ln["after"]["v"])
        for ln in _read_lines(out)
        if ln["action"] == "insert"
    ]
    assert rows == [("insert", 1, "a"), ("insert", 2, "b"),
                    ("insert", 3, "c")]
    # steady-state tick with nothing buffered: prompt no-op, no redial
    assert conn.drain() == 0
    assert conn.connects == 2
    conn.close()
    assert dials[1].closed


def test_mysql_live_drain_tcp_one_shot(tmp_path, monkeypatch):
    from transferia_spark.streaming import mysql_binlog as myb

    out = str(tmp_path / "binlog")
    fd = FakeDuplex(
        _session_script(_row_events(9, [[7, "x"]])), when_empty="timeout"
    )
    monkeypatch.setattr(
        myb, "mysql_dial", lambda host, port, timeout=30.0:
        (fd.read, fd.write, fd.close, fd.poll)
    )
    n = mysql_live_drain_tcp(
        {"host": "db", "user": "r", "password": "p"}, out
    )
    assert n == 1
    assert fd.closed  # one-shot closes its connection
    assert [ln["after"]["id"] for ln in _read_lines(out)
            if ln["action"] == "insert"] == [7]


def test_replicate_live_mysqlwire_end_to_end(spark, tmp_path, monkeypatch):
    """The full replicate-verb path against a scripted live MySQL:
    snapshot seed, live catch-up drains over dialed sessions that
    handshake/authenticate and COM_BINLOG_DUMP_GTID, row events applied
    through the binlogjson stream into the bucketed target — parity
    with the PG live e2e."""
    from transferia_spark.plans.config import transfer_from_yaml
    from transferia_spark.streaming import mysql_binlog as myb
    from transferia_spark.tasks.replicate import run_replication

    src = str(tmp_path / "items.parquet")
    binlog = str(tmp_path / "binlog")
    target = str(tmp_path / "target")
    state = str(tmp_path / "state")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string"
    ).write.parquet(src)

    dial_count = {"n": 0}

    def fake_dial(host, port, timeout=30.0):
        dial_count["n"] += 1
        # dial 1 = activation: caught up (no events). dial 2 = stream
        # build: the post-snapshot changes arrive.
        events = (
            _row_events(11, [[2, "b2"], [3, "c"]])
            if dial_count["n"] == 2
            else [encode_format_description()]
        )
        fd = FakeDuplex(_session_script(events), when_empty="block")
        return fd.read, fd.write, fd.close, fd.poll

    monkeypatch.setattr(myb, "mysql_dial", fake_dial)
    spec = transfer_from_yaml(f"""
type: SNAPSHOT_AND_INCREMENT
src: {{type: file, params: {{path: {src}, format: parquet}}}}
dst: {{type: file, params: {{path: {tmp_path}/unused, format: parquet}}}}
replication:
  source:
    format: mysqlwire
    live: {{host: db.example, user: repl, password: pw, server_id: 43,
           idle_timeout: 0.01}}
    path: {binlog}
    schema: "id long, v string"
  target: {{kind: bucketed, root: {target}, keys: [id], n_buckets: 4}}
""")
    run_replication(spark, spec, state_dir=state, once=True, retry_interval=0.0)

    from transferia_spark.streaming.bucketed_table import BucketedParquetTable

    table = BucketedParquetTable(spark, target, keys=["id"], n_buckets=4)
    got = {(r.id, r.v) for r in table.read().collect()}
    assert got == {(1, "a"), (2, "b2"), (3, "c")}
    assert dial_count["n"] >= 2


def test_gtid_advances_only_at_commit(tmp_path):
    """Code-review r8 finding 1: a drain ending MID-TRANSACTION (GTID
    seen, row events not yet delivered) must NOT persist that GTID —
    the reconnect presents the executed set to COM_BINLOG_DUMP_GTID and
    the server would skip the transaction's rows forever."""
    out = str(tmp_path / "binlog")
    tm = encode_table_map(
        7, "shop", "items", [3, 15], [None, 40],
        col_names=["id", "v"], log_pos=100,
    )
    fds = [
        # txn 5 commits (XID); txn 6 announced but its rows never
        # arrive before the server closes
        FakeDuplex(_session_script([
            encode_format_description(),
            encode_rotate("binlog.000002"),
            encode_gtid(SID.replace("-", ""), 5, log_pos=90),
            tm,
            encode_rows_event(0x1E, 7, [3, 15], [None, 40], [[1, "a"]],
                              log_pos=120),
            encode_xid(log_pos=130),
            encode_gtid(SID.replace("-", ""), 6, log_pos=140),
        ]), when_empty="eof"),
        # the reconnect re-delivers txn 6 in full
        FakeDuplex(_session_script([
            encode_format_description(),
            encode_gtid(SID.replace("-", ""), 6, log_pos=140),
            tm,
            encode_rows_event(0x1E, 7, [3, 15], [None, 40], [[2, "b"]],
                              log_pos=150),
            encode_xid(log_pos=160),
        ]), when_empty="block"),
    ]
    dials = []

    def factory(host, port, timeout):
        fd = fds.pop(0)
        dials.append(fd)
        return fd.read, fd.write, fd.close, fd.poll

    conn = MySqlLiveConnection(
        {"host": "db", "user": "r", "password": "p", "server_id": 43,
         "idle_timeout": 0.01},
        out, transport_factory=factory,
    )
    conn.drain()
    with open(os.path.join(out, "_gtid.state")) as f:
        assert f.read().strip() == f"{SID}:5"  # 6 NOT recorded
    conn.drain()  # reconnect: presents :5, server re-sends txn 6
    sent = bytes(dials[1].sent)
    assert struct.pack("<QQ", 5, 6) in sent       # interval [5,5]
    assert struct.pack("<QQ", 5, 7) not in sent   # NOT [5,6]
    rows = [ln["after"]["id"] for ln in _read_lines(out)
            if ln["action"] == "insert"]
    assert rows == [1, 2]  # txn 6's row arrived after all
    with open(os.path.join(out, "_gtid.state")) as f:
        assert f.read().strip() == f"{SID}:5-6"


def test_multi_table_sink_threads_compact_policy(spark, tmp_path):
    """Code-review r8 finding 6: per-table compact_policy reaches the
    constructed tables in multi-table mode."""
    from transferia_spark.tasks.replicate import MultiTableCdcSink

    sink = MultiTableCdcSink(spark, {
        "a": {"root": str(tmp_path / "a"), "keys": ["id"],
              "merge_mode": "delta", "compact_policy": "off"},
        "b": {"root": str(tmp_path / "b"), "keys": ["id"]},
    })
    assert sink.targets["a"].compact_policy == "off"
    assert sink.targets["b"].compact_policy == "incremental"


# ---------------------------------------------------------------- TLS
# Mid-handshake upgrade (Protocol::SSLRequest): greeting in cleartext,
# SSLRequest at seq 1, TLS handshake, HandshakeResponse41 encrypted —
# which also unlocks caching_sha2's FULL-auth cleartext exchange.


def test_encode_ssl_request_layout():
    from transferia_spark.streaming.mysql_binlog import (
        CLIENT_SSL,
        encode_ssl_request,
    )

    p = encode_ssl_request()
    assert len(p) == 32
    caps, max_packet, charset = struct.unpack_from("<IIB", p, 0)
    assert caps & CLIENT_SSL
    assert charset == 33
    assert p[9:] == b"\x00" * 23


def test_connect_tls_upgrade_orders_the_dance():
    from transferia_spark.streaming.mysql_binlog import CLIENT_SSL

    fd = FakeDuplex(
        encode_packet(handshake_payload(extra_caps=CLIENT_SSL), 0)
        + encode_packet(ok_packet(), 2)
    )
    calls = []

    def starttls(mode, rootcert, hostname):
        calls.append((mode, rootcert, hostname))

    sess = MySqlWireSession(fd.read, fd.write, starttls=starttls)
    sess.connect(user="repl", password="pw", ssl_mode="REQUIRED",
                 server_hostname="db.example")
    assert sess.tls_active
    assert calls == [("require", None, "db.example")]
    sent = bytes(fd.sent)
    # SSLRequest framed at seq 1: 32-byte payload with CLIENT_SSL
    assert sent[:4] == b"\x20\x00\x00\x01"
    caps = struct.unpack_from("<I", sent, 4)[0]
    assert caps & CLIENT_SSL
    # HandshakeResponse at seq 2 carries the SAME capability bits
    assert sent[36:40] == bytes([sent[36]]) + b"\x00\x00\x02"
    resp_caps = struct.unpack_from("<I", sent, 40)[0]
    assert resp_caps & CLIENT_SSL
    assert b"repl\x00" in sent[40:]


def test_connect_tls_respects_server_capability():
    from transferia_spark.streaming.mysql_binlog import CLIENT_SSL

    # server without CLIENT_SSL: REQUIRED is loud...
    fd = FakeDuplex(encode_packet(handshake_payload(), 0))
    sess = MySqlWireSession(fd.read, fd.write, starttls=lambda *a: None)
    with pytest.raises(MySqlServerError, match="does not support TLS"):
        sess.connect(user="r", password="p", ssl_mode="REQUIRED")
    # ...PREFERRED continues cleartext
    fd = FakeDuplex(
        encode_packet(handshake_payload(), 0) + encode_packet(ok_packet(), 2)
    )
    sess = MySqlWireSession(fd.read, fd.write, starttls=lambda *a: None)
    sess.connect(user="r", password="p", ssl_mode="PREFERRED")
    assert not sess.tls_active
    # a TLS-less transport with ssl_mode set is a config error
    fd = FakeDuplex(
        encode_packet(handshake_payload(extra_caps=CLIENT_SSL), 0)
    )
    sess = MySqlWireSession(fd.read, fd.write)
    with pytest.raises(ValueError, match="starttls"):
        sess.connect(user="r", password="p", ssl_mode="REQUIRED")


def test_connect_prefer_without_starttls_stays_cleartext():
    """PREFERRED degrades to cleartext when the CLIENT side can't do
    TLS (no starttls on the transport) even if the server advertises
    CLIENT_SSL — mysql --ssl-mode=PREFERRED / libpq prefer semantics;
    only REQUIRED-and-up is loud."""
    from transferia_spark.streaming.mysql_binlog import CLIENT_SSL

    fd = FakeDuplex(
        encode_packet(handshake_payload(extra_caps=CLIENT_SSL), 0)
        + encode_packet(ok_packet(), 2)
    )
    sess = MySqlWireSession(fd.read, fd.write)  # no starttls
    sess.connect(user="r", password="p", ssl_mode="PREFERRED")
    assert not sess.tls_active


def test_connect_verify_modes_need_rootcert():
    """VERIFY_CA/VERIFY_IDENTITY without sslrootcert is a config error
    diagnosed before any protocol bytes — not the ssl module's
    TypeError mid-handshake on every reconnect tick."""
    fd = FakeDuplex(b"")
    sess = MySqlWireSession(fd.read, fd.write, starttls=lambda *a: None)
    with pytest.raises(ValueError, match="needs sslrootcert"):
        sess.connect(user="r", password="p", ssl_mode="VERIFY_CA")
    assert not bytes(fd.sent)


def test_connect_full_auth_over_tls():
    from transferia_spark.streaming.mysql_binlog import CLIENT_SSL

    fd = FakeDuplex(
        encode_packet(
            handshake_payload(plugin="caching_sha2_password",
                              extra_caps=CLIENT_SSL), 0)
        + encode_packet(b"\x01\x04", 3)  # FULL auth required
        + encode_packet(ok_packet(), 5)
    )
    sess = MySqlWireSession(fd.read, fd.write, starttls=lambda *a: None)
    sess.connect(user="repl", password="s3cret", ssl_mode="REQUIRED")
    # the password went cleartext over the (fake-)encrypted channel
    assert encode_packet(b"s3cret\x00", 4) in bytes(fd.sent)


@pytest.fixture(scope="module")
def tls_cert(tmp_path_factory):
    import subprocess

    d = tmp_path_factory.mktemp("mysql_tls")
    cert, key = str(d / "cert.pem"), str(d / "key.pem")
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048",
         "-keyout", key, "-out", cert, "-days", "1", "-nodes",
         "-subj", "/CN=localhost"],
        check=True, capture_output=True,
    )
    return cert, key


def test_mysql_dial_tls_e2e(tls_cert):
    """Real loopback: cleartext greeting → SSLRequest → TLS wrap →
    encrypted HandshakeResponse → caching_sha2 FULL auth with the
    cleartext password protected by the channel."""
    import socket
    import ssl
    import threading

    from transferia_spark.streaming.mysql_binlog import (
        CLIENT_SSL,
        mysql_dial,
    )

    cert, key = tls_cert
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    state = {}

    def recv_packet(conn):
        head = b""
        while len(head) < 4:
            head += conn.recv(4 - len(head))
        ln = int.from_bytes(head[:3], "little")
        body = b""
        while len(body) < ln:
            body += conn.recv(ln - len(body))
        return body

    def serve():
        conn, _ = srv.accept()
        try:
            conn.sendall(encode_packet(
                handshake_payload(plugin="caching_sha2_password",
                                  extra_caps=CLIENT_SSL), 0))
            state["sslreq"] = recv_packet(conn)  # cleartext SSLRequest
            ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
            ctx.load_cert_chain(cert, key)
            conn = ctx.wrap_socket(conn, server_side=True)
            state["response"] = recv_packet(conn)  # encrypted
            conn.sendall(encode_packet(b"\x01\x04", 3))  # full auth
            state["password"] = recv_packet(conn)
            conn.sendall(encode_packet(ok_packet(), 5))
            conn.recv(1)  # hold until client closes
        finally:
            conn.close()
            srv.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    read, write, close, poll, starttls = mysql_dial(
        "127.0.0.1", port, timeout=5.0
    )
    sess = MySqlWireSession(read, write, starttls=starttls)
    sess.connect(user="repl", password="s3cret", ssl_mode="REQUIRED",
                 server_hostname="127.0.0.1")
    close()
    t.join(5)
    assert sess.tls_active
    caps = struct.unpack_from("<I", state["sslreq"], 0)[0]
    assert caps & CLIENT_SSL
    assert b"repl\x00" in state["response"]
    assert state["password"] == b"s3cret\x00"
