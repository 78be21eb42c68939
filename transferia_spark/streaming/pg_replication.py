"""PostgreSQL streaming-replication wire protocol (pure Python).

≈ ``pkg/providers/postgres/publisher_replication.go:75`` (slot create /
START_REPLICATION / keepalive / ack loop) and ``lsn_slot.go:128`` (LSN
algebra) in transferia/transferia, built against the PUBLIC protocol
docs (PostgreSQL "Streaming Replication Protocol" + "Message Formats"):

- replication commands are plain query strings over a connection opened
  with ``replication=database`` (``IDENTIFY_SYSTEM``,
  ``CREATE_REPLICATION_SLOT``, ``START_REPLICATION``);
- the server then switches to CopyBoth: each CopyData payload is either
  **XLogData** (``'w'`` + walStart int64 + walEnd int64 + serverClock
  int64 + WAL payload bytes) or **Primary keepalive** (``'k'`` + walEnd
  + serverClock + replyRequested byte);
- the client acks with **Standby status update** (``'r'`` + written +
  flushed + applied int64s + clock + replyRequested) — the flushed LSN
  is what lets the server trim the slot, exactly the reference's
  committed-LSN ack.

Transport is INJECTABLE (the pattern proven by ``sinks/kafka_wire.py``):
frame codecs are pure functions, :class:`ReplicationTailer` drains any
iterator of CopyData payloads (a live socket's COPY stream, or recorded
vectors in tests) into the JSON-lines directory
``wal_source.WalJsonStreamReader`` tails — so the DataSource stream,
offsets, and collapse/merge path are IDENTICAL with a live socket or a
recorded log. Timestamps ride the PG epoch (2000-01-01, microseconds).
"""

from __future__ import annotations

import json
import os
import struct
from dataclasses import dataclass
from typing import Callable, Iterable

#: seconds between the Unix and PostgreSQL epochs (2000-01-01 UTC)
PG_EPOCH_OFFSET_US = 946_684_800 * 1_000_000


# ------------------------------------------------------------------ LSN


def parse_lsn(text: str) -> int:
    """``'X/Y'`` (hex halves) → 64-bit LSN (``lsn_slot.go:128`` algebra:
    high word is the WAL segment file group, low word the offset)."""
    hi, _, lo = text.partition("/")
    if not _:
        raise ValueError(f"not an LSN: {text!r}")
    return (int(hi, 16) << 32) | int(lo, 16)


def format_lsn(lsn: int) -> str:
    return f"{lsn >> 32:X}/{lsn & 0xFFFFFFFF:X}"


# ----------------------------------------------------------- commands


def identify_system_command() -> str:
    return "IDENTIFY_SYSTEM"


def create_slot_command(
    slot: str, plugin: str = "wal2json", temporary: bool = False
) -> str:
    """≈ CreateReplicationSlot (publisher_replication.go slot setup)."""
    tmp = " TEMPORARY" if temporary else ""
    return f"CREATE_REPLICATION_SLOT {slot}{tmp} LOGICAL {plugin}"


def start_replication_command(
    slot: str, lsn: int = 0, options: dict[str, str] | None = None
) -> str:
    """START_REPLICATION with plugin options (wal2json's
    format-version/include-lsn etc. ride here)."""
    opts = ""
    if options:
        inner = ", ".join(f"\"{k}\" '{v}'" for k, v in sorted(options.items()))
        opts = f" ({inner})"
    return f"START_REPLICATION SLOT {slot} LOGICAL {format_lsn(lsn)}{opts}"


# ------------------------------------------------------------- frames


@dataclass
class XLogData:
    wal_start: int
    wal_end: int
    server_clock_us: int  # PG epoch µs
    payload: bytes


@dataclass
class PrimaryKeepalive:
    wal_end: int
    server_clock_us: int
    reply_requested: bool


def decode_copydata(frame: bytes) -> XLogData | PrimaryKeepalive:
    """One CopyData payload → XLogData ('w') or keepalive ('k')."""
    kind = frame[:1]
    if kind == b"w":
        ws, we, clock = struct.unpack_from(">qqq", frame, 1)
        return XLogData(ws, we, clock, frame[25:])
    if kind == b"k":
        we, clock, reply = struct.unpack_from(">qqB", frame, 1)
        return PrimaryKeepalive(we, clock, bool(reply))
    raise ValueError(f"unknown replication message kind {kind!r}")


def encode_xlog_data(
    wal_start: int, wal_end: int, payload: bytes, server_clock_us: int = 0
) -> bytes:
    """Inverse of :func:`decode_copydata` for 'w' — test-vector builder
    and the recorded-transport format."""
    return b"w" + struct.pack(">qqq", wal_start, wal_end, server_clock_us) + payload


def encode_keepalive(
    wal_end: int, server_clock_us: int = 0, reply_requested: bool = False
) -> bytes:
    return b"k" + struct.pack(">qqB", wal_end, server_clock_us, int(reply_requested))


def encode_standby_status(
    received: int,
    flushed: int,
    applied: int,
    clock_us: int = 0,
    reply_requested: bool = False,
) -> bytes:
    """Standby status update ('r') — the slot ack. ``flushed`` is the
    durability watermark the server may trim to (≈ the committed LSN the
    reference persists, publisher_replication.go:140)."""
    return b"r" + struct.pack(
        ">qqqqB", received, flushed, applied, clock_us, int(reply_requested)
    )


def decode_standby_status(frame: bytes) -> tuple[int, int, int, int, bool]:
    if frame[:1] != b"r":
        raise ValueError(f"not a standby status update: {frame[:1]!r}")
    r, f, a, c, rep = struct.unpack_from(">qqqqB", frame, 1)
    return r, f, a, c, bool(rep)


# ---------------------------------------------------- message framing

#: backend message tags of the COPY subprotocol (public "Message
#: Formats" docs): every message is tag byte + int32 length (length
#: INCLUDES itself, excludes the tag) + body
MSG_COPY_DATA = b"d"
MSG_COPY_BOTH_RESPONSE = b"W"
MSG_COPY_DONE = b"c"
MSG_ERROR_RESPONSE = b"E"
MSG_READY_FOR_QUERY = b"Z"


class PgServerError(RuntimeError):
    """An ErrorResponse from the server, fields parsed (severity,
    SQLSTATE code, message — the public error-field format)."""

    def __init__(self, fields: dict[str, str]):
        self.fields = fields
        super().__init__(
            f"{fields.get('S', 'ERROR')} {fields.get('C', '?????')}: "
            f"{fields.get('M', '(no message)')}"
        )


def decode_error_fields(body: bytes) -> dict[str, str]:
    """ErrorResponse body: (field-type byte + cstring)* + NUL."""
    fields: dict[str, str] = {}
    pos = 0
    while pos < len(body) and body[pos] != 0:
        code = chr(body[pos])
        end = body.index(b"\x00", pos + 1)
        fields[code] = body[pos + 1:end].decode(errors="replace")
        pos = end + 1
    return fields


def encode_copydata_message(payload: bytes) -> bytes:
    """Wrap a replication payload ('w'/'k'/'r' frame) in the CopyData
    message a socket actually carries — the client's standby-status
    updates travel the same way."""
    return MSG_COPY_DATA + struct.pack(">I", len(payload) + 4) + payload


def message_stream(read: Callable[[int], bytes]):
    """Parse the backend message stream of an open COPY-BOTH session
    into CopyData payloads — the glue between a raw socket and
    :class:`ReplicationTailer` (``tailer = ReplicationTailer(
    message_stream(sock.recv_exact), lambda p: sock.sendall(
    encode_copydata_message(p)), out_dir)``).

    ``read(n)`` must return exactly n bytes (or b"" at EOF).
    CopyBothResponse is consumed silently (session start), CopyDone /
    ReadyForQuery end the stream, ErrorResponse raises
    :class:`PgServerError` with parsed fields.
    """
    while True:
        tag = read(1)
        if not tag:
            return
        (ln,) = struct.unpack(">I", read(4))
        body = read(ln - 4) if ln > 4 else b""
        if tag == MSG_COPY_DATA:
            yield body
        elif tag == MSG_COPY_BOTH_RESPONSE:
            continue  # session start: format codes, nothing to emit
        elif tag in (MSG_COPY_DONE, MSG_READY_FOR_QUERY):
            return
        elif tag == MSG_ERROR_RESPONSE:
            raise PgServerError(decode_error_fields(body))
        # NoticeResponse / ParameterStatus etc.: ignorable during COPY


# ------------------------------------------------------------- tailer


class ReplicationTailer:
    """Drain a CopyBoth stream into the wal2json JSON-lines directory
    that ``WalJsonStreamReader`` tails.

    ``recv`` yields CopyData payloads (live socket or recorded vectors);
    ``send`` receives standby status updates. Each XLogData's wal2json
    line gets its authoritative position stamped from the frame header
    (``lsn`` = walStart) so the file form is byte-compatible with what
    the slot-file tailer produced before. Acks: flushed advances to the
    frame's walEnd after its line is durably written (fsync the data
    file, rename, fsync the directory — power-loss safe, since the ack
    authorizes the server to trim the slot), sent
    on server reply requests and on ``close()`` — the same ack points
    the reference uses.
    """

    def __init__(
        self,
        recv: Iterable[bytes],
        send: Callable[[bytes], None],
        out_dir: str,
        lines_per_file: int = 1000,
    ):
        self.recv = recv
        self.send = send
        self.out_dir = out_dir
        self.lines_per_file = lines_per_file
        self.received = 0
        self.flushed = 0
        self._buf: list[str] = []
        self._file_no = 0
        os.makedirs(out_dir, exist_ok=True)

    def _flush_file(self) -> None:
        if not self._buf:
            # nothing pending — everything received is already durable,
            # so the flush watermark may advance to the received one
            self.flushed = self.received
            return
        name = f"{self._file_no:09d}.jsonl"
        tmp = os.path.join(self.out_dir, "." + name + ".tmp")
        # the flushed LSN in the standby-status ack lets the server TRIM
        # the slot — it must mean "survives power loss", not "left the
        # page cache": fsync the data before the rename and the
        # directory after it (the rename itself isn't durable until the
        # directory entry is), and only then advance the watermark
        with open(tmp, "w") as f:
            f.write("\n".join(self._buf) + "\n")
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(self.out_dir, name))
        dfd = os.open(self.out_dir, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
        self._file_no += 1
        self._buf.clear()
        self.flushed = self.received  # durable up to everything received

    def _ack(self) -> None:
        self.send(
            encode_standby_status(self.received, self.flushed, self.flushed)
        )

    def run(self, max_frames: int | None = None) -> int:
        """Process frames until the source drains (or ``max_frames``);
        returns the number of XLogData frames written."""
        n = 0
        for frame in self.recv:
            msg = decode_copydata(frame)
            if isinstance(msg, PrimaryKeepalive):
                self.received = max(self.received, msg.wal_end)
                if msg.reply_requested:
                    self._flush_file()  # make the ack honest: fsync first
                    self._ack()
                continue
            doc = json.loads(msg.payload)
            doc["lsn"] = msg.wal_start  # authoritative frame position
            self._buf.append(json.dumps(doc))
            self.received = max(self.received, msg.wal_end)
            n += 1
            if len(self._buf) >= self.lines_per_file:
                self._flush_file()
            if max_frames is not None and n >= max_frames:
                break
        self.close()
        return n

    def close(self) -> None:
        self._flush_file()
        self._ack()


def drain_recorded_frames(
    frames_path: str, out_dir: str, send: Callable[[bytes], None] | None = None
) -> int:
    """Replay a RECORDED CopyBoth session (JSON-lines files of
    ``{"frame": "<hex>"}`` — the same capture format the kafka wire
    sink's test transport uses) through the tailer into ``out_dir``.

    Already-drained capture files are remembered in
    ``out_dir/_drained.state`` (NOT ``.json`` — the waljson reader
    scans the directory for ``.json``/``.jsonl`` event files) so
    repeated catch-up passes only decode NEW captures — mirroring how a
    live drain only sees new socket data. Returns the number of
    XLogData frames written this pass."""
    try:
        names = sorted(os.listdir(frames_path))
    except FileNotFoundError:
        return 0
    os.makedirs(out_dir, exist_ok=True)
    state_file = os.path.join(out_dir, "_drained.state")
    try:
        with open(state_file) as f:
            done = set(json.load(f))
    except FileNotFoundError:
        done = set()
    fresh = [
        n for n in names
        if n.endswith((".json", ".jsonl")) and n not in done
    ]
    if not fresh:
        return 0

    def frames():
        for name in fresh:
            with open(os.path.join(frames_path, name)) as f:
                for line in f:
                    if line.strip():
                        yield bytes.fromhex(json.loads(line)["frame"])

    tailer = ReplicationTailer(frames(), send or (lambda b: None), out_dir)
    # continue the output numbering past prior passes — restarting at 0
    # would overwrite already-tailed (and possibly already-checkpointed)
    # event files
    # continue numbering past the HIGHEST existing index, not the file
    # count: prune_committed deletes low-numbered fully-committed files,
    # and a count-based number would reuse (and os.replace-clobber) a
    # surviving file holding uncommitted events
    existing = [
        int(n_.split(".")[0])
        for n_ in os.listdir(out_dir)
        if n_.endswith(".jsonl") and n_.split(".")[0].isdigit()
    ]
    tailer._file_no = max(existing) + 1 if existing else 0
    n = tailer.run()
    tmp = state_file + ".tmp"
    with open(tmp, "w") as f:
        json.dump(sorted(done | set(fresh)), f)
    os.replace(tmp, state_file)
    return n


__all__ = [
    "PG_EPOCH_OFFSET_US",
    "PgServerError",
    "decode_error_fields",
    "encode_copydata_message",
    "message_stream",
    "drain_recorded_frames",
    "PrimaryKeepalive",
    "ReplicationTailer",
    "XLogData",
    "create_slot_command",
    "decode_copydata",
    "decode_standby_status",
    "encode_keepalive",
    "encode_standby_status",
    "encode_xlog_data",
    "format_lsn",
    "identify_system_command",
    "parse_lsn",
    "start_replication_command",
]
