"""gpfdist protocol server: the Greenplum parallel data plane.

The reference moves GP data through the ``gpfdist`` binary wired to
named pipes (``pkg/providers/greenplum/gpfdist/`` — GpfdistBin +
PipeReader/PipeWriter); the Spark-first equivalent implements the
protocol itself over stdlib HTTP, so the repo carries the WHOLE plane:
Spark stages TEXT part files (``GreenplumGpfdistSink.stage``), this
server serves them to the segments that the READABLE EXTERNAL TABLE
points at, and a WRITABLE external table's segments POST their rows
back here for the unload path (``gpfdist_storage.go`` shape).

Protocol (public gpfdist wire surface, from the Greenplum docs and the
open-source gpfdist implementation):

- a segment GETs its path with ``X-GP-PROTO`` 0 or 1 plus
  ``X-GP-SEGMENT-ID``/``X-GP-SEGMENT-COUNT``;
- proto 0 answers raw file bytes;
- proto 1 frames the body as ``<type:1><len:4 BE><payload>`` blocks:
  ``F`` filename, ``O`` file offset (8-byte BE), ``D`` data, ``L``
  line/row count (8-byte BE), ending with a zero-length ``D``;
- the server DISTRIBUTES the path's files among the session's
  segments so the parallel scan partitions the data exactly once —
  here deterministically (``files[segment_id::segment_count]``), which
  needs no cross-request session state;
- a writable table's segments POST row text; ``X-GP-SEQ`` orders the
  chunks per segment and a ``X-GP-DONE`` header closes the segment's
  stream.

Simplifications vs the C implementation, stated loudly: no multi-XID
session registry (one logical load per path at a time — the sink's
staging layout guarantees that) and no TLS (front it like any HTTP
service). Framing and distribution are exact, and the loopback tests
drive both directions with fake segments over real sockets.
"""

from __future__ import annotations

import glob
import http.server
import os
import struct
import threading


def encode_gpfdist_blocks(
    filename: str, data: bytes, offset: int = 0, final: bool = False
) -> bytes:
    """One file's proto-1 frame sequence: F + O + L + D (+ the
    terminating empty D when ``final``). Pure, so the framing is
    testable/driver-checkable byte-for-byte."""
    name = filename.encode()
    out = b"F" + struct.pack(">I", len(name)) + name
    out += b"O" + struct.pack(">I", 8) + struct.pack(">Q", offset)
    lines = data.count(b"\n")
    out += b"L" + struct.pack(">I", 8) + struct.pack(">Q", lines)
    out += b"D" + struct.pack(">I", len(data)) + data
    if final:
        out += b"D" + struct.pack(">I", 0)
    return out


def decode_gpfdist_blocks(body: bytes) -> list[tuple[str, bytes]]:
    """Inverse of :func:`encode_gpfdist_blocks` over a whole response:
    ``[(filename, data)]`` — what a segment (or a test) reassembles."""
    out: list[tuple[str, bytes]] = []
    name = ""
    pos = 0
    while pos < len(body):
        typ = body[pos:pos + 1]
        (ln,) = struct.unpack(">I", body[pos + 1:pos + 5])
        payload = body[pos + 5:pos + 5 + ln]
        pos += 5 + ln
        if typ == b"F":
            name = payload.decode()
        elif typ == b"D":
            if ln == 0:
                break  # end-of-stream marker
            out.append((name, payload))
        # O / L are advisory for the reassembler
    return out


def segment_files(files: list[str], seg_id: int, seg_count: int) -> list[str]:
    """Deterministic exclusive-and-exhaustive split of a path's files
    among the session's segments (the coordination gpfdist keeps in
    its session registry, without the registry)."""
    return sorted(files)[seg_id::max(1, seg_count)]


class GpfdistServer:
    """Serve a staging root over the gpfdist protocol.

    ``GET /<rel>`` (glob allowed, e.g. ``tbl/*``) streams this
    segment's share of the matching files; ``POST /<rel>`` appends the
    body to ``<root>/<rel>/seg<id>.txt`` (the unload path — one file
    per writing segment, chunks ordered by the segment's own stream).
    """

    def __init__(self, root: str, host: str = "127.0.0.1", port: int = 0):
        self.root = os.path.abspath(root)
        outer = self

        class Handler(http.server.BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def _hdr_int(self, name: str, default: int) -> int:
                try:
                    return int(self.headers.get(name, default))
                except ValueError:
                    return default

            def _safe(self, rel: str) -> str:
                p = os.path.abspath(os.path.join(outer.root, rel))
                if not p.startswith(outer.root + os.sep) and p != outer.root:
                    raise PermissionError(rel)
                return p

            def do_GET(self):
                rel = self.path.lstrip("/")
                try:
                    pattern = self._safe(rel)
                except PermissionError:
                    self.send_error(403)
                    return
                proto = self._hdr_int("X-GP-PROTO", 0)
                seg = self._hdr_int("X-GP-SEGMENT-ID", 0)
                n = self._hdr_int("X-GP-SEGMENT-COUNT", 1)
                matches = [
                    f for f in glob.glob(pattern)
                    if os.path.isfile(f)
                ]
                mine = segment_files(matches, seg, n)
                body = b""
                if proto >= 1:
                    # EMPTY files (Spark's _SUCCESS markers) must not be
                    # framed: a zero-length D block IS the protocol's
                    # end-of-stream marker and would truncate the
                    # response after the first empty file
                    payloads = []
                    for f in mine:
                        with open(f, "rb") as fh:
                            data = fh.read()
                        if data:
                            payloads.append(
                                (os.path.relpath(f, outer.root), data)
                            )
                    for i, (name, data) in enumerate(payloads):
                        body += encode_gpfdist_blocks(
                            name, data, final=(i == len(payloads) - 1)
                        )
                    if not payloads:
                        body = b"D" + struct.pack(">I", 0)
                else:
                    for f in mine:
                        with open(f, "rb") as fh:
                            body += fh.read()
                self.send_response(200)
                self.send_header("X-GP-PROTO", str(proto))
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                rel = self.path.lstrip("/")
                try:
                    target_dir = self._safe(rel)
                except PermissionError:
                    self.send_error(403)
                    return
                ln = int(self.headers.get("Content-Length", 0))
                data = self.rfile.read(ln)
                seg = self._hdr_int("X-GP-SEGMENT-ID", 0)
                os.makedirs(target_dir, exist_ok=True)
                # per-segment file; X-GP-SEQ orders chunks within one
                # segment's own HTTP stream, which arrives in order on
                # one connection — append is sufficient
                with open(
                    os.path.join(target_dir, f"seg{seg}.txt"), "ab"
                ) as fh:
                    fh.write(data)
                self.send_response(200)
                self.send_header("X-GP-PROTO", "1")
                self.send_header("Content-Length", "0")
                self.end_headers()

            def log_message(self, *a):  # quiet
                pass

        self._srv = http.server.ThreadingHTTPServer((host, port), Handler)
        self.port = self._srv.server_address[1]
        self._thread = threading.Thread(
            target=self._srv.serve_forever, daemon=True,
            name="gpfdist-server",
        )
        self._thread.start()

    @property
    def url(self) -> str:
        return f"gpfdist://{self._srv.server_address[0]}:{self.port}"

    def close(self) -> None:
        self._srv.shutdown()
        self._srv.server_close()


__all__ = [
    "GpfdistServer",
    "decode_gpfdist_blocks",
    "encode_gpfdist_blocks",
    "segment_files",
]
