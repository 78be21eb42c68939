"""Pure-Python Zstandard DECODER (RFC 8878) for Kafka record batches.

The reference consumes every Kafka compression codec via franz-go
(``pkg/providers/kafka/source.go``); this repo's pure-wire consumer
previously rejected zstd batches when the ``zstandard`` C lib was
absent — the last codec gate.  This module removes it: a complete
frame decoder built from the public spec (RFC 8878 / the zstd format
doc), covering raw/RLE/compressed blocks, Huffman-coded literals
(direct and FSE-compressed weights, 1- and 4-stream, treeless reuse),
FSE sequence tables (predefined / RLE / compressed / repeat modes),
repeat-offset history, multi-block frames, concatenated and skippable
frames.  Dictionaries are not supported (Kafka never uses them) and
frame checksums are skipped, not verified — the record batch's own
CRC-32C covers integrity, same stance as the lz4 frame decoder next
door.

Throughput is Python-speed (a few MB/s) — when the ``zstandard`` C
lib is installed it wins in ``decompress_records``; this is the
always-available fallback so consuming a zstd topic never requires an
install.  Correctness is pinned by round-tripping output of a real
zstd encoder (pyarrow's bundled libzstd) across levels and data
shapes in tests/test_zstd_pure.py.
"""

from __future__ import annotations

ZSTD_MAGIC = 0xFD2FB528
_SKIPPABLE_MASK = 0xFFFFFFF0
_SKIPPABLE_MAGIC = 0x184D2A50

# ------------------------------------------------------------------ FSE
# Predefined distributions (RFC 8878 §3.1.1.3.2.2).  Each sums to
# exactly 2^accuracy_log; -1 is the "less than 1" probability that
# occupies one high cell.

_LL_DEFAULT = (
    [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
     2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
     -1, -1, -1, -1],
    6,
)
_ML_DEFAULT = (
    [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1,
     -1, -1, -1, -1, -1],
    6,
)
_OF_DEFAULT = (
    [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1],
    5,
)

# Literals-length codes 16..35: (baseline, extra bits); codes 0-15 are
# the value itself with 0 extra bits.
_LL_EXTRA = [
    (16, 1), (18, 1), (20, 1), (22, 1), (24, 2), (28, 2), (32, 3),
    (40, 3), (48, 4), (64, 6), (128, 7), (256, 8), (512, 9),
    (1024, 10), (2048, 11), (4096, 12), (8192, 13), (16384, 14),
    (32768, 15), (65536, 16),
]
# Match-length codes 32..52; codes 0-31 are value code+3, 0 bits.
_ML_EXTRA = [
    (35, 1), (37, 1), (39, 1), (41, 1), (43, 2), (47, 2), (51, 3),
    (59, 3), (67, 4), (83, 4), (99, 5), (131, 7), (259, 8), (515, 9),
    (1027, 10), (2051, 11), (4099, 12), (8195, 13), (16387, 14),
    (32771, 15), (65539, 16),
]

_MAX_LL_SYMBOL = 35
_MAX_ML_SYMBOL = 52
_MAX_OF_SYMBOL = 31  # offsets beyond 2^31 can't occur in practice


def _corrupt(msg: str) -> ValueError:
    return ValueError(f"corrupt zstd: {msg}")


class _FwdBits:
    """Forward bitstream (LSB-first within bytes) — used only by FSE
    table descriptions (RFC 8878 §4.1.1)."""

    __slots__ = ("val", "pos", "nbits")

    def __init__(self, data: bytes) -> None:
        self.val = int.from_bytes(data, "little")
        self.pos = 0
        self.nbits = len(data) * 8

    def peek(self, n: int) -> int:
        return (self.val >> self.pos) & ((1 << n) - 1)

    def skip(self, n: int) -> None:
        self.pos += n
        if self.pos > self.nbits + 7:  # allow final-byte padding only
            raise _corrupt("FSE table description overruns its data")

    def read(self, n: int) -> int:
        v = self.peek(n)
        self.skip(n)
        return v

    def consumed_bytes(self) -> int:
        return (self.pos + 7) // 8


class _BackBits:
    """Backward bitstream: a 1-bit sentinel tops the last byte; reads
    take the most-significant remaining bits first (RFC 8878 §3.1.1.4).
    Reads past the start zero-fill and flag ``overflow`` — FSE weight
    decoding uses that as its termination signal; everything else
    treats it as corruption."""

    __slots__ = ("val", "bitpos")

    def __init__(self, data: bytes) -> None:
        if not data:
            raise _corrupt("empty bitstream")
        if data[-1] == 0:
            # the sentinel must top the LAST byte — re-framing from an
            # earlier byte would silently decode wrong output
            # (code-review r11 pass 4)
            raise _corrupt("bitstream missing its sentinel bit")
        val = int.from_bytes(data, "little")
        self.val = val
        self.bitpos = val.bit_length() - 1  # bits below the sentinel

    def read(self, n: int) -> int:
        self.bitpos -= n
        bp = self.bitpos
        if bp >= 0:
            return (self.val >> bp) & ((1 << n) - 1)
        if bp + n <= 0:
            return 0
        return (self.val & ((1 << (bp + n)) - 1)) << -bp

    @property
    def overflow(self) -> bool:
        return self.bitpos < 0


def _fse_read_table(
    data: bytes, max_log: int, max_symbol: int
) -> tuple[list[int], int, int]:
    """FSE table description → (normalized counts, table_log, bytes
    consumed).  RFC 8878 §4.1.1: 4-bit accuracy-log delta, then
    variable-width counts with a 2-bit zero-run repeat flag."""
    br = _FwdBits(data)
    table_log = br.read(4) + 5
    if table_log > max_log:
        raise _corrupt(f"FSE accuracy log {table_log} > max {max_log}")
    remaining = (1 << table_log) + 1
    threshold = 1 << table_log
    nbits = table_log + 1
    norm: list[int] = []
    while remaining > 1:
        if len(norm) > max_symbol:
            raise _corrupt("FSE table has too many symbols")
        maxv = (2 * threshold - 1) - remaining
        v = br.peek(nbits)
        low = v & (threshold - 1)
        if low < maxv:
            br.skip(nbits - 1)
            count = low
        else:
            v &= 2 * threshold - 1
            if v >= threshold:
                v -= maxv
            br.skip(nbits)
            count = v
        count -= 1  # -1 encodes the "less than 1" probability
        norm.append(count)
        remaining -= -count if count < 0 else count
        if count == 0:
            while True:
                rep = br.read(2)
                norm.extend([0] * rep)
                if rep != 3:
                    break
        while 1 < remaining < threshold:
            nbits -= 1
            threshold >>= 1
    if remaining != 1:
        raise _corrupt("FSE normalized counts do not sum to table size")
    return norm, table_log, br.consumed_bytes()


def _fse_build_table(
    norm: list[int], table_log: int
) -> tuple[list[int], list[int], list[int], int]:
    """Decoding table from normalized counts: (symbol, nbits, base
    new-state) per cell, plus table_log.  Spread step and state
    numbering follow the spec's construction (RFC 8878 §4.1.1)."""
    size = 1 << table_log
    syms = [0] * size
    high = size - 1
    next_state = [0] * len(norm)
    for s, c in enumerate(norm):
        if c == -1:
            syms[high] = s
            high -= 1
            next_state[s] = 1
        elif c > 0:
            next_state[s] = c
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    pos = 0
    for s, c in enumerate(norm):
        for _ in range(c if c > 0 else 0):
            syms[pos] = s
            pos = (pos + step) & mask
            while pos > high:
                pos = (pos + step) & mask
    if pos != 0:
        raise _corrupt("FSE table spread did not close")
    nb = [0] * size
    base = [0] * size
    for u in range(size):
        s = syms[u]
        ns = next_state[s]
        next_state[s] = ns + 1
        bits = table_log - (ns.bit_length() - 1)
        nb[u] = bits
        base[u] = (ns << bits) - size
    return syms, nb, base, table_log


def _fse_rle_table(symbol: int) -> tuple[list[int], list[int], list[int], int]:
    return [symbol], [0], [0], 0


_PREDEFINED = {}


def _predefined(which: str) -> tuple[list[int], list[int], list[int], int]:
    if which not in _PREDEFINED:
        norm, log = {"ll": _LL_DEFAULT, "ml": _ML_DEFAULT, "of": _OF_DEFAULT}[
            which
        ]
        _PREDEFINED[which] = _fse_build_table(list(norm), log)
    return _PREDEFINED[which]


# -------------------------------------------------------------- Huffman


def _fse_decode_weights(data: bytes) -> list[int]:
    """FSE-compressed Huffman weights: one table, two interleaved
    states alternating on a backward bitstream; zero-filled overflow
    ends the stream after the other state's final symbol (RFC 8878
    §4.2.1.2 / the reference FSE_decompress tail)."""
    norm, table_log, consumed = _fse_read_table(data, 6, 255)
    syms, nb, base, _ = _fse_build_table(norm, table_log)
    stream = data[consumed:]
    br = _BackBits(stream)
    s1 = br.read(table_log)
    s2 = br.read(table_log)
    if br.overflow:
        raise _corrupt("huffman weight stream too short for its states")
    weights: list[int] = []
    while True:
        if len(weights) > 253:
            raise _corrupt("more than 255 huffman weights")
        weights.append(syms[s1])
        s1 = base[s1] + br.read(nb[s1])
        if br.overflow:
            weights.append(syms[s2])
            break
        weights.append(syms[s2])
        s2 = base[s2] + br.read(nb[s2])
        if br.overflow:
            weights.append(syms[s1])
            break
    return weights


def _read_huffman_table(
    data: bytes,
) -> tuple[list[tuple[int, int]], int, int]:
    """Huffman tree description → (decode table, table_log, bytes
    consumed).  Header byte < 128 → FSE-compressed weights of that
    size; >= 128 → (header-127) direct 4-bit weights.  The last
    symbol's weight is implied by completion to a power of two."""
    if not data:
        raise _corrupt("missing huffman tree description")
    hb = data[0]
    if hb >= 128:
        n = hb - 127
        packed = data[1 : 1 + (n + 1) // 2]
        if len(packed) < (n + 1) // 2:
            raise _corrupt("truncated direct huffman weights")
        weights = []
        for i in range(n):
            byte = packed[i // 2]
            weights.append(byte >> 4 if i % 2 == 0 else byte & 15)
        consumed = 1 + (n + 1) // 2
    else:
        if 1 + hb > len(data):
            raise _corrupt("truncated FSE huffman weights")
        weights = _fse_decode_weights(data[1 : 1 + hb])
        consumed = 1 + hb
    # Weights cover all symbols but the last; complete to a power of 2.
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise _corrupt("huffman weights are all zero")
    table_log = total.bit_length()
    rest = (1 << table_log) - total
    if rest & (rest - 1):
        raise _corrupt("huffman weights do not complete a power of two")
    weights.append(rest.bit_length())
    if table_log > 11:
        # RFC 8878 §4.2.1: max huffman code length is 11 bits — weight
        # sets implying a 12-bit table come from no conformant encoder
        # and must be named corrupt (ADVICE r11)
        raise _corrupt(f"huffman code length {table_log} exceeds the format max")
    # Canonical decode table: symbols by (weight asc, symbol asc), a
    # weight-w symbol fills 2^(w-1) cells of (symbol, nbits).
    table: list[tuple[int, int]] = []
    for s in sorted(range(len(weights)), key=lambda i: (weights[i], i)):
        w = weights[s]
        if w == 0:
            continue
        table.extend([(s, table_log + 1 - w)] * (1 << (w - 1)))
    if len(table) != 1 << table_log:
        raise _corrupt("huffman table does not fill its size")
    return table, table_log, consumed


def _huf_decode_stream(
    table: list[tuple[int, int]], table_log: int, data: bytes, n_out: int
) -> bytearray:
    """One Huffman-coded literal stream (backward bits, peek
    table_log bits → (symbol, consumed)); must land exactly on the
    stream start."""
    br = _BackBits(data)
    out = bytearray()
    val = br.val
    bitpos = br.bitpos
    mask = (1 << table_log) - 1
    while len(out) < n_out:
        if bitpos < 0:
            raise _corrupt("huffman literal stream exhausted early")
        if bitpos >= table_log:
            idx = (val >> (bitpos - table_log)) & mask
        else:
            idx = (val << (table_log - bitpos)) & mask
        sym, bits = table[idx]
        out.append(sym)
        bitpos -= bits
    if bitpos != 0:
        raise _corrupt("huffman literal stream not fully consumed")
    return out


# ----------------------------------------------------------- literals


class _FrameState:
    """Per-frame decoder state that persists across blocks: repeat
    offsets, the previous Huffman table (treeless literals), and the
    previous sequence FSE tables (Repeat mode)."""

    __slots__ = ("rep", "huf", "huf_log", "ll", "of", "ml")

    def __init__(self) -> None:
        self.rep = [1, 4, 8]
        self.huf = None
        self.huf_log = 0
        self.ll = None
        self.of = None
        self.ml = None


def _decode_literals(src: bytes, state: _FrameState) -> tuple[bytes, int]:
    """Literals section → (regenerated literals, bytes consumed)."""
    if not src:
        raise _corrupt("empty literals section")
    b0 = src[0]
    lit_type = b0 & 3
    size_format = (b0 >> 2) & 3
    if lit_type <= 1:  # Raw / RLE
        if size_format in (0, 2):
            rsize, hsize = b0 >> 3, 1
        elif size_format == 1:
            if len(src) < 2:
                raise _corrupt("truncated literals header")
            rsize, hsize = (b0 >> 4) | (src[1] << 4), 2
        else:
            if len(src) < 3:
                raise _corrupt("truncated literals header")
            rsize, hsize = (b0 >> 4) | (src[1] << 4) | (src[2] << 12), 3
        if lit_type == 0:
            if hsize + rsize > len(src):
                raise _corrupt("raw literals overrun the block")
            return bytes(src[hsize : hsize + rsize]), hsize + rsize
        if hsize + 1 > len(src):
            raise _corrupt("missing RLE literal byte")
        return bytes([src[hsize]]) * rsize, hsize + 1
    # Compressed / Treeless
    if size_format == 0:
        nstreams, sbits, hsize = 1, 10, 3
    elif size_format == 1:
        nstreams, sbits, hsize = 4, 10, 3
    elif size_format == 2:
        nstreams, sbits, hsize = 4, 14, 4
    else:
        nstreams, sbits, hsize = 4, 18, 5
    if len(src) < hsize:
        raise _corrupt("truncated literals header")
    v = int.from_bytes(src[:hsize], "little") >> 4
    rsize = v & ((1 << sbits) - 1)
    csize = (v >> sbits) & ((1 << sbits) - 1)
    if hsize + csize > len(src):
        raise _corrupt("compressed literals overrun the block")
    payload = src[hsize : hsize + csize]
    if lit_type == 2:
        table, table_log, consumed = _read_huffman_table(payload)
        state.huf, state.huf_log = table, table_log
        payload = payload[consumed:]
    else:  # Treeless: reuse the frame's previous table
        if state.huf is None:
            raise _corrupt("treeless literals with no previous huffman table")
        table, table_log = state.huf, state.huf_log
    if nstreams == 1:
        lits = _huf_decode_stream(table, table_log, payload, rsize)
        return bytes(lits), hsize + csize
    if len(payload) < 6:
        raise _corrupt("missing 4-stream jump table")
    s1 = int.from_bytes(payload[0:2], "little")
    s2 = int.from_bytes(payload[2:4], "little")
    s3 = int.from_bytes(payload[4:6], "little")
    body = payload[6:]
    if s1 + s2 + s3 > len(body):
        raise _corrupt("jump table overruns the literal streams")
    per = (rsize + 3) // 4
    last = rsize - 3 * per
    if last < 0:
        raise _corrupt("4-stream literals smaller than 3 streams' worth")
    out = bytearray()
    bounds = [(0, s1, per), (s1, s1 + s2, per), (s1 + s2, s1 + s2 + s3, per),
              (s1 + s2 + s3, len(body), last)]
    for lo, hi, n in bounds:
        out += _huf_decode_stream(table, table_log, body[lo:hi], n)
    return bytes(out), hsize + csize


# ---------------------------------------------------------- sequences


def _sequence_table(
    mode: int,
    src: bytes,
    pos: int,
    which: str,
    prev,
    max_log: int,
    max_symbol: int,
):
    """One symbol type's table per its 2-bit compression mode."""
    if mode == 0:  # predefined
        return _predefined(which), pos
    if mode == 1:  # RLE: one byte, the only symbol
        if pos >= len(src):
            raise _corrupt("truncated RLE sequence table")
        sym = src[pos]
        if sym > max_symbol:
            raise _corrupt(f"RLE {which} symbol {sym} out of range")
        return _fse_rle_table(sym), pos + 1
    if mode == 2:  # FSE-compressed
        norm, table_log, consumed = _fse_read_table(
            src[pos:], max_log, max_symbol
        )
        return _fse_build_table(norm, table_log), pos + consumed
    if prev is None:  # repeat with nothing to repeat
        raise _corrupt(f"repeat {which} table with no previous table")
    return prev, pos


def _decode_sequences_and_execute(
    src: bytes,
    pos: int,
    literals: bytes,
    out: bytearray,
    frame_start: int,
    state: _FrameState,
) -> None:
    """Sequences section: count, modes, tables, then the backward
    bitstream of (LL, OF, ML) codes + extra bits; executes matches
    against the in-progress frame output (RFC 8878 §3.1.1.3.2)."""
    if pos >= len(src):
        raise _corrupt("missing sequences section")
    b0 = src[pos]
    pos += 1
    if b0 == 0:
        out += literals
        return
    if b0 < 128:
        nseq = b0
    elif b0 < 255:
        if pos >= len(src):
            raise _corrupt("truncated sequence count")
        nseq = ((b0 - 128) << 8) + src[pos]
        pos += 1
    else:
        if pos + 2 > len(src):
            raise _corrupt("truncated sequence count")
        nseq = src[pos] + (src[pos + 1] << 8) + 0x7F00
        pos += 2
    if pos >= len(src):
        raise _corrupt("missing sequence compression modes")
    modes = src[pos]
    pos += 1
    if modes & 3:
        raise _corrupt("reserved sequence mode bits set")
    (ll_t, pos) = _sequence_table(
        modes >> 6, src, pos, "ll", state.ll, 9, _MAX_LL_SYMBOL
    )
    (of_t, pos) = _sequence_table(
        (modes >> 4) & 3, src, pos, "of", state.of, 8, _MAX_OF_SYMBOL
    )
    (ml_t, pos) = _sequence_table(
        (modes >> 2) & 3, src, pos, "ml", state.ml, 9, _MAX_ML_SYMBOL
    )
    state.ll, state.of, state.ml = ll_t, of_t, ml_t
    ll_sym, ll_nb, ll_base, ll_log = ll_t
    of_sym, of_nb, of_base, of_log = of_t
    ml_sym, ml_nb, ml_base, ml_log = ml_t
    br = _BackBits(src[pos:])
    ll_state = br.read(ll_log)
    of_state = br.read(of_log)
    ml_state = br.read(ml_log)
    if br.overflow:
        raise _corrupt("sequence bitstream too short for initial states")
    rep = state.rep
    lit_pos = 0
    for i in range(nseq):
        # extra-bit read order: offset, match length, literals length
        of_code = of_sym[of_state]
        offset_value = (1 << of_code) + br.read(of_code)
        ml_code = ml_sym[ml_state]
        if ml_code < 32:
            ml = ml_code + 3
        else:
            base_v, bits = _ML_EXTRA[ml_code - 32]
            ml = base_v + br.read(bits)
        ll_code = ll_sym[ll_state]
        if ll_code < 16:
            ll = ll_code
        else:
            base_v, bits = _LL_EXTRA[ll_code - 16]
            ll = base_v + br.read(bits)
        if br.overflow:
            raise _corrupt("sequence bitstream exhausted mid-sequence")
        # repeat-offset resolution (offset_value 1-3, shifted when ll==0)
        if offset_value > 3:
            offset = offset_value - 3
            rep[2] = rep[1]
            rep[1] = rep[0]
            rep[0] = offset
        else:
            ov = offset_value + (1 if ll == 0 else 0)
            if ov == 1:
                offset = rep[0]
            elif ov == 2:
                offset = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            elif ov == 3:
                offset = rep[2]
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            else:  # rep1 - 1
                offset = rep[0] - 1
                if offset <= 0:
                    raise _corrupt("repeat offset underflow")
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
        if i < nseq - 1:  # update order: LL, ML, OF
            ll_state = ll_base[ll_state] + br.read(ll_nb[ll_state])
            ml_state = ml_base[ml_state] + br.read(ml_nb[ml_state])
            of_state = of_base[of_state] + br.read(of_nb[of_state])
            if br.overflow:
                raise _corrupt("sequence bitstream exhausted on state update")
        # execute
        if lit_pos + ll > len(literals):
            raise _corrupt("sequence consumes more literals than regenerated")
        out += literals[lit_pos : lit_pos + ll]
        lit_pos += ll
        if offset > len(out) - frame_start:
            raise _corrupt("match offset reaches before the frame start")
        if offset >= ml:
            start = len(out) - offset
            out += out[start : start + ml]
        else:  # overlapping copy = run extension, byte-serial
            for _ in range(ml):
                out.append(out[-offset])
    if br.bitpos != 0:
        raise _corrupt("sequence bitstream not fully consumed")
    out += literals[lit_pos:]


# -------------------------------------------------------------- frames


def _decode_compressed_block(
    src: bytes, out: bytearray, frame_start: int, state: _FrameState
) -> None:
    literals, consumed = _decode_literals(src, state)
    _decode_sequences_and_execute(
        src, consumed, literals, out, frame_start, state
    )


def _peek_content_size(data: bytes) -> int | None:
    """Frame-header peek: declared content size of a dict-less first
    frame, else None.  Drives the libzstd (pyarrow) fast path — at
    scale a compressed catch-up must not decode at Python speed when
    a C decoder is sitting in pyarrow."""
    if len(data) < 6 or int.from_bytes(data[:4], "little") != ZSTD_MAGIC:
        return None
    fhd = data[4]
    if fhd & 0x08 or fhd & 3:  # reserved bit / dictionary frame
        return None
    pos = 5 + (0 if (fhd >> 5) & 1 else 1)
    fcs_flag = fhd >> 6
    fcs_size = (1 if (fhd >> 5) & 1 else 0, 2, 4, 8)[fcs_flag]
    if fcs_size == 0 or pos + fcs_size > len(data):
        return None
    fcs = int.from_bytes(data[pos : pos + fcs_size], "little")
    if fcs_size == 2:
        fcs += 256
    return fcs


def zstd_decompress(data: bytes) -> bytes:
    """Decode a (possibly concatenated) sequence of zstd frames.

    When the first frame declares its content size (librdkafka's
    ZSTD_compress frames always do), libzstd via pyarrow decodes at C
    speed; a multi-frame input, absent pyarrow, or any libzstd error
    falls through to the pure-Python decoder, which raises ValueError
    (never IndexError) on malformation, naming the spot — truncation
    and corruption must be loud, matching the module's snappy/lz4
    decoders.
    """
    fcs = _peek_content_size(data)
    if fcs is not None:
        try:
            import pyarrow as pa

            return pa.decompress(
                data, decompressed_size=fcs, codec="zstd", asbytes=True
            )
        except Exception:
            pass  # the pure path decides: decode or a NAMED corruption
    return zstd_decompress_pure(data)


def zstd_decompress_pure(data: bytes) -> bytes:
    """The always-available pure-Python path (tests pin it directly —
    the fast path above must not mask its coverage)."""
    try:
        return _decompress_unchecked(data)
    except IndexError:
        raise _corrupt("truncated input") from None


def _decompress_unchecked(data: bytes) -> bytes:
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        if pos + 4 > n:
            raise _corrupt("truncated frame magic")
        magic = int.from_bytes(data[pos : pos + 4], "little")
        pos += 4
        if magic & _SKIPPABLE_MASK == _SKIPPABLE_MAGIC:
            if pos + 4 > n:
                raise _corrupt("truncated skippable frame size")
            size = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4 + size
            if pos > n:
                raise _corrupt("skippable frame overruns the input")
            continue
        if magic != ZSTD_MAGIC:
            raise _corrupt(f"bad frame magic 0x{magic:08x}")
        pos = _decode_frame(data, pos, out)
    return bytes(out)


def _decode_frame(data: bytes, pos: int, out: bytearray) -> int:
    fhd = data[pos]
    pos += 1
    if fhd & 0x08:
        raise _corrupt("reserved frame header bit set")
    single_segment = (fhd >> 5) & 1
    checksum_flag = (fhd >> 2) & 1
    if not single_segment:
        pos += 1  # window descriptor — size limits are the caller's concern
    did_size = (0, 1, 2, 4)[fhd & 3]
    if did_size:
        did = int.from_bytes(data[pos : pos + did_size], "little")
        if did:
            raise _corrupt(
                f"frame requires dictionary {did}; dictionaries are "
                "not supported (Kafka batches never use them)"
            )
        pos += did_size
    fcs_flag = fhd >> 6
    fcs_size = (1 if single_segment else 0, 2, 4, 8)[fcs_flag]
    fcs = None
    if fcs_size:
        if pos + fcs_size > len(data):
            raise _corrupt("truncated frame content size")
        fcs = int.from_bytes(data[pos : pos + fcs_size], "little")
        if fcs_size == 2:
            fcs += 256
        pos += fcs_size
    frame_start = len(out)
    state = _FrameState()
    while True:
        if pos + 3 > len(data):
            raise _corrupt("truncated block header")
        bh = int.from_bytes(data[pos : pos + 3], "little")
        pos += 3
        last = bh & 1
        btype = (bh >> 1) & 3
        bsize = bh >> 3
        if btype == 0:  # raw
            if pos + bsize > len(data):
                raise _corrupt("raw block overruns the input")
            out += data[pos : pos + bsize]
            pos += bsize
        elif btype == 1:  # RLE: size = regenerated count, 1 content byte
            if pos >= len(data):
                raise _corrupt("missing RLE block byte")
            out += bytes([data[pos]]) * bsize
            pos += 1
        elif btype == 2:
            if pos + bsize > len(data):
                raise _corrupt("compressed block overruns the input")
            _decode_compressed_block(
                data[pos : pos + bsize], out, frame_start, state
            )
            pos += bsize
        else:
            raise _corrupt("reserved block type")
        if last:
            break
    if checksum_flag:
        # low 4 bytes of XXH64(frame content) — skipped, not verified:
        # the Kafka record batch's CRC-32C covers integrity (same
        # stance as lz4_frame_decompress above).
        if pos + 4 > len(data):
            raise _corrupt("truncated content checksum")
        pos += 4
    if fcs is not None and len(out) - frame_start != fcs:
        raise _corrupt(
            f"frame regenerated {len(out) - frame_start} bytes, "
            f"header declared {fcs}"
        )
    return pos


def zstd_compress(data: bytes, level: int = 3) -> bytes:
    """ENCODE path: real zstd via pyarrow's bundled libzstd when
    available (a standard single frame with content size), else a
    valid raw-block-only frame (stored, not compressed — every
    decoder accepts it; RFC 8878 allows frames of raw blocks)."""
    try:
        import pyarrow as pa

        codec = pa.Codec("zstd", compression_level=level)
        return codec.compress(data, asbytes=True)
    except Exception:
        pass
    out = bytearray(ZSTD_MAGIC.to_bytes(4, "little"))
    # single-segment, FCS flag by size
    n = len(data)
    if n < 256:
        out.append((0 << 6) | 0x20)
        out += n.to_bytes(1, "little")
    elif n < 65536 + 256:
        out.append((1 << 6) | 0x20)
        out += (n - 256).to_bytes(2, "little")
    else:
        out.append((2 << 6) | 0x20)
        out += n.to_bytes(4, "little")
    max_block = 128 * 1024
    if n == 0:
        out += (1).to_bytes(3, "little")  # empty last raw block
        return bytes(out)
    for lo in range(0, n, max_block):
        chunk = data[lo : lo + max_block]
        last = 1 if lo + max_block >= n else 0
        out += ((len(chunk) << 3) | last).to_bytes(3, "little")
        out += chunk
    return bytes(out)
