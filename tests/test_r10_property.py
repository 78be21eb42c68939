"""Property tests for round 10's new kernels: the one-exchange
clustered merge (vs the join-based reference implementation), the Kafka
record-set codec round-trip, and the gpfdist seq journal under
arbitrary crash/replay interleavings."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

# ------------------------------------------------- clustered merge ≡ join


def _rows_key(rows):
    return sorted(
        tuple("∅" if v is None else str(v) for v in r) for r in rows
    )


@settings(max_examples=8, deadline=None)
@given(
    target_rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(0, 12)),
            st.one_of(st.none(), st.text(max_size=4)),
        ),
        max_size=12,
        unique_by=lambda t: t[0],
    ),
    batch_rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(0, 12)),  # key
            st.one_of(st.none(), st.text(max_size=4)),  # value
            st.sampled_from(["i", "u", "d"]),
            st.integers(1, 50),  # lsn
        ),
        max_size=16,
    ),
    n_buckets=st.integers(1, 5),
)
@pytest.mark.slow
def test_clustered_merge_matches_join_merge(
    spark, target_rows, batch_rows, n_buckets
):
    """merge_batch_clustered (union → one bucket exchange → groupBy
    pairing) must produce EXACTLY the rows of the full-outer-join
    merge_batch for every key/op/NULL-key mix and bucket count —
    including NULL keys (groupBy's null grouping vs eqNullSafe)."""
    from pyspark.sql import functions as F

    from transferia_spark.cdc.merge import merge_batch, merge_batch_clustered

    spark = spark
    target = spark.createDataFrame(
        target_rows or [(None, None)], "k int, v string"
    )
    if not target_rows:
        target = target.limit(0)
    batch = spark.createDataFrame(
        [(k, v, op, lsn, i) for i, (k, v, op, lsn) in enumerate(batch_rows)]
        or [(None, None, "i", 1, 0)],
        "k int, v string, _op string, _lsn long, _counter long",
    )
    if not batch_rows:
        batch = batch.limit(0)

    ref = merge_batch(target, batch, ["k"])
    got = merge_batch_clustered(
        target, batch, ["k"], "bkt",
        lambda df: F.pmod(
            F.coalesce(F.xxhash64(F.col("k")), F.lit(0)), F.lit(n_buckets)
        ).cast("int"),
        n_buckets,
    ).drop("bkt")
    assert _rows_key(got.collect()) == _rows_key(ref.collect())


@settings(max_examples=6, deadline=None)
@given(
    batch_rows=st.lists(
        st.tuples(
            st.integers(0, 8),
            st.one_of(st.none(), st.text(max_size=3)),
            st.sampled_from(["i", "u"]),
            st.integers(1, 30),
        ),
        min_size=1,
        max_size=10,
    ),
)
@pytest.mark.slow
def test_clustered_merge_matches_join_merge_column_subset(
    spark, batch_rows
):
    """The TOAST arm: a column-subset batch (no ``extra`` column) keeps
    the target's values for the missing column identically in both
    formulations."""
    from pyspark.sql import functions as F

    from transferia_spark.cdc.merge import merge_batch, merge_batch_clustered

    spark = spark
    target = spark.createDataFrame(
        [(k, f"t{k}", k * 10) for k in range(6)],
        "k int, v string, extra int",
    )
    batch = spark.createDataFrame(
        [(k, v, op, lsn, i) for i, (k, v, op, lsn) in enumerate(batch_rows)],
        "k int, v string, _op string, _lsn long, _counter long",
    )
    ref = merge_batch(target, batch, ["k"], toast_aware=True)
    got = merge_batch_clustered(
        target, batch, ["k"], "bkt",
        lambda df: F.pmod(F.xxhash64(F.col("k")), F.lit(3)).cast("int"),
        3,
        toast_aware=True,
    ).drop("bkt")
    assert _rows_key(got.collect()) == _rows_key(ref.collect())


# ------------------------------------------------ kafka record-set codec


@settings(max_examples=40, deadline=None)
@given(
    batches=st.lists(
        st.tuples(
            st.lists(
                st.tuples(
                    st.one_of(st.none(), st.binary(max_size=12)),
                    st.one_of(st.none(), st.binary(max_size=20)),
                ),
                min_size=1,
                max_size=6,
            ),
            st.booleans(),  # control?
        ),
        max_size=5,
    ),
    truncate=st.integers(0, 10),
)
def test_record_set_roundtrip_and_end(batches, truncate):
    """decode_record_set_with_end over arbitrary concatenations of
    (data | control) batches: data records round-trip exactly in
    order, control records never surface, the end position is the last
    FULL batch's base+lastDelta+1, and truncating the tail drops only
    the last batch."""
    import struct

    from transferia_spark.sinks.kafka_wire import (
        crc32c,
        decode_record_set_with_end,
        encode_record_batch,
    )

    def mark_control(b: bytes) -> bytes:
        tail = bytearray(b[21:])
        struct.pack_into(">h", tail, 0, 0x20)
        return b[:17] + struct.pack(">I", crc32c(bytes(tail))) + bytes(tail)

    raw = b""
    base = 0
    want = []
    want_end = None
    for recs, is_ctrl in batches:
        b = encode_record_batch(recs, base_offset=base, base_timestamp=7)
        if is_ctrl:
            b = mark_control(b)
        else:
            want += [
                (base + i, k, v) for i, (k, v) in enumerate(recs)
            ]
        raw += b
        want_end = base + len(recs)
        base += len(recs)
    got, end = decode_record_set_with_end(raw)
    assert [(r["offset"], r["key"], r["value"]) for r in got] == want
    assert end == want_end
    if raw and truncate:
        cut, cend = decode_record_set_with_end(raw[:-truncate])
        # a truncated tail only ever loses whole trailing batches
        assert [(r["offset"], r["key"], r["value"]) for r in cut] == want[
            : len(cut)
        ]
        assert cend is None or cend <= (want_end or 0)


# -------------------------------------------------- gpfdist seq journal


@settings(max_examples=25, deadline=None)
@given(
    plan=st.lists(
        st.tuples(
            st.sampled_from(["ok", "lost_response", "crash_mid_append"]),
            st.binary(min_size=1, max_size=6),
        ),
        min_size=1,
        max_size=8,
    ),
    legacy_start=st.booleans(),
)
def test_seq_journal_survives_crash_replay_interleavings(
    tmp_path_factory, plan, legacy_start
):
    """Simulate the POST handler's journal+append protocol directly:
    for every sequence of (delivered | response-lost | crash-mid-append)
    chunks — optionally starting from a pre-r10 single-token marker —
    the replayed stream lands each chunk EXACTLY once, in order."""
    import os

    d = tmp_path_factory.mktemp("seq")
    data_file = os.path.join(d, "seg0.txt")
    seq_file = os.path.join(d, "seg0.seq")
    start = 0
    if legacy_start:
        with open(data_file, "wb") as fh:
            fh.write(b"OLD\n")
        with open(seq_file, "w") as fh:
            fh.write("4")  # old format: seq 4 fully applied
        start = 5

    def post(seq: int, data: bytes, crash_mid_append: bool) -> None:
        # the handler's journal logic, inlined (file-protocol level)
        try:
            with open(seq_file) as fh:
                parts = fh.read().split()
            last = int(parts[0])
            if len(parts) > 1:
                pre_len = int(parts[1])
            else:
                pre_len = os.path.getsize(data_file) if os.path.exists(
                    data_file
                ) else 0
                last += 1
        except (FileNotFoundError, ValueError, IndexError):
            last, pre_len = -1, 0
        if seq < last:
            return
        if seq == last:
            with open(data_file, "ab") as fh:
                fh.truncate(pre_len)
        else:
            pre_len = (
                os.path.getsize(data_file)
                if os.path.exists(data_file)
                else 0
            )
        with open(seq_file + ".tmp", "w") as fh:
            fh.write(f"{seq} {pre_len}")
        os.replace(seq_file + ".tmp", seq_file)
        with open(data_file, "ab") as fh:
            if crash_mid_append:
                fh.write(data[: max(1, len(data) // 2)])
                raise RuntimeError("crash")
            fh.write(data)

    for i, (mode, data) in enumerate(plan):
        seq = start + i
        if mode == "ok":
            post(seq, data, False)
        elif mode == "lost_response":
            post(seq, data, False)  # applied, response lost
            post(seq, data, False)  # retransmit
        else:
            try:
                post(seq, data, True)  # crash mid-append
            except RuntimeError:
                pass
            post(seq, data, False)  # retry after restart
    expect = (b"OLD\n" if legacy_start else b"") + b"".join(
        data for _m, data in plan
    )
    with open(data_file, "rb") as fh:
        assert fh.read() == expect
