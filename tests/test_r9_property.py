"""Property tests for round 9's new kernels: the Arrow-columnar MySQL
text decode, the gpfdist framing, the offset-scan cache, and the
segment file split — each checked against a naive reference
implementation over randomized inputs (the repo's test_cdc_property
pattern)."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

# ------------------------------------------------------------- decode


@settings(max_examples=30, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(-2**62, 2**62)),
            st.one_of(
                st.none(),
                st.text(
                    alphabet=st.characters(
                        blacklist_categories=("Cs",),
                        blacklist_characters="\x00",
                    ),
                    max_size=20,
                ),
            ),
            st.one_of(st.none(), st.booleans()),
        ),
        max_size=40,
    ),
    batch_rows=st.integers(1, 7),
)
def test_mysql_decode_matches_naive(rows, batch_rows):
    """rows_to_frames (ListArray ingest + strided take + Arrow casts)
    must agree with a per-value naive decode for every chunking."""
    import pandas as pd
    from pyspark.sql import types as T

    from transferia_spark.sources.mysql_select import rows_to_frames

    schema = T.StructType([
        T.StructField("i", T.LongType()),
        T.StructField("s", T.StringType()),
        T.StructField("b", T.BooleanType()),
    ])
    raw = [
        [
            str(i).encode() if i is not None else None,
            s.encode() if s is not None else None,
            (b"1" if b else b"0") if b is not None else None,
        ]
        for i, s, b in rows
    ]
    frames = list(rows_to_frames(iter(raw), schema, batch_rows=batch_rows))
    if not rows:
        assert frames == []
        return
    pdf = pd.concat(frames, ignore_index=True)
    got = [
        (
            None if pd.isna(r["i"]) else int(r["i"]),
            None if r["s"] is None else r["s"],
            None if pd.isna(r["b"]) else bool(r["b"]),
        )
        for _idx, r in pdf.iterrows()
    ]
    assert got == list(rows)


# ------------------------------------------------------------ gpfdist


@settings(max_examples=50, deadline=None)
@given(
    files=st.lists(
        st.tuples(
            st.text(
                alphabet="abcdefgh0123456789_-.", min_size=1, max_size=12
            ),
            st.binary(min_size=1, max_size=200),
        ),
        min_size=0,
        max_size=8,
        unique_by=lambda t: t[0],
    ),
    seg_count=st.integers(1, 4),
)
def test_gpfdist_split_and_framing_roundtrip(files, seg_count):
    """Shares are disjoint and exhaustive for every (files, segments)
    shape, and frame encode→decode is the identity per share."""
    from transferia_spark.sinks.gpfdist_server import (
        decode_gpfdist_blocks,
        encode_gpfdist_blocks,
        segment_files,
    )

    names = [n for n, _d in files]
    by_name = dict(files)
    shares = [segment_files(names, s, seg_count) for s in range(seg_count)]
    flat = [n for share in shares for n in share]
    assert sorted(flat) == sorted(names)  # exhaustive
    assert len(flat) == len(set(flat))    # disjoint
    for share in shares:
        body = b"".join(
            encode_gpfdist_blocks(
                n, by_name[n], final=(i == len(share) - 1)
            )
            for i, n in enumerate(share)
        )
        assert decode_gpfdist_blocks(body) == [
            (n, by_name[n]) for n in share
        ]


# --------------------------------------------------------- scan cache


@settings(max_examples=30, deadline=None)
@given(
    file_positions=st.lists(
        st.lists(st.integers(1, 50), min_size=0, max_size=20),
        min_size=1,
        max_size=4,
    ),
    floors=st.lists(st.integers(0, 55), min_size=1, max_size=6),
)
def test_offset_scan_cache_matches_naive(tmp_path_factory, file_positions, floors):
    """pending() over cached immutable files must equal the naive
    full-rescan answer for every monotone-or-not floor sequence, and
    each file must be DECODED at most once (the whole point)."""
    import os

    from transferia_spark.streaming.wal_source import OffsetScanCache

    d = tmp_path_factory.mktemp("osc")
    files = []
    for i, positions in enumerate(file_positions):
        f = os.path.join(str(d), f"{i:03d}.jsonl")
        with open(f, "w") as fh:
            for p in positions:
                fh.write(json.dumps({"lsn": p}) + "\n")
        files.append(f)

    decodes = {f: 0 for f in files}

    def positions_of(f):
        decodes[f] += 1
        with open(f) as fh:
            for line in fh:
                if line.strip():
                    yield int(json.loads(line)["lsn"])

    cache = OffsetScanCache()
    for floor in floors:
        got = sorted(cache.pending(files, floor, positions_of))
        want = sorted(
            p for ps in file_positions for p in ps if p > floor
        )
        assert got == want
    if floors == sorted(floors):
        # a live reader's floors are monotone: each file decodes ONCE
        # (a floor regression may legitimately force one re-decode)
        assert all(n <= 1 for n in decodes.values()), decodes


# ------------------------------------------------------ constraint fold


@settings(max_examples=50, deadline=None)
@given(
    tables=st.dictionaries(
        st.text(alphabet="abc", min_size=1, max_size=3),
        st.lists(
            st.tuples(
                st.sampled_from(["PRIMARY", "uniq_a", "uniq_b"]),
                st.lists(
                    st.text(alphabet="xyz", min_size=1, max_size=3),
                    min_size=1, max_size=3, unique=True,
                ),
            ),
            min_size=1, max_size=3,
            unique_by=lambda t: t[0],
        ),
        min_size=0, max_size=4,
    )
)
def test_fold_constraints_picks_primary_else_first(tables):
    """For every constraint layout: PRIMARY wins when present, else the
    alphabetically-first constraint (the statement's ORDER BY), and key
    columns stay in ordinal order."""
    from transferia_spark.sources.schema_discovery import fold_constraints

    rows = []
    for tbl, cons in sorted(tables.items()):
        ordered = sorted(cons, key=lambda c: (c[0] != "PRIMARY", c[0]))
        for cname, cols in ordered:
            for pos, col in enumerate(cols, start=1):
                rows.append({
                    "table_schema": "s", "table_name": tbl,
                    "column_name": col, "ordinal_position": str(pos),
                    "constraint_name": cname,
                })
    out = fold_constraints(rows)
    for tbl, cons in tables.items():
        expect_name, expect_cols = sorted(
            cons, key=lambda c: (c[0] != "PRIMARY", c[0])
        )[0]
        assert out[f"s.{tbl}"] == list(expect_cols)
