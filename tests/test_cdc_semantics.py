"""CDC collapse/merge semantics: NULL-vs-absent and the reference's
canon replication sequences.

The NULL/TOAST tests pin the ADVICE r1 fix: column-wise ("last
present") folding applies only to rows explicitly marked partial
(``_toasted`` / ``_present``); a full row's NULL is a genuine
``UPDATE ... SET col = NULL`` and must overwrite
(≈ ``pkg/abstract/changeitem/change_item_collapse.go`` compareColumns —
absent-by-name vs present-with-NULL).

The sequence tests port the reference's golden replication sequences
(``tests/canon/sequences/dump/00_insert_update_delete.sql``,
``01_updatepk.sql``, ``02_insert_update_insert.sql``) through
collapse → merge, asserting the final table contents.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from transferia_spark.cdc.collapse import PRESENT_NET_COL, collapse
from transferia_spark.cdc.merge import apply_changelog, merge_batch

CI_SCHEMA = "id int, v1 string, v2 string, _op string, _lsn long, _counter int"


def _rows(df):
    return {tuple(r) for r in df.collect()}


# ---------------------------------------------------------------------------
# NULL vs absent
# ---------------------------------------------------------------------------


def test_full_row_null_update_overwrites(spark):
    """No partial-row marker → NULL means NULL, never 'keep stale'."""
    batch = spark.createDataFrame(
        [
            (1, "a", "x", "i", 1, 0),
            (1, None, "y", "u", 2, 0),  # genuine SET v1 = NULL
        ],
        CI_SCHEMA,
    )
    net = collapse(batch, ["id"])
    row = net.collect()[0]
    assert row["v1"] is None
    assert row["v2"] == "y"


def test_toasted_row_keeps_absent_column(spark):
    """_toasted rows: NULL payload means column absent → carried forward."""
    batch = spark.createDataFrame(
        [
            (1, "a", "x", "i", 1, 0, False),
            (1, None, "y", "u", 2, 0, True),  # TOAST partial: v1 absent
        ],
        CI_SCHEMA + ", _toasted boolean",
    )
    row = collapse(batch, ["id"]).collect()[0]
    assert row["v1"] == "a"  # absent column carried from the insert
    assert row["v2"] == "y"


def test_mixed_toasted_and_explicit_null(spark):
    """A later FULL row's NULL overwrites even after a toasted row."""
    batch = spark.createDataFrame(
        [
            (1, "a", "x", "i", 1, 0, False),
            (1, None, "y", "u", 2, 0, True),  # v1 absent (kept)
            (1, None, "z", "u", 3, 0, False),  # full row: v1 := NULL
        ],
        CI_SCHEMA + ", _toasted boolean",
    )
    row = collapse(batch, ["id"]).collect()[0]
    assert row["v1"] is None
    assert row["v2"] == "z"


def test_present_list_allows_null_inside_partial_row(spark):
    """_present names the carried columns, so a partial row can also set
    one of them to NULL explicitly."""
    batch = spark.createDataFrame(
        [
            (1, "a", "x", "i", 1, 0, None),  # full row (no _present list)
            (1, None, None, "u", 2, 0, ["v2"]),  # partial: only v2, := NULL
        ],
        CI_SCHEMA + ", _present array<string>",
    )
    row = collapse(batch, ["id"]).collect()[0]
    assert row["v1"] == "a"  # absent from the partial row → kept
    assert row["v2"] is None  # carried NULL → overwritten


def test_merge_keeps_target_value_for_column_absent_from_whole_batch(spark):
    target = spark.createDataFrame([(1, "old1", "old2")], "id int, v1 string, v2 string")
    batch = spark.createDataFrame(
        [(1, None, "new2", "u", 10, 0, True)],
        CI_SCHEMA + ", _toasted boolean",
    )
    out = merge_batch(target, batch, ["id"])
    row = out.collect()[0]
    assert row["v1"] == "old1"  # absent from every event → target kept
    assert row["v2"] == "new2"


def test_merge_applies_genuine_null_from_full_row(spark):
    target = spark.createDataFrame([(1, "old1", "old2")], "id int, v1 string, v2 string")
    batch = spark.createDataFrame(
        [(1, None, "new2", "u", 10, 0, False)],
        CI_SCHEMA + ", _toasted boolean",
    )
    row = merge_batch(target, batch, ["id"]).collect()[0]
    assert row["v1"] is None  # full row → NULL overwrites
    assert row["v2"] == "new2"


def test_collapse_presence_struct_shape(spark):
    batch = spark.createDataFrame(
        [
            (1, None, "y", "u", 2, 0, True),
        ],
        CI_SCHEMA + ", _toasted boolean",
    )
    net = collapse(batch, ["id"], with_presence=True)
    assert PRESENT_NET_COL in net.columns
    row = net.collect()[0]
    assert row[PRESENT_NET_COL]["v1"] is False
    assert row[PRESENT_NET_COL]["v2"] is True


def test_legacy_blanket_fold_still_available(spark):
    """toast_aware=True on an unmarked frame keeps the old last-non-null
    behavior for sources that can't mark partial rows."""
    batch = spark.createDataFrame(
        [
            (1, "a", "x", "i", 1, 0),
            (1, None, "y", "u", 2, 0),
        ],
        CI_SCHEMA,
    )
    row = collapse(batch, ["id"], toast_aware=True).collect()[0]
    assert row["v1"] == "a"


# ---------------------------------------------------------------------------
# Canon replication sequences (reference golden fixtures)
# ---------------------------------------------------------------------------

SEQ_SCHEMA = (
    "i1 int, i2 int, t string, _op string, _lsn long, _counter int, "
    "_before struct<i1:int,i2:int>"
)


def _apply_seq(spark, events):
    """Run a ChangeItem sequence against an empty target, as the canon
    tests replay a PG WAL into an empty sink table."""
    target = spark.createDataFrame([], "i1 int, i2 int, t string")
    log = spark.createDataFrame(events, SEQ_SCHEMA)
    return apply_changelog(target, log, ["i1", "i2"])


def test_sequence_insert_update_delete(spark):
    """dump/00: a key born, updated and deleted in one log nets to nothing."""
    out = _apply_seq(
        spark,
        [
            (2, 2, "b", "i", 1, 0, None),
            (2, 2, "c", "u", 2, 0, None),
            (2, 2, None, "d", 3, 0, None),
        ],
    )
    assert out.count() == 0


def test_sequence_updatepk(spark):
    """dump/01: PK-changing update moves the row; old key disappears."""
    out = _apply_seq(
        spark,
        [
            (1, 1, "a", "i", 1, 0, None),
            (1, 1, "b", "u", 2, 0, None),
            (2, 2, "b", "u", 3, 0, (1, 1)),  # SET i1=2,i2=2
            (2, 2, "c", "u", 4, 0, None),
        ],
    )
    assert _rows(out) == {(2, 2, "c")}


def test_sequence_insert_update_insert(spark):
    """dump/02: re-insert after pk-move and after delete, three keys."""
    out = _apply_seq(
        spark,
        [
            # key (1,1) → moves to (2,2), then key is re-born
            (1, 1, "1a", "i", 1, 0, None),
            (1, 1, "1b", "u", 2, 0, None),
            (2, 2, "1b", "u", 3, 0, (1, 1)),
            (1, 1, "2a", "i", 4, 0, None),
            (1, 1, "2b", "u", 5, 0, None),
            # key (3,3): insert/update/delete then re-insert/update
            (3, 3, "3a", "i", 6, 0, None),
            (3, 3, "3b", "u", 7, 0, None),
            (3, 3, None, "d", 8, 0, None),
            (3, 3, "4a", "i", 9, 0, None),
            (3, 3, "4b", "u", 10, 0, None),
        ],
    )
    assert _rows(out) == {(1, 1, "2b"), (2, 2, "1b"), (3, 3, "4b")}


def test_sequence_idempotent_reapply(spark):
    """Applying the same log twice yields the same table (at-least-once +
    idempotent apply, docs/concepts/replication-techniques.md:9-12)."""
    events = [
        (1, 1, "a", "i", 1, 0, None),
        (1, 1, "b", "u", 2, 0, None),
        (2, 2, "x", "i", 3, 0, None),
    ]
    once = _apply_seq(spark, events)
    log = spark.createDataFrame(events, SEQ_SCHEMA)
    twice = merge_batch(once, log, ["i1", "i2"])
    assert _rows(once.select("i1", "i2", "t")) == _rows(twice.select("i1", "i2", "t"))


@pytest.mark.slow
def test_canon_sequences_every_split_point(spark):
    """≈ AllSubsequences (tests/canon/all_replication_sequences.go:127):
    each canon sequence applied as [prefix | rest] must equal the
    one-shot apply at EVERY cut position — the exhaustive form of
    batch-boundary invariance over the golden logs."""
    sequences = {
        "insert_update_delete": [
            (2, 2, "b", "i", 1, 0, None),
            (2, 2, "c", "u", 2, 0, None),
            (2, 2, None, "d", 3, 0, None),
        ],
        "updatepk": [
            (1, 1, "a", "i", 1, 0, None),
            (1, 1, "b", "u", 2, 0, None),
            (2, 2, "b", "u", 3, 0, (1, 1)),
            (2, 2, "c", "u", 4, 0, None),
        ],
        "insert_update_insert": [
            (1, 1, "1a", "i", 1, 0, None),
            (1, 1, "1b", "u", 2, 0, None),
            (2, 2, "1b", "u", 3, 0, (1, 1)),
            (1, 1, "2a", "i", 4, 0, None),
            (1, 1, "2b", "u", 5, 0, None),
            (3, 3, "3a", "i", 6, 0, None),
            (3, 3, "3b", "u", 7, 0, None),
            (3, 3, None, "d", 8, 0, None),
            (3, 3, "4a", "i", 9, 0, None),
            (3, 3, "4b", "u", 10, 0, None),
        ],
    }
    target = spark.createDataFrame([], "i1 int, i2 int, t string")
    for name, events in sequences.items():
        one_shot = _rows(_apply_seq(spark, events))
        for cut in range(1, len(events)):
            first = apply_changelog(
                target, spark.createDataFrame(events[:cut], SEQ_SCHEMA),
                ["i1", "i2"],
            )
            two_shot = apply_changelog(
                first, spark.createDataFrame(events[cut:], SEQ_SCHEMA),
                ["i1", "i2"],
            )
            assert _rows(two_shot) == one_shot, f"{name} split at {cut}"


def test_snapshot_plus_changelog_drops_overlap_per_key(spark):
    """SURVEY §7 hard part 2: events at or below a key's snapshot LSN
    are duplicates of state already in the snapshot — replaying them in
    a later batch must NOT regress the row (plain apply_changelog
    would: collapse orders within a batch, not against the target)."""
    from transferia_spark.cdc.merge import snapshot_plus_changelog

    snapshot = spark.createDataFrame(
        [(1, "new", 5), (2, "keep", 5)],
        "k int, v string, _lsn long",
    )
    # the replayed overlap: an OLD event for k=1 (lsn 3 < snapshot's 5)
    # plus a genuinely new update for k=2 and a fresh key 3
    changelog = spark.createDataFrame(
        [
            (1, "old", "i", 3, 0),
            (2, "newer", "u", 7, 0),
            (3, "born", "i", 6, 0),
        ],
        "k int, v string, _op string, _lsn long, _counter long",
    )
    out = snapshot_plus_changelog(snapshot, changelog, ["k"])
    got = {(r.k, r.v) for r in out.collect()}
    assert got == {(1, "new"), (2, "newer"), (3, "born")}

    # sanity: the naive path regresses k=1 — the watermark is load-bearing
    from transferia_spark.cdc.merge import apply_changelog

    naive = apply_changelog(
        snapshot.drop("_lsn"), changelog, ["k"]
    )
    assert (1, "old") in {(r.k, r.v) for r in naive.collect()}
