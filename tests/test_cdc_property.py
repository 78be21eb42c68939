"""Property-based CDC semantics: random I/U/D event logs through
collapse→merge must equal a naive per-event replay.

This is the hypothesis-shaped analog of the reference's
``change_item_test.go`` (1566 LoC of hand-built sequences) and the
canon replication sequences — instead of enumerating cases, we let
hypothesis generate adversarial logs (re-inserts after delete,
repeated updates, interleaved keys, PK-changing updates) and hold the
engine to the one true spec: a dict replayed event by event.

Spark-backed examples are expensive, so the suite batches many random
logs per Spark job: hypothesis drives the LOG GENERATION, and each
example's replay/merge comparison runs over one combined frame.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from transferia_spark.cdc.changeitem import COUNTER_COL, LSN_COL, OP_COL
from transferia_spark.cdc.collapse import collapse
from transferia_spark.cdc.merge import apply_changelog

SCHEMA = (
    f"k int, v string, {OP_COL} string, {LSN_COL} long, {COUNTER_COL} long"
)

# one event: (key, op, value); lsn is the position in the log
events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),          # key space: collisions likely
        st.sampled_from(["i", "u", "d"]),
        st.one_of(st.none(), st.text("abc", max_size=3)),
    ),
    min_size=0,
    max_size=24,
)


def _replay(initial: dict[int, str | None], log) -> dict[int, str | None]:
    """The executable spec: apply events one at a time to a dict.
    Insert/update upsert the value (the at-least-once idempotent-apply
    contract: an update to a missing key materializes it, matching
    MERGE semantics); delete removes the key."""
    state = dict(initial)
    for k, op, v in log:
        if op == "d":
            state.pop(k, None)
        else:
            state[k] = v
    return state


def _frame(spark, log, key_offset: int):
    rows = [
        (k + key_offset, v, op, i + 1, 0) for i, (k, op, v) in enumerate(log)
    ]
    return spark.createDataFrame(rows, SCHEMA) if rows else None


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(logs=st.lists(events_strategy, min_size=1, max_size=6))
@pytest.mark.slow
def test_collapse_then_merge_equals_naive_replay(spark, logs):
    """N independent random logs (disjoint key ranges so one Spark job
    checks them all): apply_changelog(empty, log) == dict replay."""
    frames, expected = [], {}
    for i, log in enumerate(logs):
        off = i * 1000
        f = _frame(spark, log, off)
        if f is not None:
            frames.append(f)
        for k, v in _replay({}, log).items():
            expected[k + off] = v
    if not frames:
        return
    combined = frames[0]
    for f in frames[1:]:
        combined = combined.unionByName(f)
    target = spark.createDataFrame([], "k int, v string")
    out = apply_changelog(target, combined, ["k"])
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == expected


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(log=events_strategy)
@pytest.mark.slow
def test_split_application_is_batch_size_independent(spark, log):
    """Applying the log in one batch == applying any prefix then the
    rest — the micro-batch boundary must be invisible."""
    if len(log) < 2:
        return
    cut = len(log) // 2
    target = spark.createDataFrame([], "k int, v string")

    whole = _frame(spark, log, 0)
    one_shot = apply_changelog(target, whole, ["k"])

    first = apply_changelog(target, _frame(spark, log[:cut], 0), ["k"])
    rest_rows = [
        (k, v, op, cut + i + 1, 0) for i, (k, op, v) in enumerate(log[cut:])
    ]
    rest = spark.createDataFrame(rest_rows, SCHEMA)
    two_shot = apply_changelog(first, rest, ["k"])

    assert {tuple(r) for r in one_shot.collect()} == {
        tuple(r) for r in two_shot.collect()
    }


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(log=events_strategy)
def test_collapse_net_effect_properties(spark, log):
    """Structural invariants of collapse on any log: one row per key,
    delete-net keys carry _op='d' with NULL payload, max lsn kept."""
    f = _frame(spark, log, 0)
    if f is None:
        return
    out = collapse(f, ["k"]).collect()
    seen_keys = {k for k, _, _ in log}
    assert len(out) == len({r["k"] for r in out})
    # every key with any event yields exactly one net row — born-and-dead
    # keys are emitted as idempotent deletes, never silently dropped
    assert {r["k"] for r in out} == seen_keys
    by_key = {r["k"]: r for r in out}
    state = _replay({}, log)
    for k, r in by_key.items():
        if k not in state:
            assert r[OP_COL] == "d" and r["v"] is None
        else:
            assert r["v"] == state[k]


def test_born_and_dead_key_emits_idempotent_delete(spark):
    """Regression for the r3 falsifying example: log
    ``[(2,'i') | (2,'i'), (2,'d')]`` split at the bar. Batch 1 inserts
    key 2; batch 2 folds i→d for the same key. Eliding the i→d pair
    (the old behavior) leaves the stale row from batch 1 alive; the fix
    emits ``_op='d'`` so split application matches one-shot."""
    target = spark.createDataFrame([], "k int, v string")
    full = [(0, "a", "i", 1, 0), (2, "x", "i", 2, 0), (2, "y", "i", 3, 0), (2, None, "d", 4, 0)]
    one_shot = apply_changelog(target, spark.createDataFrame(full, SCHEMA), ["k"])
    first = apply_changelog(
        target, spark.createDataFrame(full[:2], SCHEMA), ["k"]
    )
    two_shot = apply_changelog(
        first, spark.createDataFrame(full[2:], SCHEMA), ["k"]
    )
    expect = {(0, "a")}
    assert {tuple(r) for r in one_shot.collect()} == expect
    assert {tuple(r) for r in two_shot.collect()} == expect
    # collapse itself: the born-and-dead key surfaces as a net delete
    net = collapse(spark.createDataFrame(full[2:], SCHEMA), ["k"]).collect()
    (row,) = net
    assert row["k"] == 2 and row[OP_COL] == "d" and row["v"] is None


# ------------------------------------------------- partial-row (TOAST)

PARTIAL_SCHEMA = (
    f"k int, a string, b string, {OP_COL} string, {LSN_COL} long, "
    f"{COUNTER_COL} long, _present array<string>"
)

# one event: (key, op, carried) where carried maps a SUBSET of {a, b}
# to values (None = genuine NULL write); deletes carry nothing
partial_events = st.lists(
    st.tuples(
        st.integers(0, 3),
        st.sampled_from(["i", "u", "d"]),
        st.dictionaries(
            st.sampled_from(["a", "b"]),
            st.one_of(st.none(), st.text("xy", max_size=2)),
            max_size=2,
        ),
    ),
    min_size=2,
    max_size=16,
)


def _partial_frame(spark, log, base_lsn=0):
    rows = []
    for i, (k, op, carried) in enumerate(log):
        if op == "d":
            rows.append((k, None, None, "d", base_lsn + i + 1, 0, None))
        else:
            rows.append((
                k,
                carried.get("a"),
                carried.get("b"),
                op,
                base_lsn + i + 1,
                0,
                ["k", *sorted(carried)],
            ))
    return spark.createDataFrame(rows, PARTIAL_SCHEMA)


def _partial_replay(log):
    """The executable spec: carried columns overwrite (NULL included),
    absent columns keep their value; an update to a missing key
    materializes it with only the carried columns."""
    state: dict[int, dict] = {}
    for k, op, carried in log:
        if op == "d":
            state.pop(k, None)
        else:
            row = state.setdefault(k, {"a": None, "b": None})
            for c, v in carried.items():
                row[c] = v
    return {k: (r["a"], r["b"]) for k, r in state.items()}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(log=partial_events)
@pytest.mark.slow
def test_partial_update_split_application_is_batch_size_independent(spark, log):
    """TOAST/partial rows: applying the log in one batch == any prefix
    then the rest == the per-event dict replay. The _present contract
    (absent vs carried-NULL) must survive micro-batch boundaries —
    the same invariant class as the r3 born-and-dead bug."""
    target = spark.createDataFrame([], "k int, a string, b string")

    one_shot = apply_changelog(target, _partial_frame(spark, log), ["k"])
    expected = {
        (k, a, b) for k, (a, b) in _partial_replay(log).items()
    }
    assert {tuple(r) for r in one_shot.collect()} == expected

    cut = len(log) // 2
    first = apply_changelog(target, _partial_frame(spark, log[:cut]), ["k"])
    two_shot = apply_changelog(
        first, _partial_frame(spark, log[cut:], base_lsn=cut), ["k"]
    )
    assert {tuple(r) for r in two_shot.collect()} == expected
