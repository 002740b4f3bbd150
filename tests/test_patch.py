"""Minimal-row-image apply (plans/patch.py apply_patch_epoch):
per-column patch folding against stored state — same-key patches to
different columns both land, delete-then-patch re-creates with only the
patched columns, masked NULL really nulls, stale patches drop whole,
replays no-op, and the changelog downstream sees full images."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F, types as T

from clever_canal_spark.lake import LakeTable
from clever_canal_spark.plans import apply_patch_epoch

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("rank", T.IntegerType()),
        T.StructField("lang", T.StringType()),
        T.StructField("note", T.StringType()),
    ]
)

ROW = "url string, rank int, lang string, note string, op string, lsn long, updated_cols array<string>"


@pytest.fixture()
def table(spark):
    d = tempfile.mkdtemp(prefix="ccs-patch-")
    t = LakeTable.create(spark, d, SCHEMA, merge_key=["url"], n_buckets=4)
    t.merge(
        spark.createDataFrame(
            [(f"u{i}", i, "en", f"n{i}", "I", i + 1) for i in range(8)],
            "url string, rank int, lang string, note string, op string, lsn long",
        ),
        epoch_id=0, mode="mor", lsn_col="lsn",
    )
    yield t
    shutil.rmtree(d, ignore_errors=True)


def patch(spark, rows):
    return spark.createDataFrame(rows, ROW)


def row_of(t, url):
    rows = t.scan().filter(F.col("url") == url).collect()
    return rows[0] if rows else None


def test_two_patches_different_columns_both_land(spark, table):
    b = patch(spark, [
        ("u1", 99, None, None, "U", 100, ["rank"]),
        ("u1", None, "de", None, "U", 101, ["lang"]),
    ])
    apply_patch_epoch(table, b, epoch_id=1)
    r = row_of(table, "u1")
    assert (r["rank"], r["lang"], r["note"]) == (99, "de", "n1")


def test_lsn_order_wins_within_column(spark, table):
    b = patch(spark, [
        ("u2", 50, None, None, "U", 200, ["rank"]),
        ("u2", 40, None, None, "U", 150, ["rank"]),  # older, loses
    ])
    apply_patch_epoch(table, b, epoch_id=1)
    assert row_of(table, "u2")["rank"] == 50


def test_delete_then_patch_recreates_with_only_patched_columns(spark, table):
    b = patch(spark, [
        ("u3", None, None, None, "D", 300, None),
        ("u3", None, "fr", None, "U", 301, ["lang"]),
    ])
    apply_patch_epoch(table, b, epoch_id=1)
    r = row_of(table, "u3")
    assert (r["rank"], r["lang"], r["note"]) == (None, "fr", None)


def test_patch_then_delete_kills_row(spark, table):
    b = patch(spark, [
        ("u4", 77, None, None, "U", 400, ["rank"]),
        ("u4", None, None, None, "D", 401, None),
    ])
    apply_patch_epoch(table, b, epoch_id=1)
    assert row_of(table, "u4") is None


def test_masked_null_really_nulls(spark, table):
    b = patch(spark, [("u5", None, None, None, "U", 500, ["note"])])
    apply_patch_epoch(table, b, epoch_id=1)
    r = row_of(table, "u5")
    assert r["note"] is None and r["rank"] == 5 and r["lang"] == "en"


def test_stale_patch_drops_whole(spark, table):
    # u6's stored winner is at lsn 7; a patch at lsn 3 must not apply,
    # must not touch the row, and must not re-emit it in the changelog
    v0 = table.current_version()
    b = patch(spark, [("u6", 999, None, None, "U", 3, ["rank"])])
    apply_patch_epoch(table, b, epoch_id=1)
    assert row_of(table, "u6")["rank"] == 6
    changes = table.scan_changes(v0)
    assert changes.filter(F.col("url") == "u6").count() == 0


def test_replay_noops_and_cross_epoch_fold(spark, table):
    b1 = patch(spark, [("u7", 70, None, None, "U", 700, ["rank"])])
    r1 = apply_patch_epoch(table, b1, epoch_id=1)
    assert r1.applied
    assert not apply_patch_epoch(table, b1, epoch_id=1).applied  # replay
    # epoch 2 patches another column — folds against epoch 1's result
    b2 = patch(spark, [("u7", None, None, "seen", "U", 800, ["note"])])
    apply_patch_epoch(table, b2, epoch_id=2)
    r = row_of(table, "u7")
    assert (r["rank"], r["lang"], r["note"]) == (70, "en", "seen")


def test_patch_insert_of_unknown_key(spark, table):
    b = patch(spark, [("u99", None, "zz", None, "U", 900, ["lang"])])
    apply_patch_epoch(table, b, epoch_id=1)
    r = row_of(table, "u99")
    assert (r["rank"], r["lang"], r["note"]) == (None, "zz", None)


def test_changelog_carries_full_images(spark, table):
    v0 = table.current_version()
    b = patch(spark, [("u1", 11, None, None, "U", 1000, ["rank"])])
    apply_patch_epoch(table, b, epoch_id=1)
    ch = table.scan_changes(v0).filter(F.col("url") == "u1").collect()
    # downstream consumers see the folded FULL row, not the patch
    assert len(ch) == 1
    assert (ch[0]["rank"], ch[0]["lang"], ch[0]["note"]) == (11, "en", "n1")


# --------------------------------------------------------------------------
# Property: random patch sequences, randomly split into epochs, must equal
# a pure-Python reference fold (per-column last-set-after-last-delete).
# --------------------------------------------------------------------------
from hypothesis import given, settings, strategies as st


@pytest.fixture(scope="session")
def spark_global(spark):
    return spark


PCOLS = ["rank", "lang", "note"]


def _ref_fold(events):
    """events: [(key, lsn, op, mask_or_None, {col: val})] — the patch
    semantics in plain Python."""
    by_key = {}
    for key, lsn, op, mask, vals in events:
        by_key.setdefault(key, []).append((lsn, op, mask, vals))
    out = {}
    for key, evs in by_key.items():
        evs.sort()
        dlsn = max((l for l, op, _, _ in evs if op == "D"), default=-1)
        last_op = max(evs)[1]
        if last_op == "D":
            continue
        row = {}
        for c in PCOLS:
            sets = [
                (l, vals.get(c))
                for l, op, mask, vals in evs
                if op != "D" and (mask is None or c in mask)
            ]
            setl, v = max(sets, default=(-1, None))
            row[c] = v if setl > dlsn else None
        out[key] = row
    return out


events_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),                    # key
        st.sampled_from(["I", "U", "D"]),                    # op
        st.one_of(st.none(),                                 # mask (U only)
                  st.sets(st.sampled_from(PCOLS), min_size=1).map(sorted)),
        st.integers(min_value=0, max_value=9),               # value seed
    ),
    min_size=1, max_size=10,
).map(lambda evs: [
    # unique, shuffled-ish lsns: position-derived but interleaved
    (key, (i * 7) % (len(evs) * 7) + 1, op,
     None if op != "U" else mask, {
         "rank": seed, "lang": f"l{seed}", "note": f"n{seed}"
     })
    for i, (key, op, mask, seed) in enumerate(evs)
])


@settings(max_examples=10, deadline=None)
@given(events_strategy, st.integers(min_value=0, max_value=70))
def test_patch_fold_matches_reference_model(spark_global, events, split_at):
    spark = spark_global
    d = tempfile.mkdtemp(prefix="ccs-patch-prop-")
    try:
        t = LakeTable.create(spark, d, SCHEMA, merge_key=["url"], n_buckets=2)
        # split by lsn threshold: respects per-key order across epochs
        # (the documented cross-epoch contract)
        parts = [
            [e for e in events if e[1] <= split_at],
            [e for e in events if e[1] > split_at],
        ]
        eid = 0
        for part in parts:
            if not part:
                continue
            def val(op, mask, vals, c):
                # full image (I, or U with null mask) and masked sets carry
                # the payload; everything else ships NULL
                if op == "D":
                    return None
                return vals[c] if (mask is None or c in mask) else None

            rows = [
                (key, val(op, mask, vals, "rank"), val(op, mask, vals, "lang"),
                 val(op, mask, vals, "note"),
                 op, lsn, None if op != "U" else mask)
                for key, lsn, op, mask, vals in part
            ]
            apply_patch_epoch(t, spark.createDataFrame(rows, ROW), epoch_id=eid)
            eid += 1
        want = _ref_fold(events)
        got = {
            r["url"]: {c: r[c] for c in PCOLS}
            for r in t.scan().collect()
        }
        # the reference treats I as a full-mask set of the SAME payload the
        # Spark side shipped, so plain equality holds
        assert got == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_fold_reads_only_probe_buckets(spark):
    # the stored-winners read under the fold must be bucket-pruned: a
    # 1-key patch on a multi-bucket table opens a strict subset of files
    from clever_canal_spark.plans.patch import _winners_for_keys

    d = tempfile.mkdtemp(prefix="ccs-patch-prune-")
    try:
        t = LakeTable.create(spark, d, SCHEMA, merge_key=["url"], n_buckets=8)
        t.merge(
            spark.createDataFrame(
                [(f"u{i}", i, "en", f"n{i}", "I", i + 1) for i in range(64)],
                "url string, rank int, lang string, note string, op string, lsn long",
            ),
            epoch_id=0, mode="mor", lsn_col="lsn",
        )
        probe = spark.createDataFrame([("u3",)], "url string")
        pruned = _winners_for_keys(t, t.snapshot(), probe)
        assert 0 < len(pruned.inputFiles()) < len(t.scan().inputFiles())
    finally:
        shutil.rmtree(d, ignore_errors=True)
