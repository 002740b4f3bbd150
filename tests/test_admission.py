"""Dedup admission gate (plans/admission.py): duplicate-content pages are
dropped or tagged at the door, probed against the persisted dedup index."""

import pytest
from pyspark.sql import functions as F

from clever_canal_spark.operators.dedup_index import build_dedup_index, sync_from_lake
from clever_canal_spark.plans import dedup_admission

TS = "2024-01-01 00:00:00"
TS2 = "2024-02-01 00:00:00"


@pytest.fixture()
def index(spark, tmp_table_dir):
    # corpus keyed exactly the way sync_from_lake keys a (url, warc_ts)
    # lake: doc_id = xxhash64(url, warc_ts)
    corpus = spark.createDataFrame(
        [("a", TS, "alpha text"), ("b", TS, "beta text")],
        "url string, warc_ts string, text string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    docs = corpus.select(
        F.xxhash64("url", "warc_ts").alias("doc_id"), "text"
    )
    return build_dedup_index(spark, docs, tmp_table_dir + "/didx")


def feed(spark, rows):
    """rows: (url, warc_ts, text, op, lsn) → feed-shaped batch."""
    df = spark.createDataFrame(
        rows, "url string, warc_ts string, text string, op string, lsn long"
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    return df.select(
        "op", "lsn",
        F.struct("url", "warc_ts", "text").alias("after"),
    )


def urls(df):
    return sorted(r["url"] for r in df.select("after.url").collect())


def test_cross_corpus_dup_dropped(spark, index):
    batch = feed(spark, [
        ("new1", TS, "alpha text", "I", 1),   # dup of corpus doc a
        ("new2", TS, "fresh text", "I", 2),   # admitted
    ])
    res = dedup_admission(batch, index)
    assert urls(res.batch) == ["new2"]
    assert res.rejected.count() == 1


def test_same_doc_reupsert_admitted(spark, index):
    # same (url, warc_ts) as the indexed doc, same text → same doc_id →
    # not a duplicate; updates flow
    batch = feed(spark, [("a", TS, "alpha text", "U", 5)])
    res = dedup_admission(batch, index)
    assert urls(res.batch) == ["a"]


def test_recrawl_new_warcts_is_gated(spark, index):
    # identical content under a fresh warc_ts = new doc_id = duplicate
    batch = feed(spark, [("a", TS2, "alpha text", "I", 5)])
    assert urls(dedup_admission(batch, index).batch) == []


def test_within_batch_keeper(spark, index):
    batch = feed(spark, [
        ("n1", TS, "same new text", "I", 1),
        ("n2", TS, "same new text", "I", 2),
    ])
    out = dedup_admission(batch, index).batch
    # deterministic winner: smallest doc_id, not arrival order
    assert len(urls(out)) == 1
    off = dedup_admission(batch, index, within_batch=False).batch
    assert urls(off) == ["n1", "n2"]


def test_deletes_always_pass(spark, index):
    batch = feed(spark, [
        ("new1", TS, "alpha text", "I", 1),  # dup → dropped
        ("gone", TS, None, "D", 2),          # delete, null image → passes
    ])
    assert urls(dedup_admission(batch, index).batch) == ["gone"]


def test_lww_winner_decides_for_the_doc(spark, index):
    # the doc's final (max-lsn) text is unique → BOTH its events admitted,
    # even though the earlier image duplicated the corpus
    batch = feed(spark, [
        ("n1", TS, "alpha text", "I", 1),
        ("n1", TS, "now unique", "U", 2),
    ])
    assert urls(dedup_admission(batch, index).batch) == ["n1", "n1"]
    # and the reverse: final image is the duplicate → both dropped
    rev = feed(spark, [
        ("n2", TS, "now unique2", "I", 3),
        ("n2", TS, "alpha text", "U", 4),
    ])
    assert urls(dedup_admission(rev, index).batch) == []


def test_tag_mode_keeps_everything(spark, index):
    batch = feed(spark, [
        ("new1", TS, "alpha text", "I", 1),
        ("new2", TS, "fresh text", "I", 2),
    ])
    out = dedup_admission(batch, index, mode="tag").batch
    rows = {r["url"]: r["__dup_of"] for r in
            out.select("after.url", "__dup_of").collect()}
    assert rows["new1"] is not None and rows["new2"] is None


def test_epoch_over_epoch_with_sync(spark, tmp_table_dir, index):
    """Admitted docs become visible to the NEXT epoch's gate after the
    index syncs from the lake — the pipeline's hook order."""
    from clever_canal_spark.lake import LakeTable
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
    ])
    table = LakeTable.create(
        spark, tmp_table_dir + "/lake", schema, merge_key=["url", "warc_ts"],
        n_buckets=2,
    )
    e1 = dedup_admission(feed(spark, [("n1", TS, "wave one text", "I", 1)]), index)
    table.merge(
        e1.batch.select("after.url", "after.warc_ts", "after.text", "op", "lsn"),
        epoch_id=1, mode="mor", lsn_col="lsn",
    )
    assert sync_from_lake(index, table) > 0
    # epoch 2 re-sends the same content under a new url → now gated
    e2 = dedup_admission(feed(spark, [("n9", TS, "wave one text", "I", 9)]), index)
    assert urls(e2.batch) == []


NEAR_BASE = ("the quick brown fox jumps over the lazy dog while the rain "
             "falls gently on the quiet village roofs tonight")


@pytest.fixture()
def near_index(spark, tmp_table_dir):
    docs = spark.createDataFrame(
        [(100, NEAR_BASE), (200, "completely different content here")],
        "doc_id long, text string",
    )
    return build_dedup_index(spark, docs, tmp_table_dir + "/ndidx")


def test_near_dup_gated_only_when_enabled(spark, near_index):
    # one char changed at the tail: distinct md5, ~identical shingles →
    # shares bands with doc 100 (deterministic under the fixed MinHash
    # family, pinned here)
    near_text = NEAR_BASE[:-1] + "!"
    batch = feed(spark, [("nd", TS, near_text, "I", 1)])
    # default (exact-only): admitted — fingerprints differ
    assert urls(dedup_admission(batch, near_index).batch) == ["nd"]
    # near gate on: rejected, dup_of = the indexed near-twin
    res = dedup_admission(batch, near_index, near_min_bands=1)
    assert urls(res.batch) == []
    assert [(r.dup_of_doc_id) for r in res.rejected.collect()] == [100]


def test_near_gate_ignores_unrelated_text(spark, near_index):
    batch = feed(spark, [("fresh", TS, "entirely novel words nowhere else", "I", 1)])
    res = dedup_admission(batch, near_index, near_min_bands=1)
    assert urls(res.batch) == ["fresh"]
    assert res.rejected.count() == 0


def test_near_and_exact_combined(spark, near_index):
    near_text = NEAR_BASE[:-1] + "?"
    batch = feed(spark, [
        ("x1", TS, NEAR_BASE, "I", 1),       # exact dup of doc 100
        ("x2", TS, near_text, "I", 2),       # near dup of doc 100
        ("x3", TS, "unrelated page body entirely", "I", 3),
    ])
    res = dedup_admission(batch, near_index, near_min_bands=1)
    assert urls(res.batch) == ["x3"]
    assert res.rejected.count() == 2


_SYNDICATED = "".join(
    f"shared syndicated article text number {k} that reads the same on "
    "every mirror of the wire service feed and fills the page with "
    "plenty of ordinary words about weather markets and sport "
    for k in range(3)
)


def test_chunk_gate_rejects_shifted_copy(spark, tmp_table_dir):
    """A syndicated body behind a DIFFERENT prefix defeats the exact fp
    (every byte differs) — the chunk gate catches it; unrelated pages
    pass; a chunk-less index raises when the gate is requested."""
    corpus = spark.createDataFrame(
        [("a", TS, "alpha site header before the body " + _SYNDICATED)],
        "url string, warc_ts string, text string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    docs = corpus.select(F.xxhash64("url", "warc_ts").alias("doc_id"), "text")
    idx = build_dedup_index(spark, docs, tmp_table_dir + "/cidx", with_chunks=True)

    batch = feed(spark, [
        ("mirror", TS, "completely different beta prefix " + _SYNDICATED, "I", 1),
        ("fresh", TS, "novel content about sailing across the northern sea "
                      * 5, "I", 2),
    ])
    # without the chunk gate the shifted copy slips through
    assert urls(dedup_admission(batch, idx).batch) == ["fresh", "mirror"]
    res = dedup_admission(batch, idx, chunk_min_shared=2)
    assert urls(res.batch) == ["fresh"]
    assert res.rejected.count() == 1

    plain = build_dedup_index(spark, docs, tmp_table_dir + "/pidx")
    with pytest.raises(ValueError, match="without chunk fingerprints"):
        dedup_admission(batch, plain, chunk_min_shared=2).batch.count()
