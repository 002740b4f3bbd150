"""Schema evolution via the DDL channel (SURVEY.md §3.3 / test plan item 4):
add/rename/widen interleaved at known LSNs; DML applied before a DDL's LSN
sees the old schema, after it the new; replay is idempotent."""

from pyspark.sql import functions as F

from clever_canal_spark.gen import DdlSpec, FeedConfig, generate_feed
from clever_canal_spark.lake import LakeTable
from clever_canal_spark.model import (
    DDL_ADD_COLUMN,
    DDL_RENAME_COLUMN,
    DDL_WIDEN_TYPE,
    PAGE_SCHEMA,
)
from clever_canal_spark.plans import ApplyConfig, apply_epoch, apply_ddl_idempotent


def test_ddl_add_mid_epoch_segments(spark, tmp_table_dir):
    cfgf = FeedConfig(
        n_events=600,
        n_urls=50,
        seed=31,
        ddls=[
            DdlSpec(lsn=200, ddl_type=DDL_ADD_COLUMN, column="quality", new_type="double",
                    sql="ALTER TABLE cc.pages ADD COLUMN quality double"),
            DdlSpec(lsn=400, ddl_type=DDL_RENAME_COLUMN, column="quality", new_name="score",
                    sql="ALTER TABLE cc.pages RENAME COLUMN quality TO score"),
        ],
    )
    feed = generate_feed(spark, cfgf).cache()
    table = LakeTable.create(
        spark, tmp_table_dir, PAGE_SCHEMA, merge_key=["url", "warc_ts"], n_buckets=4
    )
    res = apply_epoch(spark, feed, 0, table, ApplyConfig(merge_mode="mor"))
    assert res.segments == 3 and res.ddls_applied == 2

    cols = [f.name for f in table.schema().fields]
    assert "score" in cols and "quality" not in cols
    # all rows readable through the evolved schema; evolved col is null
    rows = table.scan().collect()
    assert len(rows) > 10
    assert all(r["score"] is None for r in rows)

    # replay the whole epoch: no-ops everywhere (exactly-once incl. DDL)
    v = table.current_version()
    res2 = apply_epoch(spark, feed, 0, table, ApplyConfig(merge_mode="mor"))
    assert not res2.applied or table.current_version() == v
    assert table.current_version() == v
    feed.unpersist()


def test_ddl_widen_idempotent(spark, tmp_table_dir):
    from pyspark.sql import types as T

    table = LakeTable.create(
        spark,
        tmp_table_dir,
        T.StructType([T.StructField("url", T.StringType()), T.StructField("n", T.IntegerType())]),
        merge_key=["url"],
        n_buckets=2,
    )
    row = {"ddl_type": DDL_WIDEN_TYPE, "ddl_column": "n", "ddl_new_name": None, "ddl_new_type": "bigint"}
    assert apply_ddl_idempotent(table, row) is True
    assert apply_ddl_idempotent(table, row) is False  # replay no-op
    assert dict(table.scan().dtypes)["n"] == "bigint"


def test_ddl_segment_boundary_values(spark, tmp_table_dir):
    """Rows with lsn < ddl_lsn are merged before the schema change, rows
    after it through the new schema — both visible and consistent at the
    end (the E3 DML<ddl → ddl → DML>ddl ordering)."""
    cfgf = FeedConfig(
        n_events=100, n_urls=100, versions_per_url=1, insert_pct=100, delete_pct=0,
        seed=77,
        ddls=[DdlSpec(lsn=50, ddl_type=DDL_ADD_COLUMN, column="rank", new_type="bigint",
                      sql="ALTER TABLE cc.pages ADD COLUMN rank bigint")],
    )
    feed = generate_feed(spark, cfgf)
    table = LakeTable.create(
        spark, tmp_table_dir, PAGE_SCHEMA, merge_key=["url", "warc_ts"], n_buckets=4
    )
    apply_epoch(spark, feed, 0, table, ApplyConfig(merge_mode="mor", transform=False))
    snap = table.snapshot()
    svs = {f["schema_version"] for f in snap.files + snap.delta_files}
    assert len(svs) == 2  # files written under both schema versions
    expected_keys = (
        feed.filter(F.col("kind") == "ROW")
        .select("after.url", "after.warc_ts")
        .distinct()
        .count()
    )
    assert table.scan().count() == expected_keys


def test_ddl_sql_only_spec_parses_and_rejects_half_filled(spark, tmp_table_dir):
    """A DdlSpec carrying ONLY raw SQL (structured fields defaulted) must
    evolve the schema via the SQL parser — regression for a half-filled DDL
    row reaching the schema store and adding a None-named column."""
    import pytest

    cfgf = FeedConfig(
        n_events=300, n_urls=30, seed=77,
        ddls=[DdlSpec(lsn=150, sql="ALTER TABLE cc.pages ADD COLUMN fetch_ms BIGINT")],
    )
    feed = generate_feed(spark, cfgf)
    table = LakeTable.create(
        spark, tmp_table_dir, PAGE_SCHEMA, merge_key=["url", "warc_ts"], n_buckets=4
    )
    res = apply_epoch(spark, feed, 0, table, ApplyConfig(merge_mode="mor"))
    assert res.ddls_applied == 1
    cols = [f.name for f in table.schema().fields]
    assert "fetch_ms" in cols and None not in cols
    assert table.scan().count() > 0  # table still readable post-evolution

    # a row with a type but neither column nor parseable SQL is rejected,
    # never silently applied
    with pytest.raises(ValueError, match="no ddl_column"):
        apply_ddl_idempotent(table, {"ddl_type": DDL_ADD_COLUMN, "ddl_column": None,
                                     "ddl_sql": None, "ddl_new_name": None,
                                     "ddl_new_type": None})
    with pytest.raises(ValueError, match="invalid column name"):
        table.add_column(None, "string")


def test_drop_column_and_readd_no_resurrection(spark, tmp_table_dir):
    """DROP COLUMN projects the column away everywhere; re-adding the same
    name allocates a FRESH field id, so the dropped files' bytes stay dead
    (Iceberg deleteColumn + field-id freshness)."""
    import pytest
    from pyspark.sql import types as T

    table = LakeTable.create(
        spark, tmp_table_dir,
        T.StructType([
            T.StructField("url", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("rank", T.LongType()),
        ]),
        merge_key=["url"], n_buckets=2,
    )
    table.append(spark.createDataFrame(
        [("u1", "en", 1), ("u2", "de", 2)], "url string, lang string, rank long"
    ))
    assert {r["lang"] for r in table.scan().collect()} == {"en", "de"}

    table.drop_column("lang")
    assert "lang" not in [f.name for f in table.schema().fields]
    assert table.scan().count() == 2  # rows survive, column gone

    # re-add under the same name: NEW field id -> old values must NOT return
    table.add_column("lang", "string")
    rows = {r["url"]: r["lang"] for r in table.scan().collect()}
    assert rows == {"u1": None, "u2": None}

    # key/bucket columns are protected
    with pytest.raises(ValueError, match="key/bucket"):
        table.drop_column("url")


def test_ddl_drop_column_via_sql_channel(spark, tmp_table_dir):
    """Raw-SQL DROP COLUMN through the DDL channel: applies once, replays
    as a no-op; ADD INDEX-family statements never touch the schema."""
    table = LakeTable.create(
        spark, tmp_table_dir, PAGE_SCHEMA, merge_key=["url", "warc_ts"], n_buckets=2
    )
    row = {"ddl_sql": "ALTER TABLE cc.pages DROP COLUMN lang"}
    assert apply_ddl_idempotent(table, row) is True
    assert "lang" not in [f.name for f in table.schema().fields]
    assert apply_ddl_idempotent(table, row) is False  # replay no-op

    # the round-2 bug shape: index/constraint DDL must be a schema no-op
    before = [f.name for f in table.schema().fields]
    for sql in (
        "ALTER TABLE cc.pages ADD INDEX idx_u (url)",
        "ALTER TABLE cc.pages ADD PRIMARY KEY (url)",
        "ALTER TABLE cc.pages ADD CONSTRAINT ck CHECK (1=1)",
        "ALTER TABLE cc.pages DROP INDEX idx_u",
    ):
        assert apply_ddl_idempotent(table, {"ddl_sql": sql}) is False, sql
    assert [f.name for f in table.schema().fields] == before


def test_ddl_multi_clause_alter_applies_every_clause(spark, tmp_table_dir):
    """ALTER ... ADD COLUMN a, ADD COLUMN b, DROP COLUMN lang applies ALL
    three clauses (Druid AST iteration analog), idempotently on replay."""
    table = LakeTable.create(
        spark, tmp_table_dir, PAGE_SCHEMA, merge_key=["url", "warc_ts"], n_buckets=2
    )
    row = {"ddl_sql": ("ALTER TABLE cc.pages ADD COLUMN a int, "
                       "ADD COLUMN b bigint, DROP COLUMN lang")}
    assert apply_ddl_idempotent(table, row) is True
    cols = [f.name for f in table.schema().fields]
    assert "a" in cols and "b" in cols and "lang" not in cols
    v = table.current_version()
    assert apply_ddl_idempotent(table, row) is False  # full replay no-op
    assert table.current_version() == v

    # CHANGE = rename (+legal widen): b -> c bigint stays bigint,
    # a (int) -> a2 bigint renames AND widens
    assert apply_ddl_idempotent(
        table, {"ddl_sql": "ALTER TABLE cc.pages CHANGE COLUMN a a2 bigint"}
    ) is True
    f = {x["name"]: x["type"] for x in table.snapshot().current_fields()}
    assert "a" not in f and f["a2"] == "bigint"


def test_ddl_change_same_name_retype(spark, tmp_table_dir):
    """MySQL's retype-without-rename idiom ``CHANGE COLUMN a a bigint``
    must widen (not crash on rename-to-self), and replay as a no-op."""
    table = LakeTable.create(
        spark, tmp_table_dir, PAGE_SCHEMA, merge_key=["url", "warc_ts"], n_buckets=2
    )
    table.add_column("n", "int")
    row = {"ddl_sql": "ALTER TABLE cc.pages CHANGE COLUMN n n bigint"}
    assert apply_ddl_idempotent(table, row) is True
    f = {x["name"]: x["type"] for x in table.snapshot().current_fields()}
    assert f["n"] == "bigint"
    assert apply_ddl_idempotent(table, row) is False  # replay no-op

    # same-name CHANGE to the SAME type: pure no-op, never an error
    assert apply_ddl_idempotent(
        table, {"ddl_sql": "ALTER TABLE cc.pages CHANGE COLUMN n n bigint"}
    ) is False

    # MODIFY (the WIDEN_TYPE classification): legal promotion applies,
    # a NON-widening retype from the SQL channel no-ops instead of
    # crashing the apply loop on widen_column's illegal-widen guard
    table.add_column("m", "int")
    assert apply_ddl_idempotent(
        table, {"ddl_sql": "ALTER TABLE cc.pages MODIFY COLUMN m double"}
    ) is True
    assert apply_ddl_idempotent(
        table, {"ddl_sql": "ALTER TABLE cc.pages MODIFY COLUMN m varchar(50)"}
    ) is False  # not a legal widen -> lake schema unchanged, no crash
    f = {x["name"]: x["type"] for x in table.snapshot().current_fields()}
    assert f["m"] == "double"


def test_ddl_change_replay_recovers_lost_widen(spark, tmp_table_dir):
    """Crash between the rename commit and the widen commit of a
    ``CHANGE a b bigint``: the replayed statement must still widen b
    even though the rename half already applied."""
    table = LakeTable.create(
        spark, tmp_table_dir, PAGE_SCHEMA, merge_key=["url", "warc_ts"], n_buckets=2
    )
    table.add_column("a", "int")
    # simulate the half-applied state: rename committed, widen lost
    table.rename_column("a", "b")
    row = {"ddl_sql": "ALTER TABLE cc.pages CHANGE COLUMN a b bigint"}
    assert apply_ddl_idempotent(table, row) is True  # widen still applies
    f = {x["name"]: x["type"] for x in table.snapshot().current_fields()}
    assert "a" not in f and f["b"] == "bigint"
    assert apply_ddl_idempotent(table, row) is False  # full replay no-op


def test_add_column_with_default_initial_default_semantics(spark, tmp_table_dir):
    """ADD COLUMN ... DEFAULT x (Iceberg v3 initial-default analog): rows
    written BEFORE the DDL read the default; rows written after read
    their real values, and an explicit post-DDL null STAYS null (the
    default never back-fills live writes). Replay no-ops; a malformed
    literal fails at DDL time, not at scan time."""
    import pytest as _pytest

    table = LakeTable.create(
        spark, tmp_table_dir, PAGE_SCHEMA, merge_key=["url", "warc_ts"], n_buckets=2
    )
    pre = spark.createDataFrame(
        [("u1", "2024-01-01 00:00:00", "old row", "U", 10)],
        "url string, warc_ts string, text string, op string, lsn bigint",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts")) \
     .withColumn("html", F.lit(None).cast("binary")) \
     .withColumn("lang", F.lit("en"))
    table.merge(pre, epoch_id=1, op_col="op", mode="mor", lsn_col="lsn")

    changed = apply_ddl_idempotent(table, {
        "ddl_sql": "ALTER TABLE cc.pages ADD COLUMN score int NOT NULL DEFAULT 7",
    })
    assert changed
    # replay no-op
    assert not apply_ddl_idempotent(table, {
        "ddl_sql": "ALTER TABLE cc.pages ADD COLUMN score int NOT NULL DEFAULT 7",
    })

    post = spark.createDataFrame(
        [("u2", "2024-01-02 00:00:00", "new row", "U", 20, 42),
         ("u3", "2024-01-03 00:00:00", "null row", "U", 21, None)],
        "url string, warc_ts string, text string, op string, lsn bigint, score int",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts")) \
     .withColumn("html", F.lit(None).cast("binary")) \
     .withColumn("lang", F.lit("en"))
    table.merge(post, epoch_id=2, op_col="op", mode="mor", lsn_col="lsn")

    got = {r["url"]: r["score"] for r in table.scan().collect()}
    assert got == {"u1": 7, "u2": 42, "u3": None}

    # a fresh handle (no cached snapshot) reads the same defaults
    got2 = {r["url"]: r["score"] for r in LakeTable(spark, tmp_table_dir).scan().collect()}
    assert got2 == got

    # string default via the SQL channel, with quotes
    assert apply_ddl_idempotent(table, {
        "ddl_sql": "ALTER TABLE cc.pages ADD COLUMN tag varchar(8) DEFAULT 'web'",
    })
    tags = {r["url"]: r["tag"] for r in table.scan().collect()}
    assert tags == {"u1": "web", "u2": "web", "u3": "web"}

    # malformed literal: rejected at DDL-apply time (never a scan poison)
    with _pytest.raises(ValueError, match="illegal DEFAULT"):
        table.add_column("bad", "int", default="not-a-number")


def test_merge_fill_missing_after_add_column(spark, tmp_table_dir):
    """A producer that predates an ADD COLUMN keeps working with
    merge(fill_missing=True): the absent payload column fills with the
    column's write default (its initial_default) or null; absent KEY
    columns always raise; without the flag the merge fails analysis."""
    import pytest as _pytest
    from pyspark.sql.utils import AnalysisException

    table = LakeTable.create(
        spark, tmp_table_dir, PAGE_SCHEMA, merge_key=["url", "warc_ts"], n_buckets=2
    )
    table.add_column("score", "int", default=7)
    table.add_column("note", "string")  # no default -> null fill

    old_producer = spark.createDataFrame(
        [("u1", "2024-01-01 00:00:00", "body", "U", 10)],
        "url string, warc_ts string, text string, op string, lsn bigint",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts")) \
     .withColumn("html", F.lit(None).cast("binary")) \
     .withColumn("lang", F.lit("en"))

    with _pytest.raises(AnalysisException):
        table.merge(old_producer, epoch_id=1, op_col="op", mode="mor", lsn_col="lsn")
    res = table.merge(
        old_producer, epoch_id=1, op_col="op", mode="mor", lsn_col="lsn",
        fill_missing=True,
    )
    assert res.applied
    row = table.scan().collect()[0]
    assert (row["score"], row["note"]) == (7, None)

    missing_key = old_producer.drop("warc_ts")
    with _pytest.raises(ValueError, match="key/bucket columns"):
        table.merge(missing_key, epoch_id=2, op_col="op", mode="mor",
                    lsn_col="lsn", fill_missing=True)


def test_alter_column_set_drop_default_via_sql_channel(spark, tmp_table_dir):
    """`ALTER COLUMN x SET/DROP DEFAULT` through the DDL channel (r4
    verdict Missing #1): the WRITE default changes for later fill_missing
    merges, existing rows keep the values they were born with (the frozen
    initial-default — MySQL and Iceberg-v3 semantics), replay no-ops, and
    DROP DEFAULT overrides an add-time default with a null fill."""
    table = LakeTable.create(
        spark, tmp_table_dir, PAGE_SCHEMA, merge_key=["url", "warc_ts"], n_buckets=2
    )
    table.add_column("score", "int", default=7)

    def lagging(url, ts, lsn):
        return spark.createDataFrame(
            [(url, ts, "body", "U", lsn)],
            "url string, warc_ts string, text string, op string, lsn bigint",
        ).withColumn("warc_ts", F.to_timestamp("warc_ts")) \
         .withColumn("html", F.lit(None).cast("binary")) \
         .withColumn("lang", F.lit("en"))

    table.merge(lagging("u1", "2024-01-01 00:00:00", 10), epoch_id=1,
                op_col="op", mode="mor", lsn_col="lsn", fill_missing=True)

    sql = "ALTER TABLE cc.pages ALTER COLUMN score SET DEFAULT 9"
    assert apply_ddl_idempotent(table, {"ddl_sql": sql}) is True
    assert apply_ddl_idempotent(table, {"ddl_sql": sql}) is False  # replay

    table.merge(lagging("u2", "2024-01-02 00:00:00", 20), epoch_id=2,
                op_col="op", mode="mor", lsn_col="lsn", fill_missing=True)
    got = {r["url"]: r["score"] for r in table.scan().collect()}
    # u1 was written while the default was 7 and keeps it; u2 fills 9
    assert got == {"u1": 7, "u2": 9}

    drop_sql = "ALTER TABLE cc.pages ALTER COLUMN score DROP DEFAULT"
    assert apply_ddl_idempotent(table, {"ddl_sql": drop_sql}) is True
    assert apply_ddl_idempotent(table, {"ddl_sql": drop_sql}) is False
    table.merge(lagging("u3", "2024-01-03 00:00:00", 30), epoch_id=3,
                op_col="op", mode="mor", lsn_col="lsn", fill_missing=True)
    got = {r["url"]: r["score"] for r in table.scan().collect()}
    assert got == {"u1": 7, "u2": 9, "u3": None}

    # a fresh handle (no cached snapshot) agrees
    got2 = {r["url"]: r["score"] for r in LakeTable(spark, tmp_table_dir).scan().collect()}
    assert got2 == got

    # malformed SET DEFAULT literal fails the apply, never a scan
    import pytest as _pytest

    with _pytest.raises(ValueError, match="illegal DEFAULT"):
        apply_ddl_idempotent(table, {
            "ddl_sql": "ALTER TABLE cc.pages ALTER COLUMN score SET DEFAULT 'nope'",
        })
    # unknown column: hard error (the statement is not valid upstream)
    with _pytest.raises(ValueError, match="unknown column"):
        apply_ddl_idempotent(table, {
            "ddl_sql": "ALTER TABLE cc.pages ALTER COLUMN ghost SET DEFAULT 1",
        })
