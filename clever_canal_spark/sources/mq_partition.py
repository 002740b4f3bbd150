"""MQ topic/partition routing — the CanalMQConfig surface rebuilt.

The reference carries the MQ sink's routing config (CanalMQConfig.java:1-14:
``topic``, ``partition``, ``partitionsNum``, ``partitionHash``,
``dynamicTopic``) and its producer partitions FlatMessages so that one
key's events always land in one MQ partition (per-key ordering survives a
partitioned queue; upstream Canal's MQMessageUtils implements the hash).
Here the routing is two pure JVM expressions — no UDF, no shuffle — added
as ``mq_topic`` / ``mq_partition`` columns, so a 100-TB feed routes at
scan speed and the partitioned export write is a plain ``partitionBy``.

Semantics (Canal's documented config grammar):

- ``dynamic_topic``: ordered ``(topic, pattern)`` rules matched against
  ``schema.table``; first full-regex match wins. ``topic=None`` (a bare
  pattern entry in the config string) names the topic after the matched
  ``schema.table`` itself. No match → the static default ``topic``.
- ``partition_hash``: ordered ``(pattern, hash_cols)`` rules; the first
  matching rule hashes its columns (the ``$pk$`` sentinel expands to the
  table's primary-key columns) → ``u32(md5) % partitions_num``. No match
  → partition 0 (Canal's default partition). A fixed ``partition``
  overrides everything.
- Hash inputs are null-safe (NULL → '', Canal sends null-pk rows to a
  stable partition) and joined with an ASCII unit separator so column
  boundaries can't alias (``('ab','c')`` ≠ ``('a','bc')``).

The hash is the repo-wide md5-u32 (deterministic, engine-portable — a
DuckDB oracle reproduces every assignment bit-for-bit) rather than Java
``String.hashCode``: the contract is a *stable* key→partition mapping,
not hashCode compatibility.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

PK_SENTINEL = "$pk$"
_SEP = 31  # ASCII unit separator


def _lit(pat: str, dialect: str) -> str:
    """Regex pattern as a string literal. Spark SQL string literals eat
    backslashes (``'\\.'`` → ``.``) so they double; DuckDB's don't."""
    if dialect == "spark":
        return "'" + pat.replace("\\", "\\\\").replace("'", "''") + "'"
    return "'" + pat.replace("'", "''") + "'"


def _full_match(subject: str, pat: str, dialect: str) -> str:
    if dialect == "spark":
        return f"{subject} RLIKE {_lit('^(?:' + pat + ')$', dialect)}"
    return f"regexp_full_match({subject}, {_lit(pat, dialect)})"


def _u32(x: str, dialect: str) -> str:
    if dialect == "spark":
        return f"CAST(conv(substring(md5({x}), 1, 8), 16, 10) AS BIGINT)"
    return f"('0x' || substr(md5({x}), 1, 8))::BIGINT"


def _hash_key(cols: list[str], dialect: str) -> str:
    sep = f"char({_SEP})" if dialect == "spark" else f"chr({_SEP})"
    parts = ", ".join(f"coalesce(CAST({c} AS STRING), '')" for c in cols)
    if dialect != "spark":
        parts = ", ".join(f"coalesce(CAST({c} AS VARCHAR), '')" for c in cols)
    return f"concat_ws({sep}, {parts})"


@dataclass(frozen=True)
class MQRoutingConfig:
    """CanalMQConfig.java:1-14 as a frozen config value.

    ``partition_hash`` entries are ``(schema.table regex, hash columns)``;
    ``dynamic_topic`` entries are ``(topic or None, regex)`` where None
    means "topic = the matched schema.table string itself"."""

    topic: str = "default"
    partitions_num: int = 1
    partition: int | None = None
    partition_hash: tuple = field(default_factory=tuple)
    dynamic_topic: tuple = field(default_factory=tuple)

    def __post_init__(self):
        if self.partitions_num < 1:
            raise ValueError("partitions_num must be >= 1")
        if self.partition is not None and not (
            0 <= self.partition < self.partitions_num
        ):
            raise ValueError(
                f"fixed partition {self.partition} outside [0, {self.partitions_num})"
            )


def parse_mq_properties(props: dict) -> MQRoutingConfig:
    """Parse the Canal instance-properties grammar into a config.

    Accepted keys (the ``canal.mq.`` prefix is optional):
    ``topic``, ``partition``, ``partitionsNum``,
    ``partitionHash`` = ``"db\\.tbl:pk1^pk2,db\\..*:$pk$,log\\..*"`` — an
    entry WITHOUT ``:cols`` is Canal's table-name hash mode (every row of
    a matched table lands on one partition keyed by schema.table; note a
    cols-only typo like ``"url^cents"`` therefore parses as a table
    regex that matches nothing, exactly as Canal would treat it),
    ``dynamicTopic`` = ``"topicA:db\\.tbl,db\\..*"`` (a bare entry routes
    to a topic named after the matched schema.table)."""

    def get(k: str):
        return props.get(f"canal.mq.{k}", props.get(k))

    hash_rules = []
    for entry in (get("partitionHash") or "").split(","):
        entry = entry.strip()
        if not entry:
            continue
        pat, _, cols = entry.rpartition(":")
        if not pat:
            # pattern-only entry = Canal's table-name hash mode ("如果不指定
            # 主键，则按照表名进行hash" — MQMessageUtils falls back to hashing
            # database_table when no pk columns are configured): every row
            # of a matched table lands on ONE partition keyed by its name.
            # Encoded as an empty cols tuple.
            if "^" in entry:
                # lenient Canal parsing keeps this a (never-matching) table
                # regex, but '^' is the COLUMN separator — a cols-only typo
                # like "url^cents" (missing the "db\\.tbl:" prefix) is far
                # likelier than a caret-anchored table pattern; warn so the
                # misroute (everything → ELSE partition 0) is discoverable
                # without breaking Canal config compatibility.
                import warnings

                warnings.warn(
                    f"partitionHash entry {entry!r} has no ':cols' part but "
                    "contains '^' (the column separator) — parsed as a "
                    "table-name pattern, which likely matches nothing. "
                    "Did you mean 'db\\\\.tbl:" + entry + "'?",
                    stacklevel=2,
                )
            hash_rules.append((entry, ()))
            continue
        hash_rules.append((pat, tuple(c.strip() for c in cols.split("^") if c.strip())))
    topic_rules = []
    for entry in (get("dynamicTopic") or "").split(","):
        entry = entry.strip()
        if not entry:
            continue
        name, _, pat = entry.partition(":")
        if not pat:  # bare pattern → self-named topic
            topic_rules.append((None, name))
        else:
            topic_rules.append((name, pat))
    return MQRoutingConfig(
        topic=get("topic") or "default",
        partitions_num=int(get("partitionsNum") or 1),
        partition=None if get("partition") in (None, "") else int(get("partition")),
        partition_hash=tuple(hash_rules),
        dynamic_topic=tuple(topic_rules),
    )


def mq_topic_expr(
    cfg: MQRoutingConfig,
    schema_col: str = "schema_name",
    table_col: str = "table_name",
    dialect: str = "spark",
) -> str:
    """SQL expression for the destination topic of each event."""
    name = f"concat({schema_col}, '.', {table_col})"
    if not cfg.dynamic_topic:
        return _lit(cfg.topic, dialect)
    branches = []
    for topic, pat in cfg.dynamic_topic:
        value = _lit(topic, dialect) if topic is not None else name
        branches.append(f"WHEN {_full_match(name, pat, dialect)} THEN {value}")
    return "CASE " + " ".join(branches) + f" ELSE {_lit(cfg.topic, dialect)} END"


def mq_partition_expr(
    cfg: MQRoutingConfig,
    pk_cols: "list[str] | tuple[str, ...]" = (),
    colmap: "dict[str, str] | None" = None,
    schema_col: str = "schema_name",
    table_col: str = "table_name",
    dialect: str = "spark",
) -> str:
    """SQL expression for the destination partition of each event.

    ``colmap`` maps a rule's logical column name to the SQL expression
    that reads it in the caller's frame (feed rows keep payloads inside
    ``before``/``after`` structs: pass e.g.
    ``{"url": "coalesce(after.url, before.url)"}``). Unmapped names are
    used verbatim."""
    if cfg.partition is not None:
        return f"CAST({cfg.partition} AS INT)"
    if not cfg.partition_hash or cfg.partitions_num == 1:
        return "CAST(0 AS INT)"
    colmap = colmap or {}
    name = f"concat({schema_col}, '.', {table_col})"
    salt = _lit("mq", dialect)
    branches = []
    for pat, cols in cfg.partition_hash:
        logical = []
        for c in cols:
            if c == PK_SENTINEL:
                if not pk_cols:
                    raise ValueError(f"rule {pat!r} uses $pk$ but pk_cols is empty")
                logical.extend(pk_cols)
            else:
                logical.append(c)
        if logical:
            exprs = [colmap.get(c, c) for c in logical]
        else:
            # pattern-only rule: table-name hash — the whole table maps to
            # one stable partition (Canal's no-pk fallback)
            exprs = [name]
        key = f"concat({salt}, {_hash_key(exprs, dialect)})"
        branches.append(
            f"WHEN {_full_match(name, pat, dialect)} THEN "
            f"CAST({_u32(key, dialect)} % {cfg.partitions_num} AS INT)"
        )
    return "CASE " + " ".join(branches) + " ELSE CAST(0 AS INT) END"


def assign_mq_routing(
    df: DataFrame,
    cfg: MQRoutingConfig,
    pk_cols: "list[str] | tuple[str, ...]" = (),
    colmap: "dict[str, str] | None" = None,
    schema_col: str = "schema_name",
    table_col: str = "table_name",
) -> DataFrame:
    """Add ``mq_topic`` / ``mq_partition`` columns — two map-only JVM
    expressions, so routing rides the scan (no shuffle; the partitioned
    sink write is the only exchange, and it's the one the queue needs)."""
    return df.withColumn(
        "mq_topic", F.expr(mq_topic_expr(cfg, schema_col, table_col))
    ).withColumn(
        "mq_partition",
        F.expr(mq_partition_expr(cfg, pk_cols, colmap, schema_col, table_col)),
    )
