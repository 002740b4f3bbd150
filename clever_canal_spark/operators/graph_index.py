"""Changelog-maintained link graph: the web-graph member of the
persisted-index family (exact/near-dup fingerprints, ANN buckets,
inverted text postings — and now hyperlink edges).

``operators/graph.py`` extracts edges in one batch pass; at 10¹⁰ pages
that is the right backfill but the wrong steady state — a CDC epoch
changes a few million pages and the edge set must follow without
re-reading 100 TB of html. This module keeps an ``edges`` LakeTable
(src, dst — keyed by both, physically bucketed by ``src``) in lockstep
with the pages lake's changelog:

- **build** (once): one corpus scan through ``extract_links``; the lake
  cursor pins the bootstrap version so the first sync starts exactly
  there.
- **sync** (per epoch): the change slice names the affected source
  URLs; every live row of those urls re-reads bucket-pruned from the
  pages lake (``scan_for_keys_df`` — the page key is (url, warc_ts), so
  one url may own several live rows and edge recompute must see them
  all, the join-view recompute discipline), links re-extract from that
  O(affected) set, and stale pairs tombstone by set difference. One
  idempotent MOR merge per sync, epoch-keyed by the consumed lake
  version — replays no-op, a crash between merge and cursor re-applies
  value-idempotently (same winners, same LWW outcome).
- **TRUNCATE** mirrors as metadata (``truncates_between``): the pages
  lake erased everything at the watermark, so the edge table erases too
  and tails from the truncate version.

Per-src monotone LSNs make the LWW sound: only events of page ``src``
ever write (src, *) rows, bootstrap rows sit at lsn 0, and every sync
stamps a url's edges with that url's max change LSN in the slice.

The reference stops at row delivery (no graph surface); this is the
beyond-reference training-data composition of axes A (CDC lake) and
B (webtext analytics): `link_graph_pagerank` runs the integer-exact
power iteration over the maintained edges without touching page html.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..lake import LakeTable
from ._cursor import read_lake_cursor, write_lake_cursor
from .graph import extract_links, pagerank

_SIDECAR = "linkgraph.json"

_EDGE_SCHEMA = T.StructType(
    [
        T.StructField("src", T.StringType(), nullable=False),
        T.StructField("dst", T.StringType(), nullable=False),
    ]
)


@dataclass
class LinkGraph:
    edges: LakeTable
    url_col: str
    html_col: str
    canonicalize: bool
    path: str


def _html_as_text(df: DataFrame, html_col: str) -> DataFrame:
    """PAGE_SCHEMA carries html as BINARY; extraction regexes want a
    string column. The cast is a no-op when the column is already
    string-typed."""
    return df.withColumn(html_col, F.col(html_col).cast("string"))


def _edges_of(df: DataFrame, url_col: str, html_col: str, canonicalize: bool) -> DataFrame:
    """Edge extraction for the index. ``src`` always keeps the lake's
    RAW merge-key url — it must join back to the pages table and to the
    per-url LSN stamp — so ``canonicalize`` applies to targets only
    (targets are foreign urls; sources are already this lake's keys)."""
    e = extract_links(
        _html_as_text(df, html_col), url_col=url_col, html_col=html_col,
        canonicalize=False,
    )
    if canonicalize:
        from .text import canonical_url

        e = e.select(
            "src", canonical_url(F.col("dst")).alias("dst")
        ).filter(F.col("src") != F.col("dst"))
    return e.distinct()


def build_link_graph(
    table: LakeTable,
    path: str,
    url_col: str = "url",
    html_col: str = "html",
    canonicalize: bool = False,
    n_buckets: int = 16,
) -> LinkGraph:
    """Bootstrap the edge table from the pages lake's CURRENT state (the
    one corpus-sized read the graph ever costs) and stamp the lake
    cursor at that version. Bootstrap edges carry lsn 0 — any real
    change LSN outranks them, and only page ``src``'s events ever touch
    (src, *) rows, so the LWW stays per-src monotone."""
    head = table.current_version()
    edges = LakeTable.create(
        table.spark, path, _EDGE_SCHEMA, merge_key=["src", "dst"],
        n_buckets=n_buckets,
    )
    seed = _edges_of(table.scan(version=head), url_col, html_col, canonicalize)
    edges.merge(
        seed.withColumn("op", F.lit("U")).withColumn("lsn", F.lit(0).cast("long")),
        epoch_id=0, mode="mor", lsn_col="lsn",
    )
    with open(os.path.join(path, _SIDECAR), "w") as fh:
        json.dump(
            {"url_col": url_col, "html_col": html_col,
             "canonicalize": canonicalize}, fh,
        )
    write_lake_cursor(path, head)
    return LinkGraph(edges, url_col, html_col, canonicalize, path)


def open_link_graph(spark: SparkSession, path: str) -> LinkGraph:
    with open(os.path.join(path, _SIDECAR)) as fh:
        cfg = json.load(fh)
    return LinkGraph(
        LakeTable(spark, path), cfg["url_col"], cfg["html_col"],
        bool(cfg.get("canonicalize", False)), path,
    )


def sync_link_graph_from_lake(lg: LinkGraph, table: LakeTable) -> int:
    """Advance the edge table to the pages lake's head. Work is
    O(changes + affected urls' live rows + their current edges) — the
    corpus is never scanned. Returns lake versions consumed (0 = already
    current)."""
    head = table.current_version()
    synced = read_lake_cursor(lg.path)
    if head <= synced:
        return 0
    truncs = table.truncates_between(synced, head)
    if truncs:
        last = truncs[-1]
        lg.edges.truncate_rows(last["lsn"])
        synced_from = last["version"]
        if synced_from >= head:
            write_lake_cursor(lg.path, head)
            return head - synced
    else:
        synced_from = synced
    url = lg.url_col
    changes = table.scan_changes(synced_from, head)
    # affected urls with their slice-max LSN (the stamp for every edge
    # row this sync writes for that url — per-src monotone)
    affected = (
        changes.groupBy(F.col(url).alias("src"))
        .agg(F.max("__lsn").cast("long").alias("lsn"))
        .localCheckpoint(eager=True)
    )
    try:
        probe = affected.select(F.col("src").alias(url))
        live = table.scan_for_keys_df(probe, version=head)
        new_edges = _edges_of(live, url, lg.html_col, lg.canonicalize)
        old_edges = lg.edges.scan_for_keys_df(affected.select("src"))
        stale = old_edges.join(new_edges, ["src", "dst"], "left_anti")
        delta = new_edges.withColumn("op", F.lit("U")).unionByName(
            stale.withColumn("op", F.lit("D"))
        ).join(affected, "src")
        lg.edges.merge(delta, epoch_id=head, mode="mor", lsn_col="lsn")
        write_lake_cursor(lg.path, head)
    finally:
        from ..ckpt import free_checkpoint

        free_checkpoint(affected)
    return head - synced


def link_graph_pagerank(lg: LinkGraph, n_iter: int = 10, damping_e6: int = 850_000) -> DataFrame:
    """PageRank over the maintained edges — page html never read."""
    return pagerank(lg.edges.scan(), n_iter=n_iter, damping_e6=damping_e6)
