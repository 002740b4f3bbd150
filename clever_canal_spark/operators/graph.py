"""Web-graph operators: link extraction, PageRank, degrees, mirror hosts.

The webtext half of the engine so far treats every page as an independent
row; this module adds the CROSS-page structure a crawl corpus carries —
the hyperlink graph — and the classic corpus-curation signals computed
from it (PageRank-style centrality is the canonical page-quality prior;
host-level mirror detection is the site-granularity dedup pass run before
per-document near-dup).

Scale shapes (100-TB discipline):

- ``extract_links`` is a stateless map + 1→N explode of JVM expressions —
  no shuffle, no UDF; the output edge list is the only thing that moves.
- ``pagerank`` keeps the per-iteration state at O(nodes) rows of two
  BIGINT columns; each round is ONE equi-join (edges ⋈ ranks on src,
  shuffle keyed by the edge source) + ONE groupBy(dst) with map-side
  partial sums. The edge list never changes, so on a real cluster it is
  written bucketed by ``src`` once and every round's join co-locates.
  Ranks are localCheckpoint-ed per round (the kmeans/components lesson:
  an iterative plan otherwise grows two joins per round). The only
  driver-side values are three O(1) scalars (node count, dangling mass).
- All rank arithmetic is BIGINT (rank mass scaled to 1e12, damping in
  e6): Spark ``DIV`` == DuckDB ``//``, so the training loop itself is
  replayable bit-for-bit by the SQL oracle (the kmeans/BPE pattern).
- ``host_mirrors`` bounds its candidate fan-out exactly like the n-gram
  Jaccard pass: fingerprints shared by more than ``max_df`` hosts are
  stop-fingerprints (boilerplate) and leave the pair join; the self-join
  is per-fingerprint, never all-pairs over hosts.

Reference parity: clever-canal has no graph surface (it stops at row
delivery); these are the "operations a large-scale training-data
pipeline would need" half of the brief, same family as dedup/quality.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..ckpt import free_checkpoint
from .text import canonical_url

# rank mass is 1.0 scaled to RANK_SCALE; damping factors come in e6
RANK_SCALE = 1_000_000_000_000


def url_host(col: Column) -> Column:
    """Lowercased host (port stripped) of an absolute URL; NULL for
    non-URL-shaped strings — the site key of host-level operators."""
    host = F.regexp_extract(col, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    host = F.lower(F.regexp_replace(host, r":\d+$", ""))
    return F.when(host != "", host)


def extract_links(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    canonicalize: bool = True,
) -> DataFrame:
    """(src, dst) hyperlink edges from pages: every ``href="…"`` in
    ``html_col`` whose target is an ABSOLUTE http(s)-style URL (relative
    links need a base-resolution pass a real crawler does upstream;
    keeping only absolute targets is the conservative subset both
    engines express identically). Self-links drop. Map-only 1→N explode
    of JVM expressions — the edge list is the only shuffled artifact
    downstream."""
    hrefs = F.expr(
        f"""regexp_extract_all({html_col}, 'href\\\\s*=\\\\s*"([^"]*)"', 1)"""
    )
    out = (
        df.select(F.col(url_col).alias("src"), F.explode(hrefs).alias("dst"))
        .filter(F.col("dst").rlike("^[A-Za-z][A-Za-z0-9+.-]*://"))
    )
    if canonicalize:
        out = out.select(
            canonical_url(F.col("src")).alias("src"),
            canonical_url(F.col("dst")).alias("dst"),
        )
    return out.filter(F.col("src") != F.col("dst"))


def degree_stats(edges: DataFrame) -> DataFrame:
    """(node, out_deg, in_deg) over an (src, dst) edge list — the raw
    hub/authority signal. One union + one groupBy (map-side combined);
    nodes appearing only as a source have in_deg 0 and vice versa."""
    tagged = edges.select(
        F.col("src").alias("node"), F.lit(1).alias("o"), F.lit(0).alias("i")
    ).unionAll(
        edges.select(F.col("dst").alias("node"), F.lit(0), F.lit(1))
    )
    return tagged.groupBy("node").agg(
        F.sum("o").cast("long").alias("out_deg"),
        F.sum("i").cast("long").alias("in_deg"),
    )


def pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    damping_e6: int = 850_000,
    node_col: str = "node",
) -> DataFrame:
    """Damped PageRank over an (src, dst) edge list, integer-exact.

    Returns (``node_col``, rank_e12) after ``n_iter`` synchronous power
    iterations from the uniform start; ranks carry total mass
    ~``RANK_SCALE`` (integer division sheds at most 1 unit per node per
    round — deterministic on every engine, which is the point: the
    DuckDB oracle replays the loop itself).

    Per round, with d = damping_e6 and unit = RANK_SCALE DIV n:

        inflow(v)  = Σ_{(u,v) ∈ E} rank(u) DIV out_deg(u)
        dangling   = Σ_{out_deg(u)=0} rank(u)
        rank'(v)   = ((1e6 − d)·unit + d·(inflow(v) + dangling DIV n))
                     DIV 1e6

    Multi-edges contribute multiply (dedupe upstream if unwanted).
    Driver-side work per round: one 1-row dangling-mass aggregate (the
    kmeans-loop pattern); everything else is the edges⋈ranks join and a
    groupBy(dst)."""
    if n_iter < 0:
        raise ValueError("n_iter must be >= 0")
    edges = edges.select("src", "dst").localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias(node_col))
        .unionAll(edges.select(F.col("dst").alias(node_col)))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank_e12", F.lit(0).cast("long"))
    unit = RANK_SCALE // n
    out_deg = edges.groupBy(F.col("src").alias(node_col)).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    ranks = nodes.withColumn("rank_e12", F.lit(unit).cast("long"))
    base = (1_000_000 - damping_e6) * unit
    for _ in range(n_iter):
        ranked = ranks.join(out_deg, node_col, "left")
        dangling = (
            ranked.filter(F.col("out_deg").isNull())
            .agg(F.coalesce(F.sum("rank_e12"), F.lit(0)).cast("long"))
            .collect()[0][0]
        )
        inflow = (
            edges.join(
                ranked.filter(F.col("out_deg").isNotNull()),
                edges["src"] == ranked[node_col],
            )
            .select(
                F.col("dst").alias(node_col),
                F.expr("rank_e12 DIV out_deg").alias("share"),
            )
            .groupBy(node_col)
            .agg(F.sum("share").cast("long").alias("inflow"))
        )
        redistributed = dangling // n
        new = nodes.join(inflow, node_col, "left").select(
            node_col,
            F.expr(
                f"CAST(({base} + {damping_e6} * "
                f"(coalesce(inflow, 0) + {redistributed})) DIV 1000000 AS BIGINT)"
            ).alias("rank_e12"),
        )
        old = ranks
        ranks = new.localCheckpoint(eager=True)
        if old is not nodes:
            free_checkpoint(old)
    return ranks


def host_graph(edges: DataFrame, include_intra_host: bool = False) -> DataFrame:
    """Collapse a URL edge list to the host level: (src_host, dst_host,
    n_links). Intra-host edges (navigation chrome) drop by default —
    the cross-site graph is the ranking-relevant one. Non-URL endpoints
    (no host) drop. One groupBy, map-side combined; host cardinality is
    corpus-bounded far below page cardinality."""
    hg = edges.select(
        url_host(F.col("src")).alias("src_host"),
        url_host(F.col("dst")).alias("dst_host"),
    ).filter(F.col("src_host").isNotNull() & F.col("dst_host").isNotNull())
    if not include_intra_host:
        hg = hg.filter(F.col("src_host") != F.col("dst_host"))
    return hg.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).cast("long").alias("n_links")
    )


def host_mirrors(
    df: DataFrame,
    host_col: str = "source",
    fp_col: str = "fp",
    min_shared: int = 2,
    max_df: int = 64,
) -> DataFrame:
    """Mirror-site candidates: host pairs whose CONTENT fingerprint sets
    overlap — (host_a, host_b, shared, n_a, n_b, jaccard_e6), host_a <
    host_b, shared ≥ ``min_shared``. The site-granularity dedup pass a
    crawl runs before per-document near-dup: two hosts serving the same
    fingerprints are one site under two names, and the loser's pages
    drop wholesale.

    Scale shape (the ngram_jaccard_pairs discipline): fingerprints are
    distinct per host first; fingerprints present on more than
    ``max_df`` hosts are stop-fingerprints (shared boilerplate — empty
    pages, error templates) and leave the pair join, bounding candidate
    pairs at O(Σ_fp df_fp²) with df_fp ≤ max_df; the self-join is
    per-fingerprint, never all-pairs over hosts. Jaccard is exact
    integer e6 over the per-host distinct totals."""
    hfp = df.select(
        F.col(host_col).alias("host"), F.col(fp_col).alias("fp")
    ).distinct()
    totals = hfp.groupBy("host").agg(F.count(F.lit(1)).cast("long").alias("n"))
    rare = hfp.join(
        hfp.groupBy("fp").agg(F.count(F.lit(1)).alias("df_fp")).filter(
            F.col("df_fp") <= max_df
        ),
        "fp",
    ).select("host", "fp")
    a, b = rare.alias("a"), rare.alias("b")
    pairs = (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.host") < F.col("b.host")))
        .groupBy(
            F.col("a.host").alias("host_a"), F.col("b.host").alias("host_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    ta = totals.select(F.col("host").alias("host_a"), F.col("n").alias("n_a"))
    tb = totals.select(F.col("host").alias("host_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(ta, "host_a")
        .join(tb, "host_b")
        .select(
            "host_a",
            "host_b",
            "shared",
            "n_a",
            "n_b",
            F.expr("CAST(shared * 1000000 DIV (n_a + n_b - shared) AS BIGINT)").alias(
                "jaccard_e6"
            ),
        )
    )


def extract_anchor_texts(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    max_anchor_chars: int = 200,
) -> DataFrame:
    """(src, dst, anchor) triples: the inner text of every absolute-URL
    ``<a>`` tag, nested markup stripped, whitespace collapsed, truncated
    to ``max_anchor_chars``.

    Anchor text is the classic incoming-description training signal for
    web corpora (what OTHER pages call this document); aggregated per
    ``dst`` it doubles as a retrieval field. Map-only 1→N explode of JVM
    regexes — no Python, no shuffle; downstream groupBys shuffle only the
    (dst, anchor) pairs, never the html.

    The reference stops at row delivery; this is webtext-payload
    composition on top (same family as :func:`extract_links`)."""
    html = f"CAST({html_col} AS STRING)"
    a_tags = F.expr(
        f"""regexp_extract_all({html}, '(?s)<a\\\\s[^>]*>.*?</a>', 0)"""
    )
    tagged = df.select(F.col(url_col).alias("src"), F.explode(a_tags).alias("tag"))
    dst = F.regexp_extract("tag", 'href\\s*=\\s*"([^"]*)"', 1)
    inner = F.regexp_extract("tag", "(?s)^<a[^>]*>(.*)</a>$", 1)
    anchor = F.substring(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(inner, "<[^>]*>", ""), "\\s+", " "
            )
        ),
        1, max_anchor_chars,
    )
    return (
        tagged.select("src", dst.alias("dst"), anchor.alias("anchor"))
        .filter(F.col("dst").rlike("^[A-Za-z][A-Za-z0-9+.-]*://"))
        .filter(F.col("src") != F.col("dst"))
    )


def anchor_text_profile(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    min_count: int = 1,
) -> DataFrame:
    """Incoming-anchor profile per target: (dst, anchor, n_refs) — how
    many DISTINCT source pages describe ``dst`` with ``anchor``. Distinct
    (src, dst, anchor) first so a page repeating the same link doesn't
    inflate the profile; empty anchors (image links, spacer tags) drop."""
    triples = extract_anchor_texts(df, url_col, html_col).filter(
        F.length("anchor") > 0
    )
    return (
        triples.distinct()
        .groupBy("dst", "anchor")
        .agg(F.count(F.lit(1)).cast("long").alias("n_refs"))
        .filter(F.col("n_refs") >= min_count)
    )
