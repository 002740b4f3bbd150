"""Dedup admission gate: curation-in-the-loop CDC ingest.

The webtext composition the persisted dedup index exists for
(operators/dedup_index.py): the index tails the lake's changelog, and each
INCOMING epoch is probed against it BEFORE the merge — duplicate-content
pages are dropped (or tagged) at the door instead of being ingested and
cleaned up later. The reference's analog is the event-filter stage ahead
of the sink (a Canal instance filters events before delivery,
AbstractEventParser's filter chain); this gate is that stage with corpus
state behind it.

Plan shape (100-TB discipline): the probe carries only (doc_id, fp) —
md5 fingerprints, never payloads — broadcast against the bucket-pruned
index scan; the verdict set (duplicate doc ids found THIS epoch, typically
tiny) broadcasts back against the batch. No corpus scan, no payload
shuffle, O(epoch) work.

Semantics:

- Only ``gate_ops`` events (default I and U) with a non-null text image
  are candidates; deletes and DDL always pass.
- An event is a duplicate when its text fingerprint matches an INDEXED
  document with a different ``doc_id``, or an earlier-keyed document
  inside the same batch (``within_batch=True`` — two new pages with
  identical text admit only the smallest doc_id; the winner is
  deterministic, not arrival-ordered).
- A re-upsert of the SAME document (same doc_id, same text) is not a
  duplicate — updates flow.
- ``doc_id_expr`` MUST produce the same id space the index was built /
  synced with (``sync_from_lake`` defaults to ``xxhash64(*merge_key)``).
  With the (url, warc_ts) merge-key default, an identical re-crawl under
  a new warc_ts IS gated — usually what a crawl pipeline wants; key the
  index and the gate by url alone to gate only cross-url duplicates.
- The gate is per-epoch: it sees the index as of the LAST SYNC. Pages
  admitted in epoch N are visible to epoch N+1's gate only after
  ``sync_from_lake`` runs between them (the pipeline's hook order).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame, functions as F

if TYPE_CHECKING:  # runtime import is lazy: operators/ pulls in lake/,
    from ..operators.dedup_index import DedupIndex  # which pulls operators back

_DUP_COL = "__dup_of"


@dataclass
class AdmissionResult:
    batch: DataFrame
    # lazily-countable frames, exposed for metrics/debugging; consuming
    # `batch` alone never materializes them
    rejected: DataFrame  # (doc_id, dup_of_doc_id)


def dedup_admission(
    batch: DataFrame,
    index: "DedupIndex",
    *,
    image_col: str = "after",
    text_col: str = "text",
    doc_id_expr: Column | None = None,
    gate_ops: tuple = ("I", "U"),
    mode: str = "drop",
    within_batch: bool = True,
    near_min_bands: int | None = None,
    chunk_min_shared: int | None = None,
) -> AdmissionResult:
    """Gate a feed-shaped epoch batch against the dedup index.

    ``mode='drop'`` removes duplicate events (schema unchanged);
    ``mode='tag'`` keeps every event and adds a ``__dup_of`` bigint
    column (null = admitted) so downstream policy decides. Returns
    :class:`AdmissionResult` with the gated batch and the rejected
    (doc_id, dup_of_doc_id) pairs.

    ``near_min_bands`` additionally gates NEAR-duplicates: a doc whose
    winner text shares >= that many MinHash-LSH band buckets with an
    indexed doc (``probe_neardup``) rejects, ``dup_of`` = the candidate
    sharing the most bands (ties: smallest doc_id — deterministic).
    This is the banding verdict, not a verified Jaccard — at the
    admission door a false positive costs one dropped near-identical
    page, the cheap side of the asymmetry; pipelines needing verified
    pairs run the corpus-side ``ngram_jaccard_pairs`` instead. The
    near probe carries winner TEXTS through its per-doc agg
    (signatures need the text) — the same weight class as the LWW
    winner shuffle the merge itself runs, still O(epoch). Near-dup
    gating is vs the INDEX only; within-batch near-dups are admitted
    (the corpus-side dedup catches them next sync)."""
    from ..operators.dedup_index import probe_exact

    if mode not in ("drop", "tag"):
        raise ValueError(f"mode must be 'drop' or 'tag', got {mode!r}")
    img = F.col(image_col)
    did = (
        doc_id_expr
        if doc_id_expr is not None
        else F.xxhash64(img["url"], img["warc_ts"])
    )
    text = img[text_col]
    gated = F.col("op").isin(*gate_ops) & text.isNotNull()

    # one probe row per document: the LWW-winning image within the epoch
    # (the state the merge would settle to) decides for ALL the doc's
    # events — an epoch-intermediate non-duplicate version doesn't save a
    # doc whose final text is a duplicate. Hash BEFORE the winner agg:
    # only (doc_id, fp, lsn) rides the shuffle, never page payloads
    probe = (
        batch.filter(gated)
        .select(did.alias("doc_id"), F.md5(text).alias("fp"), F.col("lsn"))
        .groupBy("doc_id")
        .agg(F.max_by("fp", F.col("lsn")).alias("fp"))
    )
    # vs the corpus: fp match on a DIFFERENT indexed doc
    cross = (
        probe_exact(index, probe, fp_col="fp")
        .filter(F.col("dup_of_doc_id") != F.col("new_doc_id"))
        .select(F.col("new_doc_id").alias("doc_id"), "dup_of_doc_id")
    )
    winners = None
    if near_min_bands is not None or chunk_min_shared is not None:
        winners = (
            batch.filter(gated)
            .select(did.alias("doc_id"), text.alias("__text"), F.col("lsn"))
            .groupBy("doc_id")
            .agg(F.max_by("__text", F.col("lsn")).alias("__text"))
        )
    if near_min_bands is not None:
        from ..operators.dedup_index import probe_neardup

        near = (
            probe_neardup(index, winners, text_col="__text")
            .filter(
                (F.col("n_shared_bands") >= near_min_bands)
                & (F.col("cand_doc_id") != F.col("new_doc_id"))
            )
            .groupBy(F.col("new_doc_id").alias("doc_id"))
            .agg(
                F.max_by(
                    "cand_doc_id",
                    F.struct(F.col("n_shared_bands"), (-F.col("cand_doc_id")).alias("nid")),
                ).alias("dup_of_doc_id")
            )
        )
        cross = cross.unionByName(near).groupBy("doc_id").agg(
            F.min("dup_of_doc_id").alias("dup_of_doc_id")
        )
    if chunk_min_shared is not None:
        # SHIFT-RESISTANT gate: content-defined chunk overlap with an
        # indexed doc — catches a syndicated copy behind a new prefix,
        # which defeats the exact fp and usually the MinHash bands
        # (whole-doc signatures differ once the prefix does). Same
        # verdict discipline as the near gate: most shared chunks wins,
        # ties to the smallest indexed doc id.
        from ..operators.dedup_index import probe_chunk_dups

        chunk = (
            probe_chunk_dups(
                index, winners, text_col="__text", min_shared=chunk_min_shared
            )
            .filter(F.col("cand_doc_id") != F.col("new_doc_id"))
            .groupBy(F.col("new_doc_id").alias("doc_id"))
            .agg(
                F.max_by(
                    "cand_doc_id",
                    F.struct(F.col("n_shared"), (-F.col("cand_doc_id")).alias("nid")),
                ).alias("dup_of_doc_id")
            )
        )
        cross = cross.unionByName(chunk).groupBy("doc_id").agg(
            F.min("dup_of_doc_id").alias("dup_of_doc_id")
        )
    if within_batch:
        # among docs new to this batch: one winner per fingerprint (min
        # doc_id); only (doc_id, fp) pairs ride this shuffle
        fps = probe.select("doc_id", "fp")
        keeper = fps.groupBy("fp").agg(F.min("doc_id").alias("dup_of_doc_id"))
        within = (
            fps.join(keeper, "fp")
            .filter(F.col("doc_id") != F.col("dup_of_doc_id"))
            .select("doc_id", "dup_of_doc_id")
        )
        rejected = cross.unionByName(within).groupBy("doc_id").agg(
            F.min("dup_of_doc_id").alias("dup_of_doc_id")
        )
    else:
        rejected = cross

    verdict = F.broadcast(rejected.withColumnRenamed("doc_id", "__gate_doc_id"))
    tagged = batch.join(
        verdict,
        gated & (did == F.col("__gate_doc_id")),
        "left",
    ).drop("__gate_doc_id")
    if mode == "tag":
        out = tagged.withColumnRenamed("dup_of_doc_id", _DUP_COL)
    else:
        out = tagged.filter(F.col("dup_of_doc_id").isNull()).drop("dup_of_doc_id")
    return AdmissionResult(batch=out, rejected=rejected)
