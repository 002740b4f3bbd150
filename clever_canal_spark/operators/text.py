"""Text-analysis operators for the documents table — the training-data
pipeline companions of the CDC transforms (all JVM-side expressions, no
Python in the hot path; the pandas-UDF variants in functions/transforms.py
exist for the byte-exact CDC invariant, these exist for throughput).

Determinism contract: every function here is expressible identically in
DuckDB SQL (entry_queries carries the oracle strings); outputs are ints /
strings only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# polynomial 3-gram hash base — small enough that a*h+b stays in int64
SHINGLE_W = 961  # 31^2
TOKEN_RE = r"\S+"

# marker-word language ID (fixed precedence for ties: en > de > fr > es)
LANG_MARKERS = {
    "en": r"\b(the|and|of|to|in|is|that|for)\b",
    "de": r"\b(der|die|das|und|ist|nicht|von|mit)\b",
    "fr": r"\b(le|la|les|des|et|est|pour|dans)\b",
    "es": r"\b(el|los|las|y|es|para|en|que)\b",
}


def shingle_hashes_expr(text_col: str) -> str:
    """3-char shingle polynomial hashes, O(n): char codes are computed once
    (``split('') → ascii``) and indexed, instead of per-position
    ``substring`` which is O(n²) on long documents. The single-element
    ``array(...)`` + ``transform`` wrapper binds the codes array to a
    lambda variable so it is evaluated once per row. Values are identical
    to the straightforward per-position form the DuckDB oracle uses.

    Texts shorter than one shingle (length < 3, incl. empty) yield an
    EMPTY array — matching DuckDB's ``generate_series(1, 0)`` (empty). A
    bare ``sequence(1, greatest(len-2, 0))`` guard is a trap: Spark's
    ``sequence(1, 0)`` defaults to step -1 and yields ``[1, 0]``, whose
    i+2 lookup then crashes ``element_at`` on the 2-char codes array.
    NULL text stays NULL."""
    codes = f"transform(split({text_col}, ''), c -> ascii(c))"
    shingles = (
        f"element_at(transform(array({codes}), cs -> "
        f"transform(sequence(1, length({text_col}) - 2), i -> "
        f"CAST(element_at(cs, i)*961 + element_at(cs, i+1)*31 "
        f"+ element_at(cs, i+2) AS BIGINT))), 1)"
    )
    return (
        f"CASE WHEN length({text_col}) >= 3 THEN {shingles} "
        f"WHEN {text_col} IS NULL THEN NULL "
        f"ELSE CAST(array() AS array<bigint>) END"
    )


def token_count(text_col: str) -> Column:
    return F.regexp_count(F.col(text_col), F.lit(TOKEN_RE)).alias("n_tokens")


def doc_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprint: md5 of the text (exact-dup key) + length."""
    return df.select(
        "doc_id",
        F.md5(F.col(text_col)).alias("fp"),
        F.length(F.col(text_col)).alias("n_chars_m"),
    )


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token/char/space counts — whitespace tokenizer (regex \\S+)."""
    t = F.col(text_col)
    return df.select(
        "doc_id",
        F.regexp_count(t, F.lit(TOKEN_RE)).alias("n_tokens"),
        F.length(t).alias("n_chars_m"),
        (F.length(t) - F.length(F.regexp_replace(t, r"\s", ""))).alias("n_spaces"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Integer quality heuristic in [0,3]: token-count band + stopword
    presence + low punctuation density (the length/punct/stopword-ratio
    triple, integer-exact)."""
    t = F.col(text_col)
    n_tokens = F.regexp_count(t, F.lit(TOKEN_RE))
    n_punct = F.regexp_count(t, F.lit(r"[.,;:!?]"))
    has_stop = F.regexp_count(t, F.lit(r"\b(the|and|of)\b")) > 0
    score = (
        F.when((n_tokens >= 10) & (n_tokens <= 10000), 1).otherwise(0)
        + F.when(has_stop, 1).otherwise(0)
        + F.when(n_punct * 10 <= n_tokens, 1).otherwise(0)
    )
    return df.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_punct.alias("n_punct"),
        score.cast("int").alias("quality"),
    )


def c4_line_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words_per_line: int = 3,
    min_lines: int = 3,
) -> DataFrame:
    """C4's line-rule battery (Raffel et al. 2020 §2.2) — the per-LINE
    companion to the doc-level :func:`gopher_quality` and the corpus-
    frequency :func:`boilerplate_strip`:

    - keep only lines ending in terminal punctuation (. ! ? or a close
      quote);
    - drop lines with fewer than ``min_words_per_line`` words;
    - drop lines containing the word "javascript" (case-insensitive);
    - flag the whole DOC when it contains "lorem ipsum" or a curly
      brace (code leakage), or fewer than ``min_lines`` lines survive.

    Output: (doc_id, text = surviving lines rejoined, n_lines_total,
    n_lines_kept, doc_ok). Stateless map over the corpus — array
    lambdas only, no explode, no shuffle, no UDF; integer counts so the
    DuckDB oracle is bit-identical."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(t, "\n")

    def keep(line):
        return (
            (F.regexp_count(line, F.lit(r"\S+")) >= min_words_per_line)
            & line.rlike('[.!?"”]\\s*$')
            & ~F.lower(line).contains("javascript")
        )

    kept = F.filter(lines, keep)
    doc_ok = (
        ~F.lower(t).contains("lorem ipsum")
        & ~t.contains("{")
        & (F.size(kept) >= min_lines)
    )
    return df.select(
        "doc_id",
        F.array_join(kept, "\n").alias(text_col),
        F.size(lines).cast("long").alias("n_lines_total"),
        F.size(kept).cast("long").alias("n_lines_kept"),
        doc_ok.alias("doc_ok"),
    )


def _lang_hits(text_col: str) -> dict:
    """Marker-word hit counts, null-coalesced: NULL text counts as 0
    hits everywhere (→ 'und'), never a NULL that would fall through a
    CASE chain to the last branch. One construction shared by lang_id
    and langid_confusion so hit columns and prediction cannot drift."""
    t = F.col(text_col)
    return {
        k: F.coalesce(F.regexp_count(t, F.lit(v)), F.lit(0))
        for k, v in LANG_MARKERS.items()
    }


def _pred_lang_col(text_col: str) -> Column:
    """The marker-word prediction as a bare column (fixed tie precedence
    en > de > fr > es; NULL/markerless text → 'und')."""
    hits = _lang_hits(text_col)
    en, de, fr, es = hits["en"], hits["de"], hits["fr"], hits["es"]
    return (
        F.when((en + de + fr + es) == 0, "und")
        .when((en >= de) & (en >= fr) & (en >= es), "en")
        .when((de >= fr) & (de >= es), "de")
        .when(fr >= es, "fr")
        .otherwise("es")
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID with fixed tie precedence (JVM regex path;
    the pandas-UDF twin is functions.transforms.tag_language)."""
    hits = _lang_hits(text_col)
    en, de, fr, es = hits["en"], hits["de"], hits["fr"], hits["es"]
    pred = _pred_lang_col(text_col)
    return df.select(
        "doc_id",
        en.alias("en_hits"),
        de.alias("de_hits"),
        fr.alias("fr_hits"),
        es.alias("es_hits"),
        pred.alias("pred_lang"),
    )


# BPE-ish pre-tokenizer (the GPT-2 pretokenizer shape, RE2-safe: no
# lookahead, so the same pattern runs on Spark's Java regex and DuckDB's
# RE2): contractions | space?+letter-run | space?+digit-run |
# space?+punct-run. Counting these approximates BPE token counts well
# enough for corpus budgeting without a vocab file.
BPE_TOKEN_RE = r"'(s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace AND BPE-ish token counts — the corpus-budget pair (BPE
    count approximates what a trained tokenizer would charge)."""
    t = F.col(text_col)
    return df.select(
        "doc_id",
        F.regexp_count(t, F.lit(TOKEN_RE)).alias("n_ws_tokens"),
        F.regexp_count(t, F.lit(BPE_TOKEN_RE)).alias("n_bpe_tokens"),
        F.length(t).alias("n_chars_m"),
    )


def gopher_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style composite quality filter (Rae et al. 2021 §A.1.1
    shape): five integer-exact repetition/length/symbol rules, each
    reported as its own flag plus the AND verdict — a pipeline keeps the
    per-rule flags for ablation instead of a single opaque score.

    All rules are pure JVM regexp/arithmetic (RE2-safe patterns, integer
    cross-multiplication instead of float ratios, so the DuckDB oracle is
    bit-identical):

    - ``r_len``:      10 ≤ whitespace tokens ≤ 100 000
    - ``r_wordlen``:  mean non-space chars per token in [3, 12]
                      (3·tokens ≤ nonspace ≤ 12·tokens)
    - ``r_symbol``:   '#'/ellipsis symbols ≤ 10% of tokens
    - ``r_stop``:     ≥ 2 stopword hits (the|and|of|to|in)
    - ``r_digit``:    digit chars < 20% of all chars

    At 100 TB this is a stateless map over the corpus — no shuffle, no
    UDF; it composes with dedup/sampling downstream.
    """
    t = F.col(text_col)
    n_tok = F.regexp_count(t, F.lit(TOKEN_RE))
    n_chars = F.length(t)
    n_nonspace = n_chars - F.regexp_count(t, F.lit(r"\s"))
    n_sym = F.regexp_count(t, F.lit(r"#|\.\.\."))
    n_stop = F.regexp_count(t, F.lit(r"\b(the|and|of|to|in)\b"))
    n_digit = F.regexp_count(t, F.lit(r"[0-9]"))
    r_len = (n_tok >= 10) & (n_tok <= 100_000)
    r_wordlen = (3 * n_tok <= n_nonspace) & (n_nonspace <= 12 * n_tok)
    r_symbol = 10 * n_sym <= n_tok
    r_stop = n_stop >= 2
    r_digit = 5 * n_digit < n_chars
    flags = {
        "r_len": r_len, "r_wordlen": r_wordlen, "r_symbol": r_symbol,
        "r_stop": r_stop, "r_digit": r_digit,
    }
    passes = r_len & r_wordlen & r_symbol & r_stop & r_digit
    return df.select(
        "doc_id",
        *[v.cast("int").alias(k) for k, v in flags.items()],
        passes.cast("int").alias("passes"),
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str = "lang",
    n_per_stratum: int = 20,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic exact-N-per-stratum sample: rank rows inside each
    stratum by ``md5(id)`` (a fixed pseudo-random permutation — same
    result on every engine, every run, every partitioning) and keep the
    first N. The rank column is returned so downstream jobs can take
    nested subsamples (rk ≤ M for any M ≤ N) without resampling.

    Scale shape: one hash-partition shuffle on the stratum key; skewed
    strata cost their row count, not a sort of the corpus — the window
    only materializes per-stratum groups. For rate-based (not exact-N)
    sampling at extreme scale, filter ``md5(id) < threshold`` directly
    and skip the shuffle entirely.
    """
    h = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(strata_col).orderBy(h, F.col(id_col))
    return (
        df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= n_per_stratum)
        .select(id_col, strata_col, "rk")
    )


def word_ngrams_expr(text_col: str, n: int = 2) -> str:
    """Adjacent word n-grams as space-joined strings (tokens are
    space-split, so ' ' cannot occur inside a token and the join is
    unambiguous). ``slice`` (not ``sequence``) supplies the index range so
    a doc with < n tokens yields an empty array, matching DuckDB's empty
    ``generate_series``."""
    toks = f"split({text_col}, ' ')"
    parts = ["t"] + [f"element_at({toks}, i + {k + 1})" for k in range(1, n)]
    return (
        f"transform(slice({toks}, 1, greatest(size({toks}) - {n - 1}, 0)), "
        f"(t, i) -> concat_ws(' ', {', '.join(parts)}))"
    )


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signal: how much of a document is its own
    most-frequent word 2-gram (Rae et al. 2021 §A.1.1 'duplicate n-gram
    fraction' family). Returns per doc: total / distinct 2-gram counts,
    the top 2-gram's count, the duplicated-gram surplus, and an integer
    verdict ``repetitive`` (top 2-gram ≥ 10% of all 2-grams, by integer
    cross-multiplication; a top count of 1 never flags — the percentage
    rule alone would mark every ≤10-gram doc).

    Scale shape: documents are independent, so this is a stateless
    per-row computation — the gram array is sorted once (O(L log L) in
    the doc's own length) and the max run length is folded with
    ``aggregate``; NO corpus-wide shuffle, unlike the naive
    explode → groupBy(doc, gram) plan whose shuffle would carry ~2× the
    corpus text. Docs with < 2 tokens emit no row (they have no 2-gram;
    the oracle's unnest-of-empty drops them identically).
    """
    g = word_ngrams_expr(text_col, 2)
    # fold sorted grams into (prev, current-run, best-run); equal
    # neighbors extend the run — best-run = the top gram's count
    top = (
        f"aggregate(array_sort({g}), "
        f"named_struct('prev', cast(null as string), 'run', 0, 'best', 0), "
        f"(a, x) -> named_struct("
        f"  'prev', x, "
        f"  'run', IF(a.prev IS NOT NULL AND x = a.prev, a.run + 1, 1), "
        f"  'best', greatest(a.best, IF(a.prev IS NOT NULL AND x = a.prev, a.run + 1, 1))), "
        f"a -> a.best)"
    )
    out = df.select(
        "doc_id",
        F.expr(f"cast(size({g}) as bigint)").alias("n_grams"),
        F.expr(f"cast(size(array_distinct({g})) as bigint)").alias("n_distinct_grams"),
        F.expr(f"cast({top} as bigint)").alias("top_gram_count"),
    ).filter(F.col("n_grams") > 0)
    return out.select(
        "doc_id",
        "n_grams",
        "n_distinct_grams",
        "top_gram_count",
        (F.col("n_grams") - F.col("n_distinct_grams")).alias("dup_grams"),
        (
            (F.col("top_gram_count") >= 2)
            & (10 * F.col("top_gram_count") >= F.col("n_grams"))
        ).cast("int").alias("repetitive"),
    )


def benchmark_contamination(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    eval_modulus: int = 101,
) -> DataFrame:
    """Benchmark-contamination scan: flag corpus documents sharing any
    word n-gram with a held-out evaluation set (the decontamination pass
    every training-data pipeline runs before a model sees the corpus; the
    GPT-3 appendix-C / Gopher §A.2 shape, n-gram overlap flavor).

    The eval set here is carved deterministically from the corpus itself
    (``doc_id % eval_modulus == 0``) so tests and oracle need no external
    data; production passes its real benchmark table in the same
    position. n=3 suits the fixture's small vocabulary — real passes use
    8-13-gram windows, which this expression builds unchanged.

    Scale shape: the benchmark gram set is benchmark-sized, not
    corpus-sized — it broadcasts; the corpus side explodes its grams and
    hash-aggregates per doc with map-side combine. No corpus-vs-corpus
    shuffle anywhere, and non-matching grams die at the broadcast join
    before the aggregation.
    """
    g = F.expr(word_ngrams_expr(text_col, n))
    is_eval = F.col("doc_id") % eval_modulus == 0
    bench = (
        df.filter(is_eval).select(F.explode(g).alias("gram")).distinct()
    )
    hits = (
        df.filter(~is_eval)
        .select("doc_id", F.explode(g).alias("gram"))
        .join(F.broadcast(bench), "gram")
    )
    return hits.groupBy("doc_id").agg(
        F.count("*").alias("n_hits"),
        F.countDistinct("gram").alias("n_hit_grams"),
    )


def sequence_pack(
    df: DataFrame,
    budget: int = 256,
    part_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic sequence packing: lay documents end-to-end inside
    each ``part_col`` partition (ordered by doc_id) and cut fixed
    ``budget``-token training sequences from the concatenation — the
    standard pack-with-document-concatenation recipe, where a doc may
    straddle a sequence boundary and continue into the next bin. Returns
    per doc: its token count, the bin it STARTS in
    (``bin_id = tokens_before / budget``) and its offset inside that bin
    — everything a downstream tokenize-and-pack job needs to materialize
    sequences without re-scanning order.

    Scale shape: one window per partition key (sources are many and
    independent — no global ordering, no corpus-wide sort); token counts
    are a regexp_count expression, integer-exact for the oracle."""
    n_tok = F.regexp_count(F.col(text_col), F.lit(TOKEN_RE)).alias("n_tokens")
    w = (
        Window.partitionBy(part_col)
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        df.select("doc_id", part_col, n_tok)
        .withColumn("tokens_before", cum_before)
        .select(
            "doc_id",
            part_col,
            "n_tokens",
            "tokens_before",
            (F.col("tokens_before") / budget).cast("long").alias("bin_id"),
            (F.col("tokens_before") % budget).alias("offset_in_bin"),
        )
    )


def token_rarity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-frequency rarity stats per document — the integer-exact
    core of the CCNet/KenLM-style perplexity quality filter (docs made
    of rare tokens score low; a float LM score is just a monotone
    transform of these counts). Per doc: token totals plus
    ``tf_sum`` = Σ over token INSTANCES of that token's corpus-wide
    occurrence count, and ``min_tf`` = the rarest token's corpus count.
    All BIGINT arithmetic — no floating log-sums whose addition order
    could drift between engines.

    Scale shape (three bounded shuffles, no UDF):
    1. explode → partial-agg count by (doc, token): the shuffle carries
       per-partition partial counts, not token instances;
    2. the corpus vocabulary (groupBy token) is vocabulary-bounded —
       exactly `vocab_topk`'s shape — and joins back on the token key
       against per-doc DISTINCT tokens (Σ distinct-per-doc rows, far
       below corpus token count);
    3. re-agg by doc. Documents never carry text past step 1."""
    toks = F.expr(f"regexp_extract_all({text_col}, r'{TOKEN_RE}', 0)")
    per_doc_tok = (
        df.select(id_col, F.explode(toks).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count("*").alias("in_doc"))
    )
    # vocabulary from its own explode (NOT from per_doc_tok): Spark would
    # otherwise recompute the corpus-sized (doc, token) shuffle on both
    # sides of the join — this side's shuffle carries only vocab-bounded
    # partial counts straight off the scan
    vocab = (
        df.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("corpus_tf"))
    )
    return (
        per_doc_tok.join(vocab, "tok")
        .groupBy(id_col)
        .agg(
            F.sum("in_doc").alias("n_tokens"),
            F.count("*").alias("n_distinct"),
            F.sum(F.col("in_doc") * F.col("corpus_tf")).alias("tf_sum"),
            F.min("corpus_tf").alias("min_tf"),
        )
    )


def chunk_windows(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document sliding-window chunking (context-window prep): cut
    each document's whitespace tokens into windows of ``chunk_tokens``
    with ``overlap`` tokens shared between consecutive windows. The last
    window always reaches the document tail (it may overlap its
    predecessor by more than ``overlap``); a document that fits in one
    window emits exactly one chunk; an empty document emits none.
    Window count is integer-exact: ``1 + ceil((n - chunk) / step)`` with
    ``step = chunk_tokens - overlap``.

    Scale shape: a 1→N explode over per-row JVM expressions
    (regexp_extract_all / sequence / slice / array_join) — documents are
    independent, so NO shuffle, no UDF, and output partitioning inherits
    the input scan's. Chunk text re-joins tokens with single spaces
    (whitespace-run canonicalization), which keeps the output
    byte-deterministic across engines."""
    if not (0 <= overlap < chunk_tokens):
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}")
    step = chunk_tokens - overlap
    toks = F.expr(f"regexp_extract_all({text_col}, r'{TOKEN_RE}', 0)")
    n = F.size(toks)
    n_chunks = F.when(n <= 0, F.lit(0)).when(n <= chunk_tokens, F.lit(1)).otherwise(
        ((n - chunk_tokens + (step - 1)) / step).cast("int") + 1
    )
    base = df.select(
        id_col,
        toks.alias("__toks"),
        n.alias("__n"),
        # explicit empty-array branch: sequence(0, -1) would walk BACKWARD
        F.when(
            n_chunks > 0, F.sequence(F.lit(0), n_chunks.cast("int") - 1)
        ).otherwise(F.array().cast("array<int>")).alias("__ids"),
    )
    start = F.col("chunk_id").cast("long") * step
    return base.select(
        id_col, "__toks", "__n", F.explode("__ids").alias("chunk_id")
    ).select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        start.alias("start_token"),
        F.least(F.lit(chunk_tokens).cast("long"), F.col("__n") - start).alias(
            "n_chunk_tokens"
        ),
        F.array_join(
            F.slice(F.col("__toks"), (start + 1).cast("int"), chunk_tokens), " "
        ).alias("chunk_text"),
    )


def source_mix(
    df: DataFrame,
    rates_pct: dict[str, int] | None = None,
    default_pct: int = 100,
    part_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic data mixing: resample each source to a target
    percentage by md5-rank (keep ``rk·100 ≤ pct·n_source`` — exactly
    ⌊pct·n/100⌋ docs per source, same set on every engine/run/
    partitioning). ``rates_pct`` maps source → integer percent;
    everything else keeps ``default_pct``. The usual knob for steering a
    training mix (up-weight curated sources, down-weight crawl) without
    a non-deterministic ``sample()``.

    Scale shape: identical to `stratified_sample` — one hash-partition
    window per source; for rate-only mixing at extreme scale the
    md5-threshold filter variant skips the shuffle entirely."""
    rate = F.lit(default_pct)
    for src, pct in (rates_pct or {}).items():
        rate = F.when(F.col(part_col) == src, F.lit(pct)).otherwise(rate)
    h = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(part_col).orderBy(h, F.col(id_col))
    wn = Window.partitionBy(part_col)
    return (
        df.withColumn("rk", F.row_number().over(w))
        .withColumn("__n", F.count("*").over(wn))
        .filter(F.col("rk") * 100 <= rate * F.col("__n"))
        .select(id_col, part_col, "rk")
    )


# PII regexes shared by the Spark and oracle sides. Kept in the syntax
# subset Java regex and RE2 agree on (\b, \d, bounded reps): the engines
# must count and replace the exact same spans or the value oracle breaks.
PII_EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails / IPv4 addresses / phone numbers — the standard
    pre-training privacy pass. Replacements chain in a fixed order
    (email → ip → phone) and EACH count is taken on the text as that
    stage sees it, so counts always equal the placeholders actually
    emitted — on overlapping spans ('10.0.0.1@example.com': the email
    rule swallows the IP) the later category correctly reports 0 instead
    of counting a span that no longer exists. Stateless per-row
    expressions: no shuffle, no UDF, a pure map over the corpus scan."""
    t = F.col(text_col)
    after_email = F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, PII_IPV4_RE, "<IP>")
    clean = F.regexp_replace(after_ip, PII_PHONE_RE, "<PHONE>")
    return df.select(
        "doc_id",
        clean.alias("clean_text"),
        F.regexp_count(t, F.lit(PII_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(after_email, F.lit(PII_IPV4_RE)).alias("n_ips"),
        F.regexp_count(after_ip, F.lit(PII_PHONE_RE)).alias("n_phones"),
    )


def vocab_topk(df: DataFrame, k: int = 50, text_col: str = "text") -> DataFrame:
    """Corpus vocabulary: per-word total count + document frequency,
    top-k by count (ties broken by word for determinism). The shuffle key
    is the WORD — vocabulary-bounded, not corpus-bounded — and the
    explode feeds a partial (map-side) aggregation, so at 100 TB the
    exchanged data is ~|vocab|·cores rows regardless of corpus size."""
    words = df.select(
        "doc_id", F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(
            F.count("*").alias("n_total"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_total"), F.asc("word"))
        .limit(k)
    )


def length_histogram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Log2-bucketed document-length histogram — the one-line corpus
    shape check every curation run starts with. The bin is computed as
    ``length(bin(n)) - 1`` (== floor(log2 n)) rather than floating log2:
    integer-exact on every engine, so the value oracle can't drift on
    power-of-two edges. ~40 groups total — the reduce side is O(bins)
    whatever the corpus size."""
    b = F.length(F.bin(F.greatest(F.length(F.col(text_col)), F.lit(1)))) - 1
    return (
        df.groupBy(b.cast("int").alias("len_bin"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min(F.length(F.col(text_col))).alias("min_len"),
            F.max(F.length(F.col(text_col))).alias("max_len"),
        )
        .orderBy("len_bin")
    )


def _doc_lines(df: DataFrame, text_col: str, delim: str) -> DataFrame:
    """(doc_id, idx, line) — posexplode keeps the original position so the
    surviving lines can be reassembled in order. Empty lines are dropped
    (they carry no content and would dedup against each other)."""
    return (
        df.select(
            "doc_id",
            F.posexplode(F.split(F.col(text_col), F.lit(delim), -1)).alias("idx", "line"),
        )
        .filter(F.col("line") != "")
    )


def _reassemble_docs(
    df: DataFrame, kept: DataFrame, text_col: str, delim: str
) -> DataFrame:
    """Shared tail of the line-level passes: rebuild each doc from its
    surviving ``(doc_id, idx, line)`` rows in original order (one doc_id
    hash-agg), then left-join against the full doc list so a doc whose
    every line was removed comes back as an empty string, not a dropped
    row. Output: (doc_id, clean_text, n_kept, n_lines)."""
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "line"))),
                lambda s: s["line"],
            ),
            delim,
        ).alias("clean_text"),
        F.count("*").alias("n_kept"),
    )
    base = df.select("doc_id", F.size(F.filter(
        F.split(F.col(text_col), F.lit(delim), -1), lambda x: x != ""
    )).alias("n_lines"))
    return (
        base.join(rebuilt, on="doc_id", how="left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_kept", F.lit(0)).cast("int").alias("n_kept"),
            F.col("n_lines").cast("int").alias("n_lines"),
        )
    )


def paragraph_dedup(
    df: DataFrame, text_col: str = "text", delim: str = "\n"
) -> DataFrame:
    """C4-style global line/paragraph dedup: every exact duplicate line
    keeps only its FIRST occurrence corpus-wide (first = smallest
    (doc_id, idx)), and each doc is reassembled from its surviving lines
    in original order. Docs whose every line was claimed elsewhere come
    back as an empty string, not a dropped row.

    Scale shape: one hash-agg keyed on the line to pick winners, one
    shuffle join on (line, doc_id, idx) to keep them, one hash-agg on
    doc_id to reassemble — three line-keyed exchanges, which is the
    floor for a corpus-global dedup; no window over the whole corpus and
    nothing ever collects. The winner agg carries only (line, doc_id,
    idx) — payloads never ride the dedup shuffle."""
    lines = _doc_lines(df, text_col, delim)
    winners = (
        lines.groupBy("line")
        .agg(F.min(F.struct("doc_id", "idx")).alias("__w"))
        .select("line", F.col("__w.doc_id").alias("doc_id"), F.col("__w.idx").alias("idx"))
    )
    kept = lines.join(winners, on=["line", "doc_id", "idx"], how="left_semi")
    return _reassemble_docs(df, kept, text_col, delim)


def boilerplate_strip(
    df: DataFrame,
    max_df: int = 2,
    text_col: str = "text",
    delim: str = "\n",
    broadcast_hot: bool = True,
) -> DataFrame:
    """RefinedWeb-style boilerplate removal: drop every line that occurs
    in MORE than ``max_df`` distinct documents (nav bars, cookie
    banners, license footers), keep everything else in place.

    Scale shape: the line-frequency agg keys on the line (bounded by
    distinct-line count, with map-side partial counts); the hot-line
    list is the agg's OUTPUT filtered to df > max_df — usually tiny
    (boilerplate is by definition few distinct strings), so the default
    FORCES a broadcast into the removal anti-join. On an adversarial
    corpus where the over-threshold list could itself be huge (tiny
    max_df over a template-heavy crawl), pass ``broadcast_hot=False``:
    the anti-join then shuffles on the line key, and AQE still converts
    it back to a broadcast at runtime when the built side turns out
    small — the no-OOM-cliff fallback, chosen without a second
    counting pass over the corpus. Reassembly is the same doc_id
    hash-agg as paragraph_dedup."""
    lines = _doc_lines(df, text_col, delim)
    hot = (
        lines.groupBy("line")
        .agg(F.countDistinct("doc_id").alias("line_df"))
        .filter(F.col("line_df") > max_df)
        .select("line")
    )
    if broadcast_hot:
        hot = F.broadcast(hot)
    kept = lines.join(hot, on="line", how="left_anti")
    return _reassemble_docs(df, kept, text_col, delim)


def normalize_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Pre-tokenization cleanup: drop C0/C1 control characters (except
    \\t \\n), collapse runs of spaces/tabs to one space, trim. Reported
    with the removed-char count so a pipeline can flag docs that were
    mostly garbage. Stateless per-row regex — no shuffle, no UDF."""
    t = F.col(text_col)
    no_ctrl = F.regexp_replace(t, "[\\x00-\\x08\\x0B-\\x1F\\x7F-\\x9F]", "")
    collapsed = F.trim(F.regexp_replace(no_ctrl, "[ \\t]+", " "))
    return df.select(
        "doc_id",
        collapsed.alias("clean_text"),
        (F.length(t) - F.length(collapsed)).cast("int").alias("n_removed"),
    )


def bm25_contrib_sql(
    tf: str, df: str, dl: str, n_docs: str = "n_docs", s_dl: str = "s_dl"
) -> str:
    """One query term's BM25 contribution (e6-scaled BIGINT) — THE
    scoring expression, shared verbatim by the corpus path
    (:func:`bm25_topk`) and both index probes (text_index), which is
    what makes their equivalence a contract rather than a coincidence.

    k1=6/5, b=3/4 → contribution = idf_e6 · 22·tf·S / (10·tf·S + 3·S +
    9·dl·N). BIGINT products are kept small (22·tf, 10·tf, 9·dl — all
    ≤ ~2³¹) and widened to DOUBLE BEFORE multiplying by the
    corpus-sized S and N, so nothing wraps at 10¹⁰-doc scale; beyond
    2⁵³ the double products round, but identically in every IEEE
    engine, so cross-engine hashes still match. idf is the Lucene
    ln(1 + (N−df+0.5)/(df+0.5)) (never negative), quantized to BIGINT
    e6 before use. A tf=0 term contributes exactly 0."""
    idf_e6 = (
        f"CAST(ROUND(LN((CAST({n_docs} AS DOUBLE) - CAST({df} AS DOUBLE) + 0.5)"
        f" / (CAST({df} AS DOUBLE) + 0.5) + 1.0) * 1e6) AS BIGINT)"
    )
    num = f"(CAST(22 * {tf} AS DOUBLE) * CAST({s_dl} AS DOUBLE))"
    den = (
        f"(CAST(10 * {tf} AS DOUBLE) * CAST({s_dl} AS DOUBLE)"
        f" + 3 * CAST({s_dl} AS DOUBLE)"
        f" + CAST(9 * {dl} AS DOUBLE) * CAST({n_docs} AS DOUBLE))"
    )
    return f"CAST(ROUND(CAST({idf_e6} AS DOUBLE) * ({num} / {den})) AS BIGINT)"


def bm25_topk(
    df: DataFrame,
    terms: list[str],
    k: int = 25,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 keyword search: top-``k`` documents for a bag of query
    ``terms`` (k1=1.2, b=0.75 — the Robertson/Okapi defaults, with the
    Lucene ``ln(1 + (N-df+0.5)/(df+0.5))`` idf that never goes
    negative). A term containing whitespace is a PHRASE: its tf is the
    number of token positions where that exact sequence starts
    (overlapping, the Lucene phrase-freq convention); the positional
    text index serves phrases too (text_index.probe_bm25). The reference engine has no text-retrieval surface; this
    is the webtext-analytics addition a corpus-exploration user expects
    (find the documents about X before eyeballing a filter rule).

    Exact-across-engines: with k1=6/5 and b=3/4 the tf-saturation term
    is the rational ``22·tf·S / (10·tf·S + 3·S + 9·dl·N)`` (S = Σ doc
    lengths) — computed via :func:`bm25_contrib_sql`, whose factor
    grouping keeps every BIGINT product small before widening to DOUBLE
    (no 64-bit wrap even at S ~ 10¹³), after which every operation is
    deterministic IEEE arithmetic identical in Spark and DuckDB; the
    only transcendental is the idf ln over exactly-representable integer
    ratios, quantized to ``idf_e6`` BIGINT before use; per-term
    contributions round at e6 and sum as BIGINT, so cross-engine float
    drift cannot accumulate.

    Scale shape (NO corpus-wide shuffle): the query's term list is tiny
    and fixed, so per-doc tf for every term comes from one projection
    over the scan (higher-order ``filter`` over the token array — the
    tokenizer array is computed once and subexpression-eliminated);
    global stats (N, S, per-term df) are ONE 1-row partial-aggregated
    reduce; the 1-row stats broadcast back via crossJoin; the result is
    a TakeOrdered(k). An inverted index would only beat this when the
    term list is per-row, not per-query."""
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    terms = [" ".join(t.split()) for t in terms]  # canonicalize phrase spacing
    if any(not t for t in terms):
        raise ValueError("query terms must be non-empty")
    if len(set(terms)) != len(terms):
        raise ValueError("query terms must be distinct")
    # null text tokenizes to the empty array (size 0, not Spark's
    # size(NULL) = -1, which would corrupt S and diverge from the
    # index path and the SQL oracle, where NULL rows fall out of sums)
    toks = F.coalesce(
        F.expr(f"regexp_extract_all({text_col}, r'{TOKEN_RE}', 0)"),
        F.expr("CAST(array() AS array<string>)"),
    )

    def _eq(term: str):
        # single-arg lambda: a 2-arg callable would be read as (element,
        # index) by pyspark's higher-order filter
        return lambda x: x == F.lit(term)

    def _tf(term: str) -> Column:
        words = term.split()
        if len(words) == 1:
            return F.size(F.filter(toks, _eq(term)))
        # PHRASE term: the count of token positions where the exact
        # sequence starts (OVERLAPPING, the Lucene phrase-freq
        # convention — "a a a" has two starts of "a a"). A higher-order
        # filter over candidate start ordinals compares each L-slice to
        # the phrase literal; both engines slice and compare lists
        # identically, and the ordinal space is the tokenizer's, so the
        # match is whitespace-run-insensitive by construction. All
        # literals bind via F.lit/F.array — no SQL interpolation.
        L = len(words)
        phrase = F.array(*[F.lit(w) for w in words])
        starts = F.when(
            F.size(toks) < L, F.expr("CAST(array() AS array<int>)")
        ).otherwise(F.sequence(F.lit(1), F.size(toks) - L + 1))
        return F.size(
            F.filter(starts, lambda i: F.slice(toks, i, L) == phrase)
        )

    base = df.select(
        id_col,
        F.size(toks).alias("dl"),
        *[_tf(t).alias(f"tf{i}") for i, t in enumerate(terms)],
    )
    stats = base.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("s_dl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    score = " + ".join(
        bm25_contrib_sql(f"tf{i}", f"df{i}", "dl") for i in range(len(terms))
    )
    return (
        scored.select(id_col, "dl", F.expr(score).alias("score_e6"))
        .where(F.col("score_e6") > 0)
        .orderBy(F.col("score_e6").desc(), F.col(id_col))
        .limit(k)
    )


def mix_weights(
    df: DataFrame,
    target: dict[str, tuple[int, int]],
    strata_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Data-mixing reweighting: per-document copy counts that move the
    corpus from its OBSERVED stratum mix to a TARGET mix — the static
    core of training-mixture control (the sampling-weights half of
    DoReMi-style pipelines; the weights here are given, not learned).

    ``target`` maps stratum → exact rational share (num, den), e.g.
    ``{"en": (1, 2), "de": (1, 2)}``. Per doc: ``weight = target_share
    × N / n_stratum`` (the resample ratio), emitted integer-exact as
    ``weight_e6``, and ``n_copies`` = ⌊weight⌋ + a deterministic
    fractional keep — the md5-derived uniform ``u32 / 2³²`` compared to
    the fractional part in EXACT BIGINT arithmetic (u32·10⁶ <
    frac_e6·2³²), so every engine and every run picks the same docs.
    E[n_copies] = weight per stratum, which is what makes the expected
    output mix equal the target. Strata absent from ``target`` get
    weight 0 (dropped — emitted with n_copies=0 so the drop is
    auditable, not silent).

    Scale shape: a stratum-count aggregate (vocabulary-bounded — one
    row per stratum) broadcast back over the scan; everything else is
    per-row JVM expressions. No corpus-keyed shuffle, no UDF."""
    if not target:
        raise ValueError("mix_weights needs at least one target stratum")
    for s, (num, den) in target.items():
        if num < 0 or den <= 0:
            raise ValueError(f"stratum {s}: share must be a non-negative rational")
    spark = df.sparkSession
    tgt = F.broadcast(
        spark.createDataFrame(
            [(s, num, den) for s, (num, den) in target.items()],
            f"{strata_col} string, t_num bigint, t_den bigint",
        )
    )
    counts = df.groupBy(strata_col).agg(F.count("*").alias("n_stratum"))
    totals = df.agg(F.count("*").alias("n_total"))
    u32 = (
        f"CAST(conv(substring(md5(CAST({id_col} AS STRING)), 1, 8), 16, 10) AS BIGINT)"
    )
    w_e6 = (
        "CAST(ROUND(CAST(1000000 * t_num * n_total AS DOUBLE)"
        " / CAST(t_den * n_stratum AS DOUBLE)) AS BIGINT)"
    )
    return (
        df.select(id_col, strata_col)
        .join(F.broadcast(counts), strata_col)
        .join(tgt, strata_col, "left")
        .crossJoin(F.broadcast(totals))
        .select(
            id_col,
            strata_col,
            F.col("n_stratum"),
            F.expr(f"COALESCE({w_e6}, 0)").alias("weight_e6"),
            F.expr(
                f"CAST(COALESCE({w_e6}, 0) DIV 1000000 AS INT)"
                f" + CAST(CASE WHEN {u32} * 1000000 <"
                f" (COALESCE({w_e6}, 0) % 1000000) * 4294967296"
                " THEN 1 ELSE 0 END AS INT)"
            ).alias("n_copies"),
        )
    )


def search_snippets(
    df: DataFrame,
    term: str,
    k: int = 25,
    window_chars: int = 40,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Retrieval UX: BM25 top-``k`` for a single term, each hit carrying
    a ±``window_chars`` snippet around the term's FIRST occurrence
    (1-based ``locate``/``strpos`` — identical in Spark and DuckDB) and
    the match offset. The snippet window clamps at the document start;
    ``substring`` clamps the tail natively.

    Scale shape: scoring is :func:`bm25_topk` (no corpus shuffle); the
    snippet join touches only the k winner rows (broadcast semi of a
    25-row side against the scan — Catalyst prunes to (id, text))."""
    hits = bm25_topk(df, [term], k=k, id_col=id_col, text_col=text_col)
    # F.locate/F.substring take the needle as a literal — no SQL string
    # interpolation, so quotes/backslashes in the term cannot inject
    pos = F.locate(term, F.col(text_col))
    start = F.greatest(pos - window_chars, F.lit(1))
    snip = F.substring(
        F.col(text_col), start, F.lit(2 * window_chars + len(term))
    )
    return (
        df.select(id_col, text_col).join(F.broadcast(hits), id_col)
        .select(
            id_col,
            "score_e6",
            pos.cast("int").alias("match_at"),
            snip.alias("snippet"),
        )
        .orderBy(F.col("score_e6").desc(), F.col(id_col))
    )


def langid_confusion(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Operator eval: confusion matrix of the marker-word language ID
    against the corpus's labeled ``lang`` — (label, prediction, count).
    The standing check that the heuristic hasn't rotted as the corpus
    mix shifts; a pipeline alerts when off-diagonal mass grows.
    One projection + one vocabulary-bounded aggregate (|langs|² rows,
    map-side partials) — no join, no second scan."""
    return (
        df.select("lang", _pred_lang_col(text_col).alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").alias("n_docs"))
    )


def canonical_url(col: Column) -> Column:
    """URL canonicalization — the normalization pass that runs BEFORE
    url-keyed dedup/merge in a crawl pipeline (the same page arrives as
    ``HTTP://Site.COM:80/a/?b=2&a=1#x`` and ``http://site.com/a?a=1&b=2``
    and must land on one merge key). Pure JVM expressions, expressible
    identically in DuckDB (the oracle).

    Rules (each one deterministic and order-independent):
    - drop the fragment (``#…``);
    - lowercase scheme and host (path and query stay case-sensitive);
    - strip the scheme's default port (:80 http, :443 https);
    - the whole trailing-slash run drops; empty/all-slash path → ``/``;
    - query params split on ``&``, empties dropped, sorted bytewise,
      rejoined (``?`` omitted when nothing survives).
    Non-URL-shaped strings pass through trimmed-and-defragmented only —
    a conservative no-op, never a mangle."""
    s = F.trim(F.regexp_replace(col, "#.*$", ""))
    pat = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?]+)([^?]*)(\?.*)?$"
    scheme = F.lower(F.regexp_extract(s, pat, 1))
    hostport = F.lower(F.regexp_extract(s, pat, 2))
    path = F.regexp_extract(s, pat, 3)
    query = F.regexp_extract(s, pat, 4)
    host = F.when(
        ((scheme == "http") & hostport.endswith(":80"))
        | ((scheme == "https") & hostport.endswith(":443")),
        F.regexp_replace(hostport, ":[0-9]+$", ""),
    ).otherwise(hostport)
    # strip the WHOLE trailing-slash run (not one slash — '/a//' and
    # '/a/' must land on the same key, and canonicalizing twice must be
    # a no-op); an all-slash or empty path is the root
    stripped = F.regexp_replace(path, "/+$", "")
    norm_path = F.when(stripped == "", F.lit("/")).otherwise(stripped)
    q = F.array_join(
        F.sort_array(
            F.filter(
                F.split(F.regexp_replace(query, r"^\?", ""), "&"),
                lambda x: x != "",
            )
        ),
        "&",
    )
    canon = F.concat(
        scheme, F.lit("://"), host, norm_path,
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )
    return F.when(scheme == "", s).otherwise(canon)


# default URL-keyword blocklist fragments (the UT1/RefinedWeb-style
# category list is configuration; this seed is deliberately tiny and
# deterministic for fixtures)
URL_BLOCK_KEYWORDS = ("casino", "porn", "xxx", "poker", "viagra")


def url_quality_signals(
    df: DataFrame,
    url_col: str = "url",
    blocked_domains: "tuple[str, ...] | list[str] | DataFrame" = (),
    keywords: "tuple[str, ...]" = URL_BLOCK_KEYWORDS,
    max_path_depth: int = 8,
    max_query_len: int = 200,
    max_host_digit_pct: int = 40,
    keep_host: bool = False,
) -> DataFrame:
    """URL-level curation filter — the pre-download gate of a web-scale
    pipeline (RefinedWeb/FineWeb run a UT1-style domain blocklist plus
    URL heuristics BEFORE fetching or processing a page; at 100 TB the
    cheapest byte is the one never ingested).

    Adds one boolean per signal plus the conjunction ``url_ok``:

    - ``f_ip_host``     host is a bare IPv4 (no accountable domain);
    - ``f_blocked``     host is a blocked domain or any subdomain of one
      (suffix-chain semantics: ``ads.tracker.example`` matches a
      blocklist entry ``tracker.example``);
    - ``f_keyword``     a blocklist keyword occurs in host or path
      (case-insensitive substring);
    - ``f_digit_host``  digits are > ``max_host_digit_pct``% of the host
      (auto-generated spam hosts; integer-exact compare);
    - ``f_deep_path``   more than ``max_path_depth`` path segments
      (calendar/faceted-navigation crawler traps);
    - ``f_long_query``  query string longer than ``max_query_len``
      (session ids, tracking payloads).

    Scale shape: every signal is a map-only JVM expression on the scan —
    a list-valued ``blocked_domains`` inlines as a literal array probed
    with ``arrays_overlap`` against the host's suffix chain (bounded by
    label count), so NO join and NO shuffle anywhere. A DataFrame-valued
    blocklist (the real UT1 list is millions of rows) switches to a
    broadcast left-semi join on the exploded suffix chain — still
    shuffle-free on the corpus side."""
    pat = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?]+)([^?]*)(\?.*)?$"
    s = F.trim(F.regexp_replace(F.col(url_col), "#.*$", ""))
    host = F.lower(F.regexp_replace(F.regexp_extract(s, pat, 2), ":[0-9]+$", ""))
    path = F.regexp_extract(s, pat, 3)
    query = F.regexp_replace(F.regexp_extract(s, pat, 4), r"^\?", "")

    out = df.withColumn("__host", host).withColumn("__path", path)
    suffixes = F.transform(
        F.sequence(F.lit(1), F.size(F.split(F.col("__host"), r"\."))),
        lambda i: F.array_join(
            F.slice(F.split(F.col("__host"), r"\."), i, 1_000_000), "."
        ),
    )
    if isinstance(blocked_domains, DataFrame):
        dcol = blocked_domains.columns[0]
        probe = (
            out.select(F.explode(suffixes).alias("__sfx"), F.col("__host"))
            .join(
                F.broadcast(blocked_domains.select(F.col(dcol).alias("__sfx"))),
                "__sfx",
            )
            .select("__host")
            .distinct()
        )
        out = out.join(
            F.broadcast(probe.withColumn("__blocked", F.lit(True))), "__host", "left"
        )
        blocked = F.coalesce(F.col("__blocked"), F.lit(False))
    else:
        blocked = (
            F.arrays_overlap(
                suffixes, F.array(*[F.lit(d) for d in blocked_domains])
            )
            if blocked_domains
            else F.lit(False)
        )

    kw = F.lit(False)
    if keywords:
        # keywords are LITERALS, not patterns: escape regex metacharacters
        # so a caller-supplied 'c++' or 'a.b' neither breaks pattern
        # compilation in the executor nor silently over-matches
        import re as _re

        kw_pat = "(" + "|".join(_re.escape(k) for k in keywords) + ")"
        kw = F.lower(F.concat(F.col("__host"), F.col("__path"))).rlike(kw_pat)
    digits = F.length(F.regexp_replace(F.col("__host"), "[^0-9]", ""))
    flags = {
        "f_ip_host": F.col("__host").rlike(r"^[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+$"),
        "f_blocked": blocked,
        "f_keyword": kw,
        "f_digit_host": digits * 100 > F.length(F.col("__host")) * max_host_digit_pct,
        "f_deep_path": F.size(
            F.filter(F.split(F.col("__path"), "/"), lambda x: x != "")
        ) > max_path_depth,
        "f_long_query": F.length(query) > max_query_len,
    }
    for name, expr in flags.items():
        out = out.withColumn(name, expr)
    ok = F.lit(True)
    for name in flags:
        ok = ok & ~F.col(name)
    out = out.withColumn("url_ok", ok)
    if keep_host:
        out = out.withColumn("host", F.col("__host"))
    return out.drop("__host", "__path", "__blocked")


def host_quality_report(
    df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    min_docs: int = 2,
    flag_pct: int = 50,
    quality_floor: int = 2,
    **signal_kwargs,
) -> DataFrame:
    """Derive a domain blocklist FROM the data — per-host roll-up of the
    URL signals and the content quality score, flagging hosts where
    ≥``flag_pct``% of pages raise a URL signal or the mean quality score
    sits below ``quality_floor`` (integer-exact: ``sum_quality <
    n_docs·floor``). Hosts under ``min_docs`` pages never candidate
    (one bad page isn't a domain verdict).

    This closes the curation loop: ``url_quality_signals`` consumes a
    blocklist, this op proposes the next one — the UT1-style lists were
    themselves derived from crawls. Scale shape: map-only signal exprs +
    ONE groupBy(host) with map-side partial aggregation; state is
    O(hosts), orders below O(pages)."""
    t = F.col(text_col)
    n_tokens = F.regexp_count(t, F.lit(TOKEN_RE))
    n_punct = F.regexp_count(t, F.lit(r"[.,;:!?]"))
    has_stop = F.regexp_count(t, F.lit(r"\b(the|and|of)\b")) > 0
    quality = (
        F.when((n_tokens >= 10) & (n_tokens <= 10000), 1).otherwise(0)
        + F.when(has_stop, 1).otherwise(0)
        + F.when(n_punct * 10 <= n_tokens, 1).otherwise(0)
    )
    sig = url_quality_signals(
        df, url_col=url_col, keep_host=True, **signal_kwargs
    ).withColumn("__q", quality.cast("int"))
    agg = sig.groupBy("host").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("url_ok"), 0).otherwise(1)).cast("bigint").alias("n_flagged"),
        F.sum("__q").cast("bigint").alias("sum_quality"),
    )
    cand = (F.col("n_docs") >= min_docs) & (
        (F.col("n_flagged") * 100 >= F.col("n_docs") * flag_pct)
        | (F.col("sum_quality") < F.col("n_docs") * quality_floor)
    )
    return agg.withColumn("blocklist_candidate", cand)


def hashed_weights(spark, n_features: int = 4096, seed: str = "ccsq") -> DataFrame:
    """Deterministic demo weight table for :func:`linear_quality_score`
    (feature_id → weight_e6 in [-1e6, 1e6]). A real deployment loads the
    weights a trained fastText/logistic model exported — this synthesizes
    a reproducible stand-in from md5 so fixtures and oracles agree
    bit-for-bit on every engine."""
    return spark.range(n_features).select(
        F.col("id").cast("int").alias("feature_id"),
        (
            F.expr(
                f"CAST(conv(substring(md5(concat('{seed}', CAST(id AS STRING))), 1, 8), 16, 10) AS BIGINT)"
            )
            % F.lit(2_000_001)
            - F.lit(1_000_000)
        ).cast("long").alias("weight_e6"),
    )


def linear_quality_score(
    df: DataFrame,
    weights: DataFrame,
    n_features: int = 4096,
    bias_e6: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """fastText-style linear quality classifier scoring (the model-based
    quality filter of CCNet/GPT-3/DCLM pipelines): each token hashes into
    ``n_features`` buckets (the hashing trick, md5-u32 mod D), the score
    is the SUM of the bucket weights plus a bias, and ``avg_e6`` (score /
    n_tokens — fastText's mean-pooled linear layer) is the thresholdable
    quality signal. All arithmetic BIGINT e6 — bit-identical cross-engine.

    ``weights``: (feature_id int, weight_e6 long) — the exported model
    (``hashed_weights`` is the deterministic demo stand-in).

    Plan shape: tokens explode to (doc_id, feature_id) and broadcast-join
    the vocab-bounded weight table (D rows); the groupBy(doc_id) sum
    partial-aggregates map-side, so the shuffle carries ~one row per doc
    per partition — never the token stream. Docs with no tokens score
    bias with n_tokens=0 (avg = bias).
    """
    toks = F.expr(rf"regexp_extract_all({text_col}, '\\S+', 0)")
    feat = df.select(
        F.col(id_col),
        F.explode_outer(toks).alias("__tok"),
    ).select(
        id_col,
        F.when(
            F.col("__tok").isNotNull(),
            (
                F.expr(
                    "CAST(conv(substring(md5(__tok), 1, 8), 16, 10) AS BIGINT)"
                ) % F.lit(n_features)
            ).cast("int"),
        ).alias("feature_id"),
    )
    scored = (
        feat.join(F.broadcast(weights), on="feature_id", how="left")
        .groupBy(id_col)
        .agg(
            F.coalesce(F.sum("weight_e6"), F.lit(0)).cast("long").alias("sum_w_e6"),
            F.count("feature_id").cast("long").alias("n_tokens"),
        )
    )
    out = scored.select(
        id_col,
        "n_tokens",
        (F.col("sum_w_e6") + F.lit(bias_e6)).cast("long").alias("score_e6"),
    )
    # DIV (truncate toward zero) == DuckDB `//` — verified on negatives;
    # plain `/`+cast would round differently between the engines
    return out.select(
        id_col,
        "n_tokens",
        "score_e6",
        F.expr(
            "CASE WHEN n_tokens > 0 THEN score_e6 DIV n_tokens ELSE score_e6 END"
        ).cast("long").alias("avg_e6"),
    )


def _bpe_train(
    df: DataFrame,
    n_merges: int,
    text_col: str,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Shared BPE training loop: returns (merges, vocab) where vocab =
    (word, freq, syms) AFTER all merges — a live localCheckpoint the
    caller may consume (the ContextCleaner frees it when dropped)."""
    from ..ckpt import free_checkpoint

    toks = F.expr(rf"regexp_extract_all({text_col}, '\\S+', 0)")
    vocab = (
        df.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
        .select(
            "word",
            "freq",
            F.expr(
                "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
            ).alias("syms"),
        )
        .localCheckpoint()
    )
    spark = df.sparkSession
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        pairs = (
            vocab.select(
                "freq",
                # size guard: sequence(1, 0) steps BACKWARD ([1, 0]) and
                # element_at crashes — the shingle_hashes_expr trap
                F.explode(
                    F.expr(
                        "CASE WHEN size(syms) >= 2 THEN"
                        " transform(sequence(1, size(syms) - 1),"
                        " i -> struct(element_at(syms, i) AS l,"
                        " element_at(syms, i + 1) AS r))"
                        " ELSE array() END"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not pairs:
            break
        l, r, cnt = pairs[0]["l"], pairs[0]["r"], pairs[0]["cnt"]
        merges.append((step, l, r, int(cnt)))
        m = F.broadcast(
            spark.createDataFrame([(l, r, l + r)], "__ml string, __mr string, __mj string")
        )
        new_vocab = (
            vocab.crossJoin(m)
            .select(
                "word",
                "freq",
                F.expr(
                    "aggregate(slice(syms, 2, greatest(size(syms) - 1, 0)),"
                    " slice(syms, 1, 1),"
                    " (acc, x) -> IF(element_at(acc, -1) = __ml AND x = __mr,"
                    " concat(slice(acc, 1, size(acc) - 1), array(__mj)),"
                    " concat(acc, array(x))))"
                ).alias("syms"),
            )
            .localCheckpoint()
        )
        free_checkpoint(vocab)
        vocab = new_vocab
    return merges, vocab


def learn_bpe_merges(
    df: DataFrame,
    n_merges: int = 16,
    text_col: str = "text",
) -> list[tuple[int, str, str, int]]:
    """Distributed BPE merge-rule training (Sennrich et al. 2016): learn
    the top-``n_merges`` byte-pair merges from the corpus. Returns
    [(step, left, right, freq), ...] in training order.

    Scale shape: the corpus is touched ONCE — a word-frequency aggregate
    (shuffle key = the word, vocabulary-bounded however large the
    corpus). Every training round then runs on the VOCAB table only:
    adjacent-pair explode → weighted count → 1-row argmax (count desc,
    pair lexicographic — deterministic), then the merge is applied to
    each word's symbol array with a greedy leftmost non-overlapping fold
    (``aggregate``, the classic BPE application order) — all JVM
    higher-order expressions, the merge pair captured from a broadcast
    1-row frame (never interpolated into SQL text). Per-round
    localCheckpoint keeps the plan flat; rounds stop early when no
    adjacent pair remains."""
    from ..ckpt import free_checkpoint

    merges, vocab = _bpe_train(df, n_merges, text_col)
    free_checkpoint(vocab)
    return merges


def bpe_token_counts(
    df: DataFrame,
    n_merges: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT per-document BPE token counts under freshly-trained merges —
    the tokenizer-application half of :func:`learn_bpe_merges` (and the
    exact upgrade of :func:`bpe_token_stats`'s regex approximation).

    The application never re-folds per document: every corpus word's
    final symbol count already sits in the trained vocab, so docs explode
    to words and broadcast-join the vocab-bounded (word → n_word_toks)
    table; the groupBy(doc) sum partial-aggregates map-side. Returns
    (doc_id, n_words, n_bpe_tokens)."""
    merges, vocab = _bpe_train(df, n_merges, text_col)
    lens = vocab.select("word", F.size("syms").alias("__nwt"))
    toks = F.expr(rf"regexp_extract_all({text_col}, '\\S+', 0)")
    words = df.select(F.col(id_col), F.explode_outer(toks).alias("word"))
    return (
        words.join(F.broadcast(lens), on="word", how="left")
        .groupBy(id_col)
        .agg(
            F.count("word").cast("long").alias("n_words"),
            F.coalesce(F.sum("__nwt"), F.lit(0)).cast("long").alias("n_bpe_tokens"),
        )
    )


def bpe_encode_ids(
    df: DataFrame,
    n_merges: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize to TRAINER-READY id arrays: each document becomes the
    ordered ``array<int>`` of BPE symbol ids under freshly-trained
    merges — the terminal op a training pipeline feeds to sequence
    packing / the data loader (counts alone — ``bpe_token_counts`` —
    size the batches; this materializes the tokens).

    Symbol ids are the rank of the symbol string in sorted order over
    the final vocab's distinct symbols — deterministic, engine-portable
    (no hash, no insertion order). Scale shape: docs explode to
    positioned words, ONE broadcast join against the vocab-bounded
    (word → syms) table, a second broadcast join against the
    symbol-id table (≤ chars + n_merges rows), and per-doc reassembly
    by ``array_sort(collect_list(struct(pos, subpos, id)))`` — the only
    shuffle is the groupBy(doc), same key as the input. The symbol-id
    ranking runs an unpartitioned window over DISTINCT SYMBOLS — vocab-
    bounded (≤ alphabet + n_merges), never corpus-bounded."""
    from pyspark.sql import Window

    merges, vocab = _bpe_train(df, n_merges, text_col)
    syms_tbl = vocab.select("word", "syms")
    sym_ids = (
        vocab.select(F.explode("syms").alias("sym")).distinct()
        .withColumn(
            "tid",
            (F.row_number().over(Window.orderBy("sym")) - 1).cast("int"),
        )
    )
    toks = F.expr(rf"regexp_extract_all({text_col}, '\\S+', 0)")
    words = df.select(
        F.col(id_col), F.posexplode_outer(toks).alias("pos", "word")
    )
    placed = (
        words.join(F.broadcast(syms_tbl), "word", "left")
        .select(id_col, "pos", F.posexplode_outer("syms").alias("j", "sym"))
        .join(F.broadcast(sym_ids), "sym", "left")
    )
    return (
        placed.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "j", "tid"))
            ).alias("__packed")
        )
        .select(
            id_col,
            F.expr(
                "filter(transform(__packed, s -> s.tid), x -> x IS NOT NULL)"
            ).alias("ids"),
        )
        .withColumn("n_tokens", F.size("ids").cast("long"))
    )


def bpe_merges_df(df: DataFrame, n_merges: int = 16, text_col: str = "text") -> DataFrame:
    """:func:`learn_bpe_merges` as a DataFrame (step, lft, rgt, freq) —
    lft/rgt because LEFT/RIGHT are reserved in ANSI SQL engines."""
    rows = learn_bpe_merges(df, n_merges, text_col)
    spark = df.sparkSession
    return spark.createDataFrame(
        rows or [], "step int, lft string, rgt string, freq long"
    )


def hash_embed_expr(text_col: str, n_dims: int = 64) -> str:
    """Deterministic feature-hashing text embedder (the hashing-trick /
    SimHash-projection family): each token lands in bucket
    u32(md5(tok)) % n_dims with sign from the next hash bit, counts
    accumulate per dimension, and the vector L2-normalizes. Pure SQL on
    both engines — a REAL model (sentence transformer) drops into the
    same (text → array<double>) seam; this gives the pipeline a
    self-contained, cross-engine-exact default so the similarity stack
    runs end-to-end from raw text.

    IEEE determinism: integer counts → sqrt → divide are correctly-
    rounded operations, so Spark and DuckDB produce bit-identical
    doubles (the e9-rounded dot products downstream then match exactly).
    Empty/null text → the zero vector (callers filter or accept dot=0).
    """
    toks = rf"regexp_extract_all(coalesce({text_col}, ''), '\\S+', 0)"
    # per-token (dim, sign): dim = u32 % n_dims, sign from bit 2^8
    pairs = (
        f"transform({toks}, t -> named_struct("
        f"'d', CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT) % {n_dims}, "
        f"'s', CASE WHEN (CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT) DIV 256) % 2 = 0 "
        f"THEN 1 ELSE -1 END))"
    )
    counts = (
        f"transform(sequence(0, {n_dims - 1}), i -> "
        f"aggregate(filter({pairs}, p -> p.d = i), CAST(0 AS BIGINT), (a, p) -> a + p.s))"
    )
    # bind counts once, normalize (zero vector stays zero)
    return (
        f"element_at(transform(array({counts}), cs -> "
        f"CASE WHEN aggregate(cs, CAST(0 AS BIGINT), (a, x) -> a + x * x) = 0 "
        f"THEN transform(cs, x -> CAST(0.0 AS DOUBLE)) "
        f"ELSE transform(cs, x -> CAST(x AS DOUBLE) / "
        f"sqrt(CAST(aggregate(cs, CAST(0 AS BIGINT), (a, y) -> a + y * y) AS DOUBLE))) END), 1)"
    )


def hash_embed(df: DataFrame, n_dims: int = 64, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """(doc_id, embedding): see :func:`hash_embed_expr`. O(tokens·n_dims)
    per row (each dimension folds the row's own token-pair array) — a
    stateless map, no shuffle, no UDF; fine as the self-contained default
    and irrelevant once a real encoder occupies the seam."""
    return df.select(
        F.col(id_col).alias("vec_id"),
        F.expr(hash_embed_expr(text_col, n_dims)).alias("embedding"),
    )


def lm_bigram_scores(
    df: DataFrame,
    train_mod: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style n-gram LM quality scoring (Wenzek et al. 2020): train
    a bigram stupid-backoff LM (Brants et al. 2007, alpha=0.4) on a
    deterministic reference split (``doc_id % train_mod == 0`` — the
    in-corpus stand-in for CCNet's Wikipedia LM), then score EVERY
    document's bigrams against it. Per doc: ``n_bigrams``, ``n_backoff``
    (bigram instances unseen in training — the backoff branch is live
    because the LM is trained on a strict subset), and ``avg_nll_e9``,
    the average negative log-likelihood per bigram in integer
    nano-nats. High avg_nll = far from the reference distribution =
    CCNet's "tail".

    Determinism across engines: each per-instance log-prob is pinned to
    BIGINT nano-nats (``ROUND(LN(ratio) * 1e9)``) before any summation,
    so the per-doc reduction is exact integer addition in any order;
    the only floats are single LN calls on identical IEEE ratios (the
    bm25/idf precedent). ``avg_nll_e9 = (-sum) div n`` stays integer.

    Scale shape (the token_rarity family, no UDF anywhere):
    1. bigram instances partial-agg to (doc, w1, w2, count) — the
       shuffle carries distinct-bigrams-per-doc, not token instances;
    2. the LM tables (unigram + bigram counts over the train split) are
       vocabulary-bounded groupBys; they join back on token keys
       (shuffle joins — vocab² can exceed broadcast size at 100 TB);
    3. re-agg by doc. Docs with < 2 tokens emit no bigrams and are
       absent from the output (both engines agree by construction).
    Documents never carry text past the explode."""
    toks = F.expr(f"regexp_extract_all({text_col}, r'{TOKEN_RE}', 0)")
    base = df.select(F.col(id_col), toks.alias("__t")).where(F.size("__t") >= 2)
    big = base.select(
        id_col,
        F.explode(
            F.expr(
                "transform(sequence(1, size(__t) - 1), "
                "i -> named_struct('w1', __t[i-1], 'w2', __t[i]))"
            )
        ).alias("bg"),
    ).select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    inst = big.groupBy(id_col, "w1", "w2").agg(F.count("*").alias("in_doc"))
    is_train = F.col(id_col) % F.lit(train_mod) == 0
    uni = (
        df.where(is_train)
        .select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c1"))
    )
    tot = uni.agg(F.sum("c1").alias("n_train"))
    bigc = big.where(is_train).groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    j = (
        inst.join(bigc, ["w1", "w2"], "left")
        .join(uni.select(F.col("tok").alias("w1"), F.col("c1").alias("c1h")), "w1", "left")
        .join(uni.select(F.col("tok").alias("w2"), F.col("c1").alias("c1t")), "w2", "left")
        .crossJoin(F.broadcast(tot))
    )
    # per-instance log-prob in nano-nats; parenthesization mirrors the
    # DuckDB oracle text exactly so the doubles match bit-for-bit
    lp = F.expr(
        "CASE WHEN c2 IS NOT NULL THEN "
        "CAST(ROUND(LN(CAST(c2 AS DOUBLE) / CAST(c1h AS DOUBLE)) * 1e9) AS BIGINT) "
        "WHEN c1t IS NOT NULL THEN "
        "CAST(ROUND(LN(0.4 * (CAST(c1t AS DOUBLE) / CAST(n_train AS DOUBLE))) * 1e9) AS BIGINT) "
        "ELSE CAST(ROUND(LN(0.4 / (CAST(n_train AS DOUBLE) + 1.0)) * 1e9) AS BIGINT) END"
    )
    return (
        j.groupBy(id_col)
        .agg(
            F.sum("in_doc").alias("n_bigrams"),
            F.sum(
                F.when(F.col("c2").isNull(), F.col("in_doc")).otherwise(F.lit(0))
            ).cast("bigint").alias("n_backoff"),
            F.sum(F.col("in_doc") * lp).alias("__sum_lp"),
        )
        .select(
            id_col,
            F.col("n_bigrams").cast("bigint").alias("n_bigrams"),
            "n_backoff",
            F.expr("(-__sum_lp) div n_bigrams").alias("avg_nll_e9"),
        )
    )


def ccnet_buckets(
    scores: DataFrame,
    score_col: str = "avg_nll_e9",
    bin_width: int = 10_000_000,
) -> DataFrame:
    """CCNet head/middle/tail bucketing over an integer score column,
    WITHOUT a corpus-wide sort: scores fold into a centi-nat histogram
    (``bin = score div bin_width`` — additive, mergeable, value-range
    bounded at ~a few thousand bins), the tercile thresholds read off
    the cumulative bin counts (type-1: smallest bin whose cum count
    reaches ceil(total/3), ceil(2·total/3)), and each doc compares its
    bin to the two broadcast thresholds. Ties share a bin share a
    bucket — deterministic, no per-row rank. The no-partition window
    runs over the HISTOGRAM (≤ thousands of rows), never raw docs —
    the same stance as ``hist_quantiles``; at 10^10 docs the per-doc
    side stays a map-only fold + broadcast compare."""
    q = scores.withColumn("__qbin", F.expr(f"{score_col} div {bin_width}"))
    hist = q.groupBy("__qbin").agg(F.count("*").alias("n"))
    w = Window.orderBy("__qbin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = hist.select(
        "__qbin",
        F.sum("n").over(w).alias("cum"),
        F.sum("n").over(Window.partitionBy()).alias("total"),
    )
    th = cum.agg(
        F.min(F.when(F.expr("cum >= (total + 2) div 3"), F.col("__qbin"))).alias("__t1"),
        F.min(F.when(F.expr("cum >= (2 * total + 2) div 3"), F.col("__qbin"))).alias("__t2"),
    )
    return (
        q.crossJoin(F.broadcast(th))
        .withColumn(
            "bucket",
            F.expr(
                "CASE WHEN __qbin <= __t1 THEN 'head' "
                "WHEN __qbin <= __t2 THEN 'middle' ELSE 'tail' END"
            ),
        )
        .drop("__qbin", "__t1", "__t2")
    )


def dsir_weights(
    df: DataFrame,
    n_buckets: int = 1024,
    train_mod: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR hashed importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): per document, the
    log importance ratio Σ_tokens [ln p_target(bucket) − ln p_raw(bucket)]
    over hashed unigram features with add-1 smoothing, where *target* is
    the deterministic reference split (``doc_id % train_mod == 0`` — the
    same Wikipedia-proxy split as :func:`lm_bigram_scores`) and *raw* is
    everything else. High ``lw_sum_e9`` = looks like the target
    distribution = keep/up-sample when building a training mix.

    Determinism: the per-BUCKET log-ratio is pinned to BIGINT nano-nats
    once (single LN calls on identical IEEE doubles — the bm25/idf
    precedent), so every per-doc reduction is exact integer addition.
    No division in the output (callers normalize by ``n_tokens``; integer
    div of negatives differs between engines, so we don't).

    Scale shape: the feature space is CAPPED at ``n_buckets`` (the whole
    point of hashed DSIR) — the bucket stats table is ≤ n_buckets rows
    whatever the corpus size, computed by one partial-agg groupBy and
    joined back BROADCAST; per-doc work is explode → (doc, bucket)
    partial agg → broadcast join → re-agg. Hash = the repo-wide seeded
    md5-u32 convention (``sketch.u32_expr``), so the DuckDB twin is the
    same md5 algebra."""
    from .sketch import u32_expr

    toks = F.expr(f"regexp_extract_all({text_col}, r'{TOKEN_RE}', 0)")
    seeded = "concat('dsir:', tok)"
    bucket = F.expr(f"({u32_expr(seeded)} % {n_buckets})")
    inst = (
        df.select(id_col, F.explode(toks).alias("tok"))
        .select(id_col, bucket.alias("b"))
        .groupBy(id_col, "b")
        .agg(F.count("*").alias("in_doc"))
    )
    is_train = F.col(id_col) % F.lit(train_mod) == 0
    t_case = F.when(is_train, F.col("in_doc")).otherwise(F.lit(0))
    r_case = F.when(is_train, F.lit(0)).otherwise(F.col("in_doc"))
    tot = inst.agg(
        F.sum(t_case).cast("bigint").alias("n_t"),
        F.sum(r_case).cast("bigint").alias("n_r"),
    )
    bkt = inst.groupBy("b").agg(
        F.sum(t_case).cast("bigint").alias("c_t"),
        F.sum(r_case).cast("bigint").alias("c_r"),
    )
    delta = bkt.crossJoin(F.broadcast(tot)).select(
        "b",
        F.expr(
            "CAST(ROUND((LN((CAST(c_t AS DOUBLE) + 1.0) / "
            f"(CAST(n_t AS DOUBLE) + {float(n_buckets)})) "
            "- LN((CAST(c_r AS DOUBLE) + 1.0) / "
            f"(CAST(n_r AS DOUBLE) + {float(n_buckets)}))) * 1e9) AS BIGINT)"
        ).alias("d_e9"),
    )
    return (
        inst.join(F.broadcast(delta), "b")
        .groupBy(id_col)
        .agg(
            F.sum("in_doc").cast("bigint").alias("n_tokens"),
            F.sum(F.col("in_doc") * F.col("d_e9")).cast("bigint").alias("lw_sum_e9"),
        )
    )


def assign_splits(
    df: DataFrame,
    weights_ppm: "dict[str, int] | None" = None,
    id_col: str = "doc_id",
    group_col: str | None = None,
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: ``split`` column from a
    salted md5-u32 hash of the split UNIT, bucketed by cumulative
    parts-per-million weights (integer-exact; the mix_weights hex-u32
    trick, so a DuckDB oracle reproduces every assignment bit-for-bit).

    ``group_col`` is the leakage guard: hash the GROUP (near-dup
    cluster_id, host, source…) instead of the row id, and every member of
    a group lands in the SAME split — near-duplicates can never straddle
    train/test (the contamination mode a row-wise split silently causes;
    compose with dedup.neardup_clusters for cluster-safe splits).

    Deterministic under repartition, stable across runs/engines, and a
    different ``salt`` re-deals the whole assignment (fresh fold) without
    touching the data. Map-only — no shuffle, no RNG state."""
    weights_ppm = weights_ppm or {"train": 900_000, "val": 50_000, "test": 50_000}
    total = sum(weights_ppm.values())
    if total != 1_000_000:
        raise ValueError(f"weights_ppm must sum to 1000000, got {total}")
    if any(w < 0 for w in weights_ppm.values()):
        raise ValueError("negative split weight")
    unit = group_col or id_col
    h = (
        f"CAST(conv(substring(md5(concat('{salt}', CAST({unit} AS STRING))), "
        f"1, 8), 16, 10) AS BIGINT) % 1000000"
    )
    cum = 0
    branches = []
    for name, w in weights_ppm.items():
        cum += w
        branches.append(f"WHEN __h < {cum} THEN '{name}'")
    return (
        df.withColumn("__h", F.expr(h))
        .withColumn("split", F.expr("CASE " + " ".join(branches) + " END"))
        .drop("__h")
    )
