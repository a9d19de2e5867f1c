"""Pipeline orchestration: S0 webtext -> S5 triples, batch or incremental.

``run_pipeline`` is the pure dataflow (DataFrame in, DataFrame out) — used
by tests, bench, and __spark_entry__. ``run_incremental`` wraps it with
checkpoint/resume + per-partition lineage (north_rule).
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException

from esmarc_spark.pipeline.canonicalize import canonical_mapping, rewrite_through_canonical
from esmarc_spark.pipeline.extract_text import dedup_by_url, with_extracted_text
from esmarc_spark.pipeline.link import link_mentions
from esmarc_spark.pipeline.materialize import (
    linked_to_triples,
    linked_to_triples_partitioned,
)
from esmarc_spark.pipeline.mentions import (
    detect_mentions,
    detect_mentions_ngram,
    detect_mentions_tokenized,
)
from esmarc_spark.pipeline.checkpoint import CheckpointStore


# Gopher-style repetition gate defaults: (max dup_line_frac,
# max dup_char_frac, max top_bigram_frac)
GOPHER_REPETITION_THRESHOLDS: tuple[float, float, float] = (0.30, 0.20, 0.18)


def _host_authority_gate(
    df: DataFrame,
    host_ranks: DataFrame,
    min_rank_scaled: int,
    keep_unranked: bool,
) -> DataFrame:
    """Drop rows whose url host ranks below ``min_rank_scaled`` in the
    (host, rank_scaled) dim — shared by prepare_docs (stage 1b) and the
    batch backfill, which must run it on the UNFOLDED url (ADVICE r6 #1:
    host_of() over a pday-folded url returns '' and the gate silently
    no-ops / drops everything)."""
    from esmarc_spark.ops.urlnorm import host_of

    keyed = df.withColumn("__host", host_of(F.col("url")))
    if keep_unranked:
        gate_side = host_ranks.where(
            F.col("rank_scaled") < min_rank_scaled
        ).select(F.col("host").alias("__host"))
        return keyed.join(gate_side, "__host", "anti").drop("__host")
    gate_side = host_ranks.where(
        F.col("rank_scaled") >= min_rank_scaled
    ).select(F.col("host").alias("__host"))
    return keyed.join(gate_side, "__host", "semi").drop("__host")


def prepare_docs(
    webtext: DataFrame,
    *,
    canonical_url_dedup: bool = False,
    percent_normalize: bool = False,
    drop_noindex: bool = False,
    rel_canonical_dedup: bool = False,
    main_content: bool = False,
    charset_aware: bool = False,
    legacy_charsets: bool = False,
    host_blocklist: DataFrame | None = None,
    robots: DataFrame | None = None,
    host_ranks: DataFrame | None = None,
    min_rank_scaled: int = 0,
    keep_unranked: bool = True,
    mojibake_repair: bool = False,
    dedup_lines_min_docs: int | None = None,
    dedup_spans_k: int | None = None,
    repetition_thresholds: tuple[float, float, float] | None = None,
    badword_list=None,
    pii_scrub: bool = False,
    url_dedup: bool = True,
    dedup_scope: F.Column | None = None,
) -> DataFrame:
    """The shared S0.5-S1.5 curation front-end: webtext in, curated docs
    out. ``run_pipeline`` and the streaming foreachBatch runner both call
    THIS function, so batch and streaming curation semantics are identical
    by construction (round 6 — VERDICT r5 #7).

    ``dedup_scope`` (internal, round 7): a Column over the doc row that
    scopes the CORPUS for stages 3b/3c — line/span frequencies are
    counted per scope value instead of over the whole input. The batch
    backfill passes the folded pday prefix so one-job counts equal the
    per-day loop's; leave None everywhere else.

    Stage order (each gate only pays for rows the previous one kept):

    1. host blocklist — url-only anti join, before anything touches html;
    1a. robots gate — when ``robots`` (host, robots_txt) is given, drop
       pages a *-agent robots.txt disallows (ops.robots: RFC 9309
       grouped-agent parsing, wildcard/$ rules, longest-match with
       Allow winning ties). URL-only like the blocklist — compliance
       runs before any content is touched, so removal requests can be
       honored without re-extracting anything;
    1b. host-authority gate — when ``host_ranks`` (host, rank_scaled —
       ops.linkgraph.pagerank output) is given, drop rows whose host
       ranks below ``min_rank_scaled``; hosts absent from the rank
       table pass by default (``keep_unranked=False`` flips to strict
       allowlisting). CCNet-style quality stratification by link
       authority, applied before anything touches html;
    1c. noindex gate — when ``drop_noindex``, pages carrying a
       meta-robots noindex directive are dropped (ops.pagemeta;
       map-only regex). BEFORE any dedup, so a noindex page can
       neither survive a group nor displace an indexable duplicate;
    2. canonical-url dedup — collapses url variants before S1 (with
       ``percent_normalize``, RFC 3986 safe percent normalization is
       applied to the grouping key first — /%41b and /Ab collapse);
    2b. declared-canonical dedup — when ``rel_canonical_dedup``, one
       row per rel=canonical declaration (ops.pagemeta) — collapses
       print/mobile/session duplicates whose urls normalize
       differently; same max_by(warc_ts, url) survivor rule;
    3. legacy-charset decode + S1 extraction (+ per-url dedup unless
       ``url_dedup=False`` — the streaming path defers cross-batch url
       dedup to the downstream idempotent sink);
    3a. mojibake repair — when ``mojibake_repair``, undo UTF-8-as-cp1252
       damage in ``text`` (ops.mojibake). BEFORE content-based dedup and
       gating so repaired text can't split dup groups or skew stats;
    3b. cross-doc line dedup — when ``dedup_lines_min_docs`` is set,
       strip lines occurring in >= that many documents of THIS input
       (ops.line_dedup). Requires ``url_dedup`` (the row key must be
       unique) — the streaming runner's per-batch path therefore does
       not accept it; corpus-level line state across batches belongs to
       a batch backfill, not a micro-batch. Runs BEFORE the repetition
       gate so the gate judges real content, not shared boilerplate;
    3c. duplicated-span removal — when ``dedup_spans_k`` is set, cut
       every span duplicated corpus-wide at that k-gram granularity
       (ops.span_dedup, ExactSubstr semantics). Same unique-row-key
       requirement as 3b;
    4. repetition gate — row-local Gopher dup-line/char/top-bigram
       fractions vs ``repetition_thresholds`` (see
       GOPHER_REPETITION_THRESHOLDS);
    4b. bad-words gate — ``badword_list`` (True for the vendored C4-style
       default list, or an iterable of words): any word-boundary hit
       drops the page (ops.badwords). Map-only;
    5. PII scrub — rewrites ``text`` in place. Runs AFTER the repetition
       gate (documented order: gating sees the original text, scrubbed
       placeholders can't shift the repetition stats).

    Every gate except 1b is a map-only expression or a broadcast anti
    join — no new shuffle for any combination of those flags. The
    host-authority gate is an equi-join on the map-side-derived host:
    at web scale the rank dim (~10^8 hosts) exceeds broadcast limits,
    so it plans as a one-shuffle hash join (AQE downgrades it to a
    broadcast automatically whenever the filtered rank side is small)."""
    if host_blocklist is not None:
        from esmarc_spark.ops.urlnorm import filter_by_host_blocklist

        webtext = filter_by_host_blocklist(webtext, host_blocklist)
    if robots is not None:
        from esmarc_spark.ops.robots import robots_gate

        # key by url: the verdict is a pure function of the url, so
        # recrawl duplicates share one verdict row and all copies of a
        # disallowed url drop together (no unique row key needed here)
        webtext = robots_gate(webtext, robots, key_col="url")
    if host_ranks is not None:
        webtext = _host_authority_gate(
            webtext, host_ranks, min_rank_scaled, keep_unranked
        )
    if drop_noindex:
        from esmarc_spark.ops.pagemeta import filter_noindex

        webtext = filter_noindex(webtext)
    if canonical_url_dedup:
        from esmarc_spark.ops.urlnorm import dedup_by_canonical_url

        webtext = dedup_by_canonical_url(
            webtext, percent_normalize=percent_normalize
        )
    if rel_canonical_dedup:
        from esmarc_spark.ops.pagemeta import dedup_by_declared_canonical

        webtext = dedup_by_declared_canonical(webtext)
    if legacy_charsets:
        from esmarc_spark.pipeline.extract_text import extract_legacy_text

        # same main_content flag as with_extracted_text below, so legacy
        # and JVM-decoded rows get identical extraction semantics
        webtext = extract_legacy_text(webtext, main_content=main_content)
    docs = with_extracted_text(
        webtext, main_content=main_content, charset_aware=charset_aware
    )
    if url_dedup:
        docs = dedup_by_url(docs)
    if mojibake_repair:
        from esmarc_spark.ops.mojibake import fix_mojibake_deep, repair_mojibake

        # 3a. encoding repair — BEFORE any content-based dedup/gating, so
        # repaired text can't split dup groups or skew repetition stats;
        # map-only chained replace, no shuffle. True = one pass; an int
        # >= 2 runs that many passes (fix_mojibake_deep — doubly-encoded
        # crawl damage needs two; round 7, VERDICT r6 #3)
        passes = 1 if mojibake_repair is True else int(mojibake_repair)
        if passes <= 1:
            docs = docs.withColumn("text", repair_mojibake("text"))
        else:
            docs = fix_mojibake_deep(docs, "text", passes=passes).drop(
                *[f"n_repaired_p{k}" for k in range(1, passes + 1)]
            )
    if dedup_lines_min_docs is not None:
        if not url_dedup:
            raise ValueError(
                "dedup_lines_min_docs needs unique row keys: enable "
                "url_dedup (the streaming per-batch path does not "
                "support corpus-level line dedup)"
            )
        from esmarc_spark.ops.line_dedup import remove_duplicate_lines

        cleaned = remove_duplicate_lines(
            docs.select("url", "text"),
            dedup_lines_min_docs,
            id_col="url",
            group_expr=dedup_scope,
        )
        docs = docs.drop("text").join(
            cleaned.select("url", "text"), "url"
        )
    if dedup_spans_k is not None:
        if not url_dedup:
            raise ValueError(
                "dedup_spans_k needs unique row keys: enable url_dedup "
                "(corpus-level span state belongs to a batch backfill, "
                "not a micro-batch)"
            )
        from esmarc_spark.ops.span_dedup import remove_duplicate_spans

        cleaned = remove_duplicate_spans(
            docs.select("url", "text"),
            k=dedup_spans_k,
            id_col="url",
            group_expr=dedup_scope,
        )
        docs = docs.drop("text").join(
            cleaned.select(
                "url", F.col("clean_text").alias("text")
            ),
            "url",
        )
    if repetition_thresholds is not None:
        from esmarc_spark.ops.text import (
            duplicate_line_char_fraction,
            duplicate_line_fraction,
            top_bigram_fraction,
        )

        max_line, max_char, max_bigram = repetition_thresholds
        docs = docs.where(
            (duplicate_line_fraction("text") <= max_line)
            & (duplicate_line_char_fraction("text") <= max_char)
            & (top_bigram_fraction("text") <= max_bigram)
        )
    if badword_list is not None:
        from esmarc_spark.ops.badwords import badword_stats

        words = None if badword_list is True else badword_list
        docs = (
            badword_stats(docs, words)
            .where("keep")
            .drop("badword_count", "keep")
        )
    if pii_scrub:
        from esmarc_spark.ops.pii import scrub_pii

        docs = docs.withColumn("text", scrub_pii("text"))
    return docs


def run_pipeline(
    webtext: DataFrame,
    gazetteer: DataFrame,
    same_as_edges: DataFrame | None = None,
    canonical_map: DataFrame | None = None,
    mentions_mode: str = "ngram",
    source_index: str = "webtext",
    canonical_url_dedup: bool = False,
    percent_normalize: bool = False,
    drop_noindex: bool = False,
    rel_canonical_dedup: bool = False,
    main_content: bool = False,
    charset_aware: bool = False,
    legacy_charsets: bool = False,
    host_blocklist: DataFrame | None = None,
    robots: DataFrame | None = None,
    host_ranks: DataFrame | None = None,
    min_rank_scaled: int = 0,
    keep_unranked: bool = True,
    mojibake_repair: bool = False,
    dedup_lines_min_docs: int | None = None,
    dedup_spans_k: int | None = None,
    repetition_thresholds: tuple[float, float, float] | None = None,
    badword_list=None,
    pii_scrub: bool = False,
) -> DataFrame:
    """S1 extract -> dedup -> S2 mentions -> S3 link -> (S4 canonicalize)
    -> S5 triples. Returns the triples DataFrame (lazy).

    mentions_mode: "ngram" (default — JVM-only token n-gram join, the hot
    path that scales), "regex" (pandas-UDF char-offset scan; exact
    word-boundary semantics incl. punctuation-adjacent matches), or "token"
    (single-token JVM join).

    Pass ``canonical_map`` (precomputed uri->canonical dim) when calling in
    a loop — recomputing connected components per partition would repeat the
    iterative join cascade for every partition.

    The round-5 crawl-curation knobs (all default OFF — the defaults
    keep the byte-identical contract the parity gates pin):

    * canonical_url_dedup: collapse case/port/tracking-param url
      variants (ops.urlnorm) BEFORE extraction, so doomed duplicate
      rows never pay S1; runs in front of the per-url dedup, which then
      only breaks exact-recrawl ties.
    * main_content / charset_aware: forwarded to with_extracted_text
      (boilerplate removal; header/meta charset decode).
    * legacy_charsets: pre-fill text for Shift-JIS/GBK/... rows via the
      split-union Arrow path (extract_legacy_text) — only the declared-
      legacy minority crosses into Python.

    The round-6 curation knobs (also default OFF; see ``prepare_docs``
    for stage order and scale notes):

    * host_blocklist: one-column ``host`` dim; rows whose url host is a
      blocked host or a subdomain of one are dropped before S1.
    * robots: (host, robots_txt) dim — RFC 9309 *-agent compliance gate
      (ops.robots), url-only, applied right after the blocklist.
    * host_ranks + min_rank_scaled (+ keep_unranked): link-authority
      gate — drop rows from hosts whose ops.linkgraph.pagerank
      rank_scaled falls below the floor.
    * mojibake_repair: undo UTF-8-as-cp1252 damage baked into the
      source bytes (ops.mojibake chained-replace, map-only) right
      after extraction, before any content-based dedup or gating.
    * repetition_thresholds: (dup_line, dup_char, top_bigram) maxima —
      e.g. GOPHER_REPETITION_THRESHOLDS — applied to extracted text.
    * pii_scrub: redact email/IPv4/phone in ``text`` before mentions.

    The round-7 page-directive knobs (default OFF):

    * drop_noindex: honor meta-robots noindex (ops.pagemeta) before any
      dedup — a noindex page can neither survive nor displace an
      indexable duplicate.
    * rel_canonical_dedup: one row per rel=canonical declaration —
      collapses print/mobile/session duplicates whose urls normalize
      differently (same max_by(warc_ts, url) survivor rule as
      canonical_url_dedup).
    """
    docs = prepare_docs(
        webtext,
        canonical_url_dedup=canonical_url_dedup,
        percent_normalize=percent_normalize,
        drop_noindex=drop_noindex,
        rel_canonical_dedup=rel_canonical_dedup,
        main_content=main_content,
        charset_aware=charset_aware,
        legacy_charsets=legacy_charsets,
        host_blocklist=host_blocklist,
        robots=robots,
        host_ranks=host_ranks,
        min_rank_scaled=min_rank_scaled,
        keep_unranked=keep_unranked,
        mojibake_repair=mojibake_repair,
        dedup_lines_min_docs=dedup_lines_min_docs,
        dedup_spans_k=dedup_spans_k,
        repetition_thresholds=repetition_thresholds,
        badword_list=badword_list,
        pii_scrub=pii_scrub,
    )
    if mentions_mode == "ngram":
        mentions = detect_mentions_ngram(docs, gazetteer)
    elif mentions_mode == "token":
        mentions = detect_mentions_tokenized(docs, gazetteer)
    else:
        surfaces = [r["surface_form"] for r in gazetteer.select("surface_form").distinct().collect()]
        mentions = detect_mentions(docs, surfaces)
    linked = link_mentions(mentions, gazetteer)
    if canonical_map is None and same_as_edges is not None:
        canonical_map = canonical_mapping(same_as_edges)
    if canonical_map is not None:
        linked = rewrite_through_canonical(linked, canonical_map, "canonical_url")
    return linked_to_triples(linked, source_index=source_index)


def _curated_day_docs(
    partitioned: DataFrame, days: list[str], curation: dict | None
) -> DataFrame:
    """The batch-shaped curation front-end over day partitions: every
    URL-READING gate (blocklist, host-authority rank gate, per-(pday)
    canonical dedup) runs BEFORE the pday fold — a folded
    '2024-01-01https://...' url would make host_of() return '' and
    silently no-op the host gates (ADVICE r6 #1) — then the row-local
    prepare_docs gates run over the folded frame. The corpus-scoped
    line/span dedup stages count frequencies per pday (the folded url's
    fixed-width prefix) so the one-job backfill stays byte-identical per
    day to the loop path with ANY flag combination (tested)."""
    part = partitioned.where(F.col("pday").isin(days))
    cur = dict(curation or {})
    host_bl = cur.pop("host_blocklist", None)
    robots = cur.pop("robots", None)
    host_ranks = cur.pop("host_ranks", None)
    min_rank_scaled = cur.pop("min_rank_scaled", 0)
    keep_unranked = cur.pop("keep_unranked", True)
    canon = cur.pop("canonical_url_dedup", False)
    pct = cur.pop("percent_normalize", False)
    noindex = cur.pop("drop_noindex", False)
    rel_canon = cur.pop("rel_canonical_dedup", False)
    work = part
    if host_bl is not None:
        from esmarc_spark.ops.urlnorm import filter_by_host_blocklist

        work = filter_by_host_blocklist(work, host_bl)
    if robots is not None:
        # prepare_docs stage 1a, on the UNFOLDED url (url-reading gate
        # like the blocklist — a folded url has no parseable host)
        from esmarc_spark.ops.robots import robots_gate

        work = robots_gate(work, robots, key_col="url")
    if host_ranks is not None:
        # prepare_docs stage 1b, on the UNFOLDED url (a pure row filter
        # — day-independent by construction)
        work = _host_authority_gate(
            work, host_ranks, min_rank_scaled, keep_unranked
        )
    if noindex:
        # stage 1c, html-only row filter — fold-independent, runs with
        # the other pre-fold gates for symmetry
        from esmarc_spark.ops.pagemeta import filter_noindex

        work = filter_noindex(work)
    if canon:
        from esmarc_spark.ops.urlnorm import dedup_by_canonical_url

        work = dedup_by_canonical_url(
            work, group_cols=("pday",), percent_normalize=pct
        )
    if rel_canon:
        # stage 2b on the UNFOLDED url (the key falls back to the raw
        # url for undeclared pages), grouped per pday like stage 2
        from esmarc_spark.ops.pagemeta import dedup_by_declared_canonical

        work = dedup_by_declared_canonical(work, group_cols=("pday",))
    keyed = work.withColumn("url", F.concat(F.col("pday"), F.col("url")))
    return prepare_docs(
        keyed, dedup_scope=F.substring(F.col("url"), 1, 10), **cur
    )


def _folded_docs_to_triples(
    docs: DataFrame, gazetteer: DataFrame, canonical_map: DataFrame | None
) -> DataFrame:
    """S2-S5 over folded-url docs; splits pday back out for the
    partitioned triple emission."""
    mentions = detect_mentions_ngram(docs, gazetteer)
    linked = link_mentions(mentions, gazetteer)
    if canonical_map is not None:
        linked = rewrite_through_canonical(linked, canonical_map, "canonical_url")
    linked = linked.withColumn("pday", F.substring("url", 1, 10)).withColumn(
        "url", F.expr("substring(url, 11)")
    )
    return linked_to_triples_partitioned(linked)


def _corpus_dedup_apply(
    spark: SparkSession,
    partitioned: DataFrame,
    curation: dict | None,
    corpus_dedup: dict,
    dump_id: str,
    docs: DataFrame,
) -> DataFrame:
    """Corpus-level near-dup dedup of one new dump of folded-url docs
    against the persisted signature state (round 6 — the run_incremental
    hook for ops.dedup_incremental).

    Doc identity is DAY-ORDERED: (days-since-epoch << 47) | 47-bit hash
    of (pday, raw_url). dedup_incremental's min-id cluster
    representative therefore means FIRST-INGESTED-DAY wins — a later
    recrawl or syndicated copy can never demote a doc whose triples an
    earlier day already published, keeping the emission append-only;
    within one day the 47-bit hash breaks ties deterministically
    (collision odds ~n²/2^48 per day — negligible below ~10^7 docs/day).
    Known limitation, documented: a new doc that MERGES two historical
    clusters cannot retract the younger root's already-published
    triples; the global survivor view (ops.dedup_incremental.
    incremental_survivors) remains exact for downstream consumers.

    History docs are rebuilt lazily from the provided webtext frame for
    the committed days (only ever read through the candidate semi-join);
    the caller must keep the curation flags constant across runs of one
    state_root (the signatures were computed from curated text)."""
    from esmarc_spark.ops.dedup_incremental import (
        DedupState,
        dedup_incremental_dump,
    )

    pday_col = F.substring("url", 1, 10)
    day_idx = F.datediff(F.to_date(pday_col), F.to_date(F.lit("1970-01-01")))
    doc_id = day_idx.cast("long") * F.lit(1 << 47) + F.pmod(
        F.xxhash64(pday_col, F.expr("substring(url, 11)")), F.lit(1 << 47)
    )
    state_root = corpus_dedup["state_root"]
    committed = DedupState(state_root).manifest()["dumps"]
    hist = None
    if committed:
        days = sorted({d for dump in committed for d in dump.split("|")})
        hist = _curated_day_docs(partitioned, days, curation).withColumn(
            "doc_id", doc_id
        )
    opts = {k: v for k, v in corpus_dedup.items() if k != "state_root"}
    surv = dedup_incremental_dump(
        spark,
        docs.withColumn("doc_id", doc_id),
        state_root,
        dump_id,
        history_docs=hist,
        **opts,
    )
    return surv.drop("doc_id")


def _backfill_one_job(
    spark: SparkSession,
    store: CheckpointStore,
    partitioned: DataFrame,
    gazetteer: DataFrame,
    canonical_map: DataFrame | None,
    pending: list[str],
    out_root: str,
    run_id: str,
    curation: dict | None = None,
    corpus_dedup: dict | None = None,
) -> list[str]:
    """All pending day partitions in ONE Spark write job (round 5 —
    VERDICT r4 #2 perf-weak item: the per-day driver loop serialized a
    3-year backfill into ~1100 jobs; at 100x scale the DRIVER, not the
    cluster, set the floor).

    Per-day semantics are preserved exactly — the output is byte-
    identical to the loop — by keying every url-keyed stage on
    (pday, url): ``pday`` is a fixed-width 10-char prefix folded into
    the url through S1-S3 (one column concat; no extra shuffle key
    plumbing through the operators), split back out before the
    pday-aware triple emission. Lineage rows come from two grouped
    aggregations (input docs/watermark; written triples/mentions)
    instead of 3 driver actions per day; ``wall_sec`` carries the whole
    backfill's wall on each row (documented coarsening — the loop's
    per-day timing is meaningless inside one job).

    Crash granularity is the whole backfill (no lineage rows are
    recorded until the write commits), and the write is the same
    idempotent dynamic-partition overwrite — a re-run replaces, never
    duplicates.

    ``curation`` (round 6) carries prepare_docs flags. Row-local gates
    (repetition, PII, charset, legacy decode) apply to the folded frame
    unchanged — they never read the url. The two NON-row-local gates run
    BEFORE the pday fold, because a folded "2024-01-01https://..." url
    would defeat host parsing and url canonicalization: the host
    blocklist is a row-level filter (day-independent by construction),
    and canonical dedup groups per (pday, canonical_url) via
    ``group_cols`` so the winner set is byte-identical to the per-day
    loop."""
    t0 = time.time()
    part = partitioned.where(F.col("pday").isin(pending))
    docs = _curated_day_docs(partitioned, pending, curation)
    if corpus_dedup is not None:
        # one dump for the whole backlog: the dump partitioning does not
        # change the survivor set (dedup_incremental's equality guarantee
        # holds for any dump sequence — tested loop vs batch)
        docs = _corpus_dedup_apply(
            spark, partitioned, curation, corpus_dedup, "|".join(pending), docs
        )
    triples = _folded_docs_to_triples(docs, gazetteer, canonical_map)
    triples.write.mode("overwrite").partitionBy("pday").parquet(
        f"{out_root}/triples"
    )

    try:
        # filter on the RAW partition column first — casting pday before
        # the filter would wrap the partition column in an expression and
        # defeat partition pruning, turning the lineage count-back into a
        # full scan of every day ever written. Partition inference types
        # pday as DATE, so the IN-list literals are coerced (not the
        # column); the string cast happens after, for the lineage keys.
        written = spark.read.parquet(f"{out_root}/triples")
        written = (
            written.where(F.col("pday").isin(pending))
            .withColumn("pday", F.col("pday").cast("string"))
        )
        tcounts = {
            r["pday"]: r
            for r in written.groupBy("pday")
            .agg(
                F.count("*").alias("n_triples"),
                F.count(F.when(F.col("pred") == "mentions", 1)).alias(
                    "n_mentions"
                ),
            )
            .collect()
        }
    except AnalysisException as exc:
        # ONLY the empty-path shape (zero-mention backfill: nothing has
        # ever been written under triples/) maps to zero counts. Any
        # other failure — corrupt footer, transient store error — must
        # propagate: swallowing it would record status='done' with
        # n_triples=0 for every pending day, corrupting lineage while
        # marking the partitions complete.
        msg = str(exc)
        if not (
            "PATH_NOT_FOUND" in msg
            or "UNABLE_TO_INFER_SCHEMA" in msg
            or "unable to infer schema" in msg.lower()
        ):
            raise
        tcounts = {}
    dcounts = {
        r["pday"]: r
        for r in part.groupBy("pday")
        .agg(F.count("*").alias("n_docs"), F.max("warc_ts").alias("wm"))
        .collect()
    }
    wall = time.time() - t0
    store.record(
        [
            {
                "pday": pday,
                "status": "done",
                "watermark_ts": dcounts[pday]["wm"] if pday in dcounts else None,
                "run_id": run_id,
                "n_docs": dcounts[pday]["n_docs"] if pday in dcounts else 0,
                "n_mentions": tcounts[pday]["n_mentions"] if pday in tcounts else 0,
                "n_triples": tcounts[pday]["n_triples"] if pday in tcounts else 0,
                "wall_sec": wall,
            }
            for pday in pending
        ]
    )
    return list(pending)


def run_incremental(
    spark: SparkSession,
    webtext: DataFrame,
    gazetteer: DataFrame,
    out_root: str,
    same_as_edges: DataFrame | None = None,
    fail_after_partitions: int | None = None,
    mode: str = "auto",
    curation: dict | None = None,
    corpus_dedup: dict | None = None,
) -> dict:
    """Checkpoint-resumable run over days(warc_ts) partitions.

    mode="auto" (default): a multi-day backlog is written as ONE
    dynamic-partition-overwrite job (``_backfill_one_job``); a single
    pending day — the steady-state incremental tail — and injected-
    failure test runs use the per-day loop. "loop"/"batch" force a path.

    ``fail_after_partitions`` injects a crash for the kill/rerun test
    (implies the loop path — the injection point is between partitions).
    Returns a lineage summary dict.

    ``curation`` (round 6) forwards prepare_docs flags — the loop path
    hands them to ``run_pipeline`` verbatim; the batch path applies the
    same gates with per-day grouping (see ``_backfill_one_job``), so
    both paths stay byte-identical with any flag combination (tested).

    ``corpus_dedup`` (round 6 — the hook VERDICT r5 #2 asked for) wires
    ops.dedup_incremental into the production run: each new day (loop:
    one dump per day; batch: one dump for the backlog) is near-dup
    deduped against the PERSISTED corpus signature state before
    mentions, so a recrawl or syndicated copy of an already-ingested
    page emits no triples. Keys: ``state_root`` (fsio-capable URI,
    required) plus optional dedup_incremental_dump tuning
    (threshold/num_hashes/bands/shingle_k/max_bucket_size). The final
    survivor set equals from-scratch dedup_corpus over the whole curated
    corpus regardless of the dump partitioning, so loop and batch stay
    byte-identical (tested). Keep the curation flags constant for the
    lifetime of one state_root.
    """
    store = CheckpointStore(spark, out_root)
    run_id = uuid.uuid4().hex[:12]
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    canonical_map = None
    if same_as_edges is not None:
        # CC once for the whole run, not once per partition; the mapping dim
        # is small (∝ linked-entity count) so cache + broadcast downstream.
        canonical_map = canonical_mapping(same_as_edges).cache()
        canonical_map.count()

    partitioned = webtext.withColumn("pday", F.date_format("warc_ts", "yyyy-MM-dd"))
    all_days = [r["pday"] for r in partitioned.select("pday").distinct().collect()]
    done = {r["pday"] for r in store.completed_partitions().collect()}
    pending = sorted(set(all_days) - done)

    use_batch = mode == "batch" or (
        mode == "auto" and fail_after_partitions is None and len(pending) > 1
    )
    if use_batch:
        processed = _backfill_one_job(
            spark, store, partitioned, gazetteer, canonical_map,
            pending, out_root, run_id, curation, corpus_dedup,
        )
        return {
            "run_id": run_id,
            "processed": processed,
            "skipped_done": sorted(done & set(all_days)),
            "out": f"{out_root}/triples",
        }

    processed = []
    for n, pday in enumerate(pending):
        if fail_after_partitions is not None and n >= fail_after_partitions:
            raise RuntimeError(f"injected failure before partition {pday}")
        t0 = time.time()
        part = partitioned.where(F.col("pday") == pday)
        if corpus_dedup is not None:
            # the folded-url composition (byte-identical to run_pipeline
            # per day — tested), so the dump's doc identity matches the
            # batch path and the persisted state
            docs = _curated_day_docs(partitioned, [pday], curation)
            docs = _corpus_dedup_apply(
                spark, partitioned, curation, corpus_dedup, pday, docs
            )
            triples = _folded_docs_to_triples(docs, gazetteer, canonical_map)
        else:
            triples = run_pipeline(
                part, gazetteer, canonical_map=canonical_map, source_index=pday,
                **(curation or {}),
            ).withColumn("pday", F.lit(pday))
        triples.write.mode("overwrite").partitionBy("pday").parquet(
            f"{out_root}/triples"
        )
        written = spark.read.parquet(f"{out_root}/triples").where(
            F.col("pday") == pday
        )
        counts = written.agg(
            F.count("*").alias("n_triples"),
            F.count(F.when(F.col("pred") == "mentions", 1)).alias("n_mentions"),
        ).collect()[0]
        metrics = part.agg(
            F.count("*").alias("n_docs"), F.max("warc_ts").alias("wm")
        ).collect()[0]
        store.record(
            [
                {
                    "pday": pday,
                    "status": "done",
                    "watermark_ts": metrics["wm"],
                    "run_id": run_id,
                    "n_docs": metrics["n_docs"],
                    "n_mentions": counts["n_mentions"],
                    "n_triples": counts["n_triples"],
                    "wall_sec": time.time() - t0,
                }
            ]
        )
        processed.append(pday)
    return {
        "run_id": run_id,
        "processed": processed,
        "skipped_done": sorted(done & set(all_days)),
        "out": f"{out_root}/triples",
    }
