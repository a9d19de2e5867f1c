"""Kill/rerun resumability: an interrupted incremental run, resumed, must
produce byte-identical output to one uninterrupted run — no duplicates —
and per-partition lineage rows must exist (north_rule)."""

import pytest

from esmarc_spark.pipeline.run import run_incremental
from esmarc_spark.pipeline.webtext import gazetteer_df, synth_webtext


@pytest.fixture()
def inputs(spark):
    # 3 distinct warc_ts days
    from pyspark.sql import functions as F

    wt = synth_webtext(spark, n_docs=120, partitions=4, dup_fraction=0).withColumn(
        "warc_ts",
        F.timestamp_seconds(
            F.lit(1700000000) + F.pmod(F.xxhash64("url"), F.lit(3)) * 86400
        ),
    )
    return wt.cache(), gazetteer_df(spark)


def _read_triples(spark, root):
    return {
        (r.subj, r.pred, r.obj, r.pday)
        for r in spark.read.parquet(f"{root}/triples").collect()
    }


def test_kill_and_resume(spark, tmp_path, inputs):
    webtext, gaz = inputs
    golden_root = str(tmp_path / "golden")
    run_incremental(spark, webtext, gaz, golden_root)
    golden = _read_triples(spark, golden_root)

    resumed_root = str(tmp_path / "resumed")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_incremental(spark, webtext, gaz, resumed_root, fail_after_partitions=1)
    # resume: must skip the completed partition and finish the rest
    summary = run_incremental(spark, webtext, gaz, resumed_root)
    assert summary["skipped_done"], "resume did not skip completed partitions"
    assert _read_triples(spark, resumed_root) == golden

    # idempotency: a third run processes nothing and changes nothing
    summary3 = run_incremental(spark, webtext, gaz, resumed_root)
    assert summary3["processed"] == []
    assert _read_triples(spark, resumed_root) == golden


def test_backfill_one_job_matches_loop(spark, tmp_path, inputs):
    """Round 5 (VERDICT r4 #3): the single-job backfill must be byte-
    identical, day by day, to the per-day loop — same triples under the
    same pday partitions, same lineage counts — while recording all
    pending days from one write job."""
    from esmarc_spark.pipeline.checkpoint import CheckpointStore

    webtext, gaz = inputs
    loop_root = str(tmp_path / "loop")
    batch_root = str(tmp_path / "batch")
    run_incremental(spark, webtext, gaz, loop_root, mode="loop")
    summary = run_incremental(spark, webtext, gaz, batch_root, mode="batch")
    assert len(summary["processed"]) == 3
    assert _read_triples(spark, batch_root) == _read_triples(spark, loop_root)

    def lineage_counts(root):
        return {
            r.pday: (r.n_docs, r.n_mentions, r.n_triples)
            for r in CheckpointStore(spark, root).lineage().collect()
        }

    assert lineage_counts(batch_root) == lineage_counts(loop_root)
    # one write job: every batch lineage row carries the same wall stamp
    walls = {r.wall_sec for r in CheckpointStore(spark, batch_root).lineage().collect()}
    assert len(walls) == 1

    # idempotent tail: nothing pending, nothing changes
    again = run_incremental(spark, webtext, gaz, batch_root)
    assert again["processed"] == []
    assert _read_triples(spark, batch_root) == _read_triples(spark, loop_root)


def test_lineage_metrics(spark, tmp_path, inputs):
    webtext, gaz = inputs
    root = str(tmp_path / "lineage")
    from esmarc_spark.pipeline.checkpoint import CheckpointStore

    run_incremental(spark, webtext, gaz, root)
    lineage = CheckpointStore(spark, root).lineage().collect()
    assert len(lineage) == 3  # one row per day partition
    for row in lineage:
        assert row.status == "done"
        assert row.n_docs > 0 and row.n_triples > 0 and row.n_mentions > 0
        assert row.n_mentions < row.n_triples
        assert row.watermark_ts is not None and row.wall_sec > 0


def test_run_incremental_uri_out_root(spark, tmp_path, inputs):
    """The orchestration layer accepts a file:// out_root end-to-end
    (triples write, lineage append, resume read — all URI paths), and
    produces the same triples as a posix root."""
    webtext, gaz = inputs
    posix_root = str(tmp_path / "posix")
    uri_root = f"file://{tmp_path}/uri"
    run_incremental(spark, webtext, gaz, posix_root)
    summary = run_incremental(spark, webtext, gaz, uri_root)
    assert len(summary["processed"]) == 3
    assert _read_triples(spark, uri_root) == _read_triples(spark, posix_root)
    # resume through the URI checkpoint store: nothing pending
    again = run_incremental(spark, webtext, gaz, uri_root)
    assert again["processed"] == []


def test_backfill_corrupt_readback_raises_not_done(spark, tmp_path, inputs):
    """ADVICE r5: a real failure reading back the written triples (e.g.
    corrupt footer) must propagate — NOT be recorded as status='done'
    with n_triples=0, which would corrupt lineage while marking the
    partitions complete. Only the nothing-written-yet empty-path shape
    maps to zero counts."""
    import pathlib

    webtext, gaz = inputs
    root = str(tmp_path / "corrupt")
    # first run writes triples; then corrupt every footer and force a
    # backfill of a "new" day so the read-back executes again
    run_incremental(spark, webtext, gaz, root, mode="batch")
    for f in pathlib.Path(root, "triples").rglob("*.parquet"):
        f.write_bytes(b"not a parquet file")
    from pyspark.sql import functions as F

    more = webtext.withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 10 DAYS")
    )
    with pytest.raises(Exception):
        run_incremental(spark, more, gaz, root, mode="batch")
    # the lineage store must NOT have recorded the new days as done
    from esmarc_spark.pipeline.checkpoint import CheckpointStore

    done = sorted(
        r.pday
        for r in CheckpointStore(spark, root).completed_partitions().collect()
    )
    assert len(done) == 3, done  # only the original run's days


def test_backfill_matches_loop_with_curation(spark, tmp_path):
    """Round 6/7: loop and single-job backfill must stay byte-identical
    with the curation gates ON — the batch path re-groups canonical
    dedup per (pday,), runs blocklist AND the host-authority gate
    pre-fold (ADVICE r6 #1: the gate on a folded url silently no-ops),
    and scopes line/span dedup frequencies per pday (ADVICE r6 #2: a
    line shared only ACROSS days must survive in batch mode exactly as
    it does in the per-day loop)."""
    from pyspark.sql import functions as F

    from esmarc_spark.pipeline.run import GOPHER_REPETITION_THRESHOLDS

    base = synth_webtext(spark, n_docs=150, partitions=4, dup_fraction=0).withColumn(
        "_i", F.regexp_extract("url", r"([0-9]+)$", 1).cast("int")
    )
    i = F.col("_i")
    rep = F.concat_ws("\n", *([F.col("text")] + [F.lit("repeat me please now")] * 20))
    # a line occurring in 3 docs TOTAL (i%50==7): its per-day count is
    # 1-2, so the loop keeps it — a naive whole-backfill count of 3
    # would strip it (min_docs=2); likewise a 15-token span in 3 docs
    cross_day_line = F.lit("\nshared across days boilerplate banner line")
    cross_day_span = F.lit(
        " alpha beta gamma delta epsilon zeta eta theta iota kappa"
        " lambda mu nu xi omicron"
    )
    wt = (
        base.withColumn(
            "url",
            F.when(
                i % 10 == 0,
                F.concat(F.lit("https://sub.spam.example/page/"), i.cast("string")),
            )
            .when(
                i % 10 == 5,
                F.concat(F.lit("https://lowrank.example/page/"), i.cast("string")),
            )
            .when(
                # canonical-dup variants: tracking param + explicit :443
                i % 9 == 1,
                F.concat(F.col("url"), F.lit("?utm_source=feed")),
            )
            .otherwise(F.col("url")),
        )
        .withColumn(
            "text",
            F.when((i % 7 == 3) & F.col("text").isNotNull(), rep).otherwise(
                F.col("text")
            ),
        )
        .withColumn(
            "text",
            F.when(
                (i % 5 == 1) & F.col("text").isNotNull(),
                F.concat(F.col("text"), F.lit(" mail bob@example.com")),
            ).otherwise(F.col("text")),
        )
        .withColumn(
            "text",
            F.when(
                (i % 50 == 7) & F.col("text").isNotNull(),
                F.concat(F.col("text"), cross_day_line),
            ).otherwise(F.col("text")),
        )
        .withColumn(
            "text",
            F.when(
                (i % 50 == 11) & F.col("text").isNotNull(),
                F.concat(F.col("text"), cross_day_span),
            ).otherwise(F.col("text")),
        )
        .withColumn(
            "warc_ts",
            F.timestamp_seconds(
                F.lit(1700000000) + F.pmod(F.xxhash64("url"), F.lit(3)) * 86400
            ),
        )
        # meta-robots noindex pages on a distinctive host (html rows only
        # — the directive lives in the html)
        .withColumn(
            "url",
            F.when(
                (i % 25 == 2) & F.col("html").isNotNull(),
                F.concat(
                    F.lit("https://noindexed.example/page/"), i.cast("string")
                ),
            ).otherwise(F.col("url")),
        )
        .withColumn(
            "html",
            F.when(
                (i % 25 == 2) & F.col("html").isNotNull(),
                F.concat(
                    F.encode(
                        F.lit('<meta name="robots" content="noindex">'),
                        "UTF-8",
                    ),
                    F.col("html"),
                ),
            ).otherwise(F.col("html")),
        )
        # robots-governed host: odd residues take a disallowed path,
        # even residues an allowed one (round 7: stage-1a gate)
        .withColumn(
            "url",
            F.when(
                i % 25 == 12,
                F.concat(
                    F.lit("https://robotic.example"),
                    F.when(i % 2 == 0, F.lit("/private/page/")).otherwise(
                        F.lit("/open/page/")
                    ),
                    i.cast("string"),
                ),
            ).otherwise(F.col("url")),
        )
    )
    # print-view duplicates: same day, 1s older, declaring the original
    # as rel=canonical (skip utm rows — their original's url is
    # rewritten by canonical-url dedup, so the declared key would miss)
    printed = (
        wt.where(
            (F.col("_i") % 30 == 4)
            & (F.col("_i") % 9 != 1)
            & F.col("html").isNotNull()
        )
        .withColumn(
            "html",
            F.concat(
                F.encode(
                    F.concat(
                        F.lit('<link rel="canonical" href="'),
                        F.col("url"),
                        F.lit('">'),
                    ),
                    "UTF-8",
                ),
                F.col("html"),
            ),
        )
        .withColumn("url", F.concat(F.col("url"), F.lit("/print")))
        .withColumn("warc_ts", F.col("warc_ts") - F.expr("INTERVAL 1 SECOND"))
    )
    wt = wt.unionByName(printed).drop("_i").cache()
    gaz = gazetteer_df(spark)
    blocked = spark.createDataFrame([("spam.example",)], "host string")
    ranks = spark.createDataFrame(
        [("lowrank.example", 10), ("example.org", 5000)],
        "host string, rank_scaled long",
    )
    robots = spark.createDataFrame(
        [("robotic.example", "User-agent: *\nDisallow: /private")],
        "host string, robots_txt string",
    )
    curation = dict(
        canonical_url_dedup=True,
        drop_noindex=True,
        rel_canonical_dedup=True,
        host_blocklist=blocked,
        robots=robots,
        host_ranks=ranks,
        min_rank_scaled=100,
        repetition_thresholds=GOPHER_REPETITION_THRESHOLDS,
        dedup_lines_min_docs=2,
        dedup_spans_k=13,
        pii_scrub=True,
    )

    loop_root = str(tmp_path / "loop")
    batch_root = str(tmp_path / "batch")
    run_incremental(spark, wt, gaz, loop_root, mode="loop", curation=curation)
    run_incremental(spark, wt, gaz, batch_root, mode="batch", curation=curation)
    loop_triples = _read_triples(spark, loop_root)
    assert _read_triples(spark, batch_root) == loop_triples
    assert loop_triples and not any(
        "spam.example" in subj for subj, _, _, _ in loop_triples
    )
    # the host-authority gate actually fired in BOTH modes
    assert not any("lowrank.example" in subj for subj, _, _, _ in loop_triples)
    # round 7: noindex pages dropped; print views collapsed onto their
    # declared canonical (the 1s-younger original wins max_by)
    assert not any("noindexed.example" in subj for subj, _, _, _ in loop_triples)
    assert not any("/print" in subj for subj, _, _, _ in loop_triples)
    # round 7: robots stage 1a fired in both modes — disallowed paths
    # gone, the allowed path on the same host untouched
    assert not any(
        "robotic.example/private" in subj for subj, _, _, _ in loop_triples
    )
    assert any(
        "robotic.example/open" in subj for subj, _, _, _ in loop_triples
    )


def _corpus_dedup_inputs(spark):
    """3 days of webtext where day 1 re-ingests copies of day 0's pages
    under '-copy' urls (recrawl/syndication) — the corpus-dedup hook
    must drop every copy while day 0's originals keep their triples."""
    from pyspark.sql import functions as F

    base = synth_webtext(spark, n_docs=90, partitions=3, dup_fraction=0).withColumn(
        "_i", F.regexp_extract("url", r"([0-9]+)$", 1).cast("int")
    )
    # text-carrying rows only, each with a 12-token unique tail: the
    # synthetic filler pool is small enough that ORGANIC cross-day
    # near-dups appear otherwise — the hook would (correctly) drop them
    # and break the loop==plain-originals equality this test pins
    tail = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(12)),
            lambda j: F.concat(F.lit("u"), F.col("_i"), F.lit("x"), j),
        ),
    )
    wt = (
        base.where(F.col("text").isNotNull())
        .withColumn("text", F.concat(F.col("text"), F.lit(" "), tail))
        .withColumn(
            "warc_ts",
            F.timestamp_seconds(
                F.lit(1700000000) + F.pmod(F.col("_i"), F.lit(3)) * 86400
            ),
        )
    )
    copies = (
        wt.where(F.col("_i") % 3 == 0)
        .withColumn("url", F.concat(F.col("url"), F.lit("-copy")))
        .withColumn("warc_ts", F.timestamp_seconds(F.lit(1700000000 + 86400)))
    )
    return wt.unionByName(copies).drop("_i").cache()


def test_run_incremental_corpus_dedup(spark, tmp_path):
    """Round 6 (VERDICT r5 #2 hook): run_incremental(corpus_dedup=...)
    dedups each new day against the persisted signature state; loop and
    batch stay identical; a crash+resume changes nothing."""
    wt = _corpus_dedup_inputs(spark)
    gaz = gazetteer_df(spark)

    def run(root, state, **kw):
        run_incremental(
            spark, wt, gaz, root,
            corpus_dedup={"state_root": state}, **kw,
        )
        return _read_triples(spark, root)

    loop = run(str(tmp_path / "loop"), str(tmp_path / "s_loop"), mode="loop")
    batch = run(str(tmp_path / "batch"), str(tmp_path / "s_batch"), mode="batch")
    assert loop == batch

    # every '-copy' page is a near-dup of an already-ingested original:
    # no copy may emit triples (without the hook they all do)
    assert loop and not any("-copy" in s for s, _, _, _ in loop)
    plain_root = str(tmp_path / "plain")
    run_incremental(spark, wt, gaz, plain_root, mode="loop")
    assert any("-copy" in s for s, _, _, _ in _read_triples(spark, plain_root))
    # ingesting duplicates with the hook ≡ never ingesting them: the
    # deduped run equals a run over an input that never had the copies
    # (subj triples AND the per-day entity triples they alone supported)
    from pyspark.sql import functions as F

    nocopy_root = str(tmp_path / "nocopy")
    run_incremental(
        spark, wt.where(~F.col("url").contains("-copy")), gaz, nocopy_root,
        mode="loop",
    )
    assert loop == _read_triples(spark, nocopy_root)

    # crash after day 0, resume: committed dump replays read-only,
    # result identical to the uninterrupted run
    crash_root = str(tmp_path / "crash")
    crash_state = str(tmp_path / "s_crash")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_incremental(
            spark, wt, gaz, crash_root, fail_after_partitions=1,
            corpus_dedup={"state_root": crash_state},
        )
    resumed = run(crash_root, crash_state)
    assert resumed == loop
