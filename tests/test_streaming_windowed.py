"""Watermarked windowed mention counts (stateful streaming) — the
streaming rendering of the salted mention aggregation."""

import pytest
from pyspark.sql import functions as F

from esmarc_spark.pipeline.streaming import windowed_mention_counts
from esmarc_spark.pipeline.webtext import gazetteer_df, synth_webtext


def test_windowed_mention_counts(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    gaz = gazetteer_df(spark)
    # two distinct hours of data
    wt = synth_webtext(spark, n_docs=100, partitions=2, dup_fraction=0).withColumn(
        "warc_ts",
        F.timestamp_seconds(F.lit(1700000000) + F.pmod(F.xxhash64("url"), F.lit(2)) * 3600),
    )
    wt.write.mode("overwrite").parquet(in_dir)

    counts = windowed_mention_counts(spark, in_dir, gaz, window="1 hour")
    query = (
        counts.writeStream.format("memory")
        .queryName("mention_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    rows = spark.sql("select * from mention_counts").collect()
    assert rows
    # two windows present, counts positive, Germany (Zipf head) dominant
    windows = {r.window_start for r in rows}
    assert len(windows) == 2
    by_entity = {}
    for r in rows:
        assert r.n_mentions > 0
        by_entity[r.canonical_url] = by_entity.get(r.canonical_url, 0) + r.n_mentions
    top = max(by_entity, key=by_entity.get)
    assert top.endswith("4011882-4")  # Germany's GND uri


def _big_gazetteer(spark, n_extra=5000):
    """Real gazetteer + n_extra synthetic surfaces — large enough that the
    inline strategy is forbidden (> max_inline_surfaces=4096)."""
    extra = spark.range(n_extra).selectExpr(
        "concat('synthsurf', id) as surface_form",
        "'topics' as entity_type",
        "'(DE-588)' as authority_prefix",
        "concat('X', id) as authority_id",
        "concat('https://d-nb.info/gnd/X', id) as canonical_url",
    )
    return gazetteer_df(spark).unionByName(extra)


def test_streaming_large_gazetteer_foreach_batch(spark, tmp_path):
    """VERDICT r3 #2: at >4096 surfaces the direct streaming path must
    REFUSE to inline the gazetteer, and the foreachBatch runner must
    produce output identical to the batch join path with no gazetteer
    literal in the plan."""
    from esmarc_spark.pipeline.streaming import (
        page_triples,
        read_page_triples,
        run_page_triples_foreach_batch,
        stream_page_triples,
    )

    in_dir = str(tmp_path / "in")
    # materialize the dim so the only way 'synthsurf' can appear in a
    # query plan is via inlined surface literals
    gaz_dir = str(tmp_path / "gaz")
    _big_gazetteer(spark).write.parquet(gaz_dir)
    gaz = spark.read.parquet(gaz_dir)
    synth_webtext(spark, n_docs=300, partitions=3, dup_fraction=0).write.parquet(in_dir)

    # direct streaming rendering refuses (would inline 5000+ literals)
    with pytest.raises(ValueError, match="foreach_batch"):
        stream_page_triples(spark, in_dir, gaz)

    # the batch composition the runner executes per micro-batch: join
    # strategy, and no synthetic surface literal anywhere in the plan
    batch = page_triples(spark.read.parquet(in_dir), gaz)
    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "synthsurf" not in plan

    run_page_triples_foreach_batch(
        spark,
        in_dir,
        gaz,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,  # force several micro-batches
    )
    got = sorted(map(tuple, read_page_triples(spark, str(tmp_path / "out")).collect()))
    want = sorted(map(tuple, batch.collect()))
    assert got == want and len(got) > 0


# ---------------------------------------------------------------------------
# round 2: custom stateful operator (applyInPandasWithState sessionization)
# ---------------------------------------------------------------------------


def _batch_sessions(spark, events_path):
    from esmarc_spark.ops.relational import events_sessionize

    df = spark.read.parquet(events_path)
    return {
        (r.user_id, r.session_seq): (r.n_events, r.session_start)
        for r in events_sessionize(df, gap_minutes=30).collect()
    }


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    """Single catch-up run over all files must reproduce the batch
    sessionizer exactly (same gap semantics)."""
    import datetime as dt

    from esmarc_spark.pipeline.streaming import run_sessionize_available_now

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for user in range(5):
        t = base + dt.timedelta(minutes=user)
        for s in range(3):  # 3 sessions per user
            for e in range(4):  # 4 events each, 5 min apart
                rows.append((user, eid, t))
                eid += 1
                t += dt.timedelta(minutes=5)
            t += dt.timedelta(minutes=45)  # gap > 30 -> new session
    in_dir = str(tmp_path / "events")
    spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp"
    ).repartition(1).write.parquet(in_dir)

    got = run_sessionize_available_now(
        spark, in_dir, str(tmp_path / "ckpt"), gap_minutes=30
    )
    want = {
        (u, s): (n, str(start))
        for (u, s), (n, start) in _batch_sessions(spark, in_dir).items()
    }
    got_cmp = {
        (u, s): (n, start.strftime("%Y-%m-%d %H:%M:%S"))
        for (u, s), (n, start) in got.items()
    }
    assert got_cmp == want
    assert len(got) == 15  # 5 users x 3 sessions


def test_stateful_sessionize_state_spans_batches(spark, tmp_path):
    """A session split across micro-batches must stay ONE session: state
    (last_ts, open session) carries over; the second batch re-emits the
    grown session row."""
    import datetime as dt

    from esmarc_spark.pipeline.streaming import run_sessionize_available_now

    base = dt.datetime(2024, 3, 1)
    in_dir = str(tmp_path / "events")
    # file A: two events at t0, t0+5min; file B: t0+10min (same session)
    # plus t0+2h (new session). Lexicographic file order = arrival order.
    a = [(1, 0, base), (1, 1, base + dt.timedelta(minutes=5))]
    b = [
        (1, 2, base + dt.timedelta(minutes=10)),
        (1, 3, base + dt.timedelta(hours=2)),
    ]
    schema = "user_id long, event_id long, ts timestamp"
    spark.createDataFrame(a, schema).repartition(1).write.parquet(in_dir)
    import glob as g
    import os

    part = g.glob(f"{in_dir}/part-*.parquet")[0]
    os.rename(part, f"{in_dir}/a-00.parquet")
    spark.createDataFrame(b, schema).repartition(1).write.mode("append").parquet(in_dir)
    part = [p for p in g.glob(f"{in_dir}/part-*.parquet")]
    os.rename(part[0], f"{in_dir}/b-00.parquet")

    got = run_sessionize_available_now(
        spark, in_dir, str(tmp_path / "ckpt"),
        gap_minutes=30, max_files_per_trigger=1,
    )
    assert got[(1, 1)][0] == 3  # one session of 3 events across batches
    assert got[(1, 2)][0] == 1
    assert len(got) == 2

    # exactly-once: re-running the same checkpoint emits nothing new
    again = run_sessionize_available_now(
        spark, in_dir, str(tmp_path / "ckpt"),
        gap_minutes=30, max_files_per_trigger=1,
    )
    assert again == {}


def test_sessionize_table_sink_exactly_once(spark, tmp_path):
    """Production table sink (VERDICT r2 #4): resume processes only new
    files; a batch replayed after a simulated crash-before-commit
    rewrites identical content instead of duplicating; compaction folds
    the log without changing the view."""
    import datetime as dt
    import glob as g
    import os

    from esmarc_spark.pipeline.streaming import (
        compact_session_table,
        read_session_table,
        run_sessionize_to_table,
    )

    base = dt.datetime(2024, 3, 1)
    in_dir = str(tmp_path / "events")
    table = str(tmp_path / "sessions")
    ckpt = str(tmp_path / "ckpt")
    schema = "user_id long, event_id long, ts timestamp"

    a = [(1, 0, base), (1, 1, base + dt.timedelta(minutes=5))]
    spark.createDataFrame(a, schema).repartition(1).write.parquet(in_dir)
    os.rename(g.glob(f"{in_dir}/part-*.parquet")[0], f"{in_dir}/a-00.parquet")

    run_sessionize_to_table(
        spark, in_dir, table, ckpt, gap_minutes=30, max_files_per_trigger=1
    )

    def view():
        return {
            (r.user_id, r.session_seq): r.n_events
            for r in read_session_table(spark, table).collect()
        }

    assert view() == {(1, 1): 2}

    b = [
        (1, 2, base + dt.timedelta(minutes=10)),  # same session as file a
        (1, 3, base + dt.timedelta(hours=2)),  # new session
    ]
    spark.createDataFrame(b, schema).repartition(1).write.mode("append").parquet(in_dir)
    os.rename(g.glob(f"{in_dir}/part-*.parquet")[0], f"{in_dir}/b-00.parquet")

    run_sessionize_to_table(
        spark, in_dir, table, ckpt, gap_minutes=30, max_files_per_trigger=1
    )
    want = {(1, 1): 3, (1, 2): 1}
    assert view() == want

    # crash-replay: drop the newest commit marker -> the engine re-runs
    # the last batch; its batch_id dir is overwritten, the view must not
    # change (idempotent upsert)
    commits = sorted(g.glob(f"{ckpt}/commits/[0-9]*"))
    os.remove(commits[-1])
    crc = os.path.join(
        os.path.dirname(commits[-1]), f".{os.path.basename(commits[-1])}.crc"
    )
    if os.path.exists(crc):  # checksum sidecar would block the re-write
        os.remove(crc)
    run_sessionize_to_table(
        spark, in_dir, table, ckpt, gap_minutes=30, max_files_per_trigger=1
    )
    assert view() == want

    compact_session_table(spark, table)
    # all folded batch partitions are gone; the data lives in the
    # published snapshot (commit-marker protocol)
    assert [p for p in os.listdir(table) if p.startswith("batch_id=")] == []
    assert os.path.exists(f"{table}.snapshots/_LATEST")
    assert view() == want

    # exactly-once: nothing new -> no new batch directories
    before = sorted(os.listdir(table))
    run_sessionize_to_table(
        spark, in_dir, table, ckpt, gap_minutes=30, max_files_per_trigger=1
    )
    assert sorted(os.listdir(table)) == before

    # post-compaction writes land as new batches ON TOP of the snapshot
    c = [(2, 4, base)]
    spark.createDataFrame(c, schema).repartition(1).write.mode("append").parquet(in_dir)
    os.rename(g.glob(f"{in_dir}/part-*.parquet")[0], f"{in_dir}/c-00.parquet")
    run_sessionize_to_table(
        spark, in_dir, table, ckpt, gap_minutes=30, max_files_per_trigger=1
    )
    want_c = dict(want)
    want_c[(2, 1)] = 1
    assert view() == want_c
    # second compaction folds snapshot + new batches into a fresh snapshot
    compact_session_table(spark, table)
    assert view() == want_c


@pytest.mark.parametrize("scheme", ["posix", "file"])
def test_compaction_crash_replay_consistent(spark, tmp_path, scheme):
    """VERDICT r3 #3 / ADVICE: a compactor killed between any two steps
    must leave readers with a consistent latest-wins view, and a re-run
    must finish the job.

    Parameterized over a posix path and a ``file://`` URI (VERDICT r4
    #2): the URI leg drives the whole publish protocol — marker, batch
    listing, GC — through the pyarrow FileSystem API (pipeline.fsio)
    with zero posix calls; assertions inspect the same storage through
    its local mount."""
    import datetime as dt
    import os

    from esmarc_spark.pipeline.streaming import (
        compact_session_table,
        read_session_table,
        run_sessionize_to_table,
    )

    base = dt.datetime(2024, 4, 1)
    in_dir = str(tmp_path / "events")
    table = str(tmp_path / "sessions")
    table_ref = f"file://{table}" if scheme == "file" else table
    schema = "user_id long, event_id long, ts timestamp"
    rows = [(u, u * 10 + k, base + dt.timedelta(minutes=5 * k)) for u in range(3) for k in range(3)]
    spark.createDataFrame(rows, schema).repartition(1).write.parquet(in_dir)
    run_sessionize_to_table(
        spark, in_dir, table_ref, str(tmp_path / "ckpt"), gap_minutes=30
    )

    def view():
        return {
            (r.user_id, r.session_seq): r.n_events
            for r in read_session_table(spark, table_ref).collect()
        }

    want = view()
    assert want  # 3 users x 1 session

    # crash AFTER the snapshot write, BEFORE the marker publish: readers
    # must still see the old (un-compacted) state — unchanged view
    with pytest.raises(RuntimeError, match="injected"):
        compact_session_table(spark, table_ref, _fail_after="snapshot")
    assert not os.path.exists(f"{table}.snapshots/_LATEST")
    assert view() == want

    # crash AFTER the marker publish, BEFORE cleanup: readers use the
    # snapshot; leftover folded batch dirs are ignored
    with pytest.raises(RuntimeError, match="injected"):
        compact_session_table(spark, table_ref, _fail_after="marker")
    assert os.path.exists(f"{table}.snapshots/_LATEST")
    assert [p for p in os.listdir(table) if p.startswith("batch_id=")]
    assert view() == want

    # resumed run completes garbage collection without changing the view
    compact_session_table(spark, table_ref)
    assert [p for p in os.listdir(table) if p.startswith("batch_id=")] == []
    assert view() == want


# ---------------------------------------------------------------------------
# round 6: curation knobs on the streaming runner (VERDICT r5 #7)
# ---------------------------------------------------------------------------


def _curation_webtext(spark, n_docs=5000):
    """synth_webtext with per-row injections that make every gate
    observable: blocked-subdomain urls (id%10==0), 20x-repeated lines
    (id%7==3), an email address (id%5==1), and meta-robots noindex html
    pages on a distinctive host (id%11==2, round 7)."""
    base = synth_webtext(spark, n_docs=n_docs, partitions=4, dup_fraction=0)
    i = F.regexp_extract("url", r"([0-9]+)$", 1).cast("int")
    rep = F.concat_ws("\n", *([F.col("text")] + [F.lit("repeat me please now")] * 20))
    return (
        base.withColumn(
            "url",
            F.when(
                i % 10 == 0,
                F.concat(F.lit("https://sub.spam.example/page/"), i.cast("string")),
            ).otherwise(F.col("url")),
        )
        .withColumn("text", F.when((i % 7 == 3) & F.col("text").isNotNull(), rep).otherwise(F.col("text")))
        .withColumn(
            "text",
            F.when(
                (i % 5 == 1) & F.col("text").isNotNull(),
                F.concat(F.col("text"), F.lit(" contact bob@example.com now")),
            ).otherwise(F.col("text")),
        )
        .withColumn(
            "url",
            F.when(
                (i % 11 == 2) & (i % 10 != 0) & F.col("html").isNotNull(),
                F.concat(F.lit("https://noindexed.example/page/"), i.cast("string")),
            ).otherwise(F.col("url")),
        )
        .withColumn(
            "html",
            F.when(
                (i % 11 == 2) & F.col("html").isNotNull(),
                F.concat(
                    F.encode(
                        F.lit('<meta name="robots" content="noindex">'), "UTF-8"
                    ),
                    F.col("html"),
                ),
            ).otherwise(F.col("html")),
        )
        # robots-governed host (round 7): odd ids take a disallowed
        # path, even ids an allowed one
        .withColumn(
            "url",
            F.when(
                (i % 13 == 4) & (i % 10 != 0) & (i % 11 != 2),
                F.concat(
                    F.lit("https://robotic.example"),
                    F.when(i % 2 == 0, F.lit("/private/p")).otherwise(
                        F.lit("/open/p")
                    ),
                    i.cast("string"),
                ),
            ).otherwise(F.col("url")),
        )
    )


def _robots_df(spark):
    return spark.createDataFrame(
        [("robotic.example", "User-agent: *\nDisallow: /private")],
        "host string, robots_txt string",
    )


def test_prepare_docs_gates_observable(spark):
    """Each curation gate must have a visible effect on the doc set."""
    from esmarc_spark.pipeline.run import GOPHER_REPETITION_THRESHOLDS, prepare_docs

    web = _curation_webtext(spark, n_docs=500)
    blocked = spark.createDataFrame([("spam.example",)], "host string")

    plain = prepare_docs(web)
    gated = prepare_docs(
        web,
        host_blocklist=blocked,
        robots=_robots_df(spark),
        drop_noindex=True,
        repetition_thresholds=GOPHER_REPETITION_THRESHOLDS,
        pii_scrub=True,
    )
    urls = [r.url for r in gated.select("url").collect()]
    assert urls and not any("spam.example" in u for u in urls)
    # round 7: robots stage 1a — disallowed path gone, allowed one kept
    assert not any("robotic.example/private" in u for u in urls)
    assert any("robotic.example/open" in u for u in urls)
    # round 7: the noindex directive gate fired; plain keeps those pages
    assert not any("noindexed.example" in u for u in urls)
    assert any(
        "noindexed.example" in r.url for r in plain.select("url").collect()
    )
    # subdomain match: every id%10 row is gone, others survive
    assert plain.count() > gated.count()
    # repetitive docs gated (those ids carried text with 20 dup lines)
    rep_urls = {
        r.url
        for r in plain.where(
            (F.regexp_extract("url", r"([0-9]+)$", 1).cast("int") % 7 == 3)
            & F.col("text").contains("repeat me please now")
        ).collect()
    }
    assert rep_urls and not (rep_urls & set(urls))
    # pii scrubbed in the surviving text
    scrubbed = gated.where(F.col("text").contains("<EMAIL>")).count()
    assert scrubbed > 0
    assert gated.where(F.col("text").contains("bob@example.com")).count() == 0


def test_streaming_curation_matches_batch(spark, tmp_path):
    """foreachBatch with curation flags must equal the batch page_triples
    composition with the same flags (which itself delegates to the same
    prepare_docs run_pipeline uses) — at 5k docs, several micro-batches."""
    from esmarc_spark.pipeline.run import GOPHER_REPETITION_THRESHOLDS, run_pipeline
    from esmarc_spark.pipeline.streaming import (
        page_triples,
        read_page_triples,
        run_page_triples_foreach_batch,
    )

    in_dir = str(tmp_path / "in")
    _curation_webtext(spark, n_docs=5000).write.parquet(in_dir)
    gaz = gazetteer_df(spark)
    blocked = spark.createDataFrame([("spam.example",)], "host string")
    curation = dict(
        canonical_url_dedup=True,
        drop_noindex=True,
        rel_canonical_dedup=True,
        host_blocklist=blocked,
        robots=_robots_df(spark),
        repetition_thresholds=GOPHER_REPETITION_THRESHOLDS,
        pii_scrub=True,
    )

    batch = page_triples(spark.read.parquet(in_dir), gaz, curation=curation)
    run_page_triples_foreach_batch(
        spark,
        in_dir,
        gaz,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        max_files_per_trigger=2,
        curation=curation,
    )
    got = sorted(map(tuple, read_page_triples(spark, str(tmp_path / "out")).collect()))
    want = sorted(map(tuple, batch.collect()))
    assert got == want and len(got) > 0
    assert not any("spam.example" in s for s, _, _ in got)
    assert not any("noindexed.example" in s for s, _, _ in got)

    # and the batch pipeline accepts the same flags end to end
    triples = run_pipeline(spark.read.parquet(in_dir), gaz, **curation)
    subj = [r.subj for r in triples.select("subj").distinct().collect()]
    assert subj and not any("spam.example" in s for s in subj)


def test_streaming_corpus_dedup_drop_box(spark, tmp_path):
    """Round 6: a parquet drop-box with corpus_dedup never re-emits a
    page whose content an earlier micro-batch (or earlier run) already
    ingested — each batch commits as a dump of ops.dedup_incremental
    with the persisted docs store as history."""
    from esmarc_spark.pipeline.streaming import (
        read_page_triples,
        run_page_triples_foreach_batch,
    )

    in_dir = str(tmp_path / "in")
    gaz = gazetteer_df(spark)
    base = (
        synth_webtext(spark, n_docs=60, partitions=2, dup_fraction=0)
        .where(F.col("text").isNotNull())
        .withColumn("_i", F.regexp_extract("url", r"([0-9]+)$", 1).cast("int"))
        .withColumn(
            "text",
            F.concat(
                F.col("text"),
                F.lit(" "),
                F.concat_ws(
                    " ",
                    F.transform(
                        F.sequence(F.lit(1), F.lit(12)),
                        lambda j: F.concat(F.lit("u"), F.col("_i"), F.lit("x"), j),
                    ),
                ),
            ),
        )
        .cache()
    )
    drop1 = base.where(F.col("_i") % 2 == 0).drop("_i")
    # second drop: copies of drop1's pages under new urls + genuinely new docs
    copies = drop1.withColumn("url", F.concat(F.col("url"), F.lit("-copy")))
    fresh = base.where(F.col("_i") % 2 == 1).drop("_i")
    drop2 = copies.unionByName(fresh)

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    cd = {"state_root": str(tmp_path / "state")}

    def run():
        run_page_triples_foreach_batch(
            spark, in_dir, gaz, out, ckpt, corpus_dedup=cd
        )
        return sorted(map(tuple, read_page_triples(spark, out).collect()))

    drop1.repartition(1).write.parquet(in_dir)
    got1 = run()
    assert got1 and not any("-copy" in s for s, _, _ in got1)

    drop2.repartition(1).write.mode("append").parquet(in_dir)
    got2 = run()
    subjects = {s for s, _, _ in got2}
    # copies of already-ingested content never emit; fresh docs do
    assert not any("-copy" in s for s in subjects)
    assert any(s in subjects for s in {r.url for r in fresh.select("url").collect()})
    assert set(got1) <= set(got2)

    # catch-up rerun with nothing new: byte-stable
    assert run() == got2


def test_prepare_docs_host_authority_gate(spark):
    """Round 6: the PageRank-fed authority gate — low-rank hosts drop,
    unranked hosts pass by default, strict mode allowlists."""
    from esmarc_spark.pipeline.run import prepare_docs

    web = _curation_webtext(spark, n_docs=300)
    i = F.regexp_extract("url", r"([0-9]+)$", 1).cast("int")
    web = web.withColumn(
        "url",
        F.when(i % 3 == 1, F.regexp_replace("url", r"^https://[^/]+", "https://low.example"))
        .when(i % 3 == 2, F.regexp_replace("url", r"^https://[^/]+", "https://high.example"))
        .otherwise(F.col("url")),  # i%3==0 host stays unranked
    )
    ranks = spark.createDataFrame(
        [("low.example", 40), ("high.example", 9000)],
        "host string, rank_scaled long",
    )
    kept = prepare_docs(web, host_ranks=ranks, min_rank_scaled=100)
    hosts = {u.split("/")[2] for u in (r.url for r in kept.select("url").collect())}
    assert "low.example" not in hosts and "high.example" in hosts
    assert any(h not in ("low.example", "high.example") for h in hosts)  # unranked pass

    strict = prepare_docs(
        web, host_ranks=ranks, min_rank_scaled=100, keep_unranked=False
    )
    shosts = {u.split("/")[2] for u in (r.url for r in strict.select("url").collect())}
    assert shosts == {"high.example"}


def test_run_pipeline_host_authority_end_to_end(spark):
    """run_pipeline forwards the authority gate: no triples from
    below-floor hosts, unranked subjects still emit."""
    from esmarc_spark.pipeline.run import run_pipeline

    web = synth_webtext(spark, n_docs=400, partitions=2, dup_fraction=0)
    i = F.regexp_extract("url", r"([0-9]+)$", 1).cast("int")
    web = web.withColumn(
        "url",
        F.when(i % 2 == 0, F.regexp_replace("url", r"^https://[^/]+", "https://low.example"))
        .otherwise(F.col("url")),
    )
    ranks = spark.createDataFrame(
        [("low.example", 5)], "host string, rank_scaled long"
    )
    triples = run_pipeline(
        web, gazetteer_df(spark), host_ranks=ranks, min_rank_scaled=100
    )
    subs = [r.subj for r in triples.select("subj").distinct().collect()]
    assert subs and not any("low.example" in s for s in subs)


def test_prepare_docs_line_dedup_gate(spark):
    """dedup_lines_min_docs strips corpus-frequent lines from extracted
    text; refused on the non-url-deduped (streaming per-batch) path."""
    import pytest as _pytest

    from esmarc_spark.pipeline.run import prepare_docs

    web = synth_webtext(spark, n_docs=200, partitions=2, dup_fraction=0)
    web = web.withColumn(
        "text", F.concat(F.lit("SHARED BANNER LINE\n"), F.col("text"))
    )
    plain = prepare_docs(web)
    gated = prepare_docs(web, dedup_lines_min_docs=2)
    assert plain.where(F.col("text").contains("SHARED BANNER LINE")).count() > 0
    assert gated.where(F.col("text").contains("SHARED BANNER LINE")).count() == 0
    assert gated.count() == plain.count()  # rows kept, lines stripped
    with _pytest.raises(ValueError):
        prepare_docs(web, dedup_lines_min_docs=2, url_dedup=False)


def test_batch_doc_id_bounds(spark):
    """ADVICE r6 #3: the drop-box doc-id split must fail with an
    actionable error at 2^batch_bits batches instead of an ANSI
    long-overflow abort mid-stream; ids stay positive int64 and
    batch-ordered right up to the bound."""
    import pytest as _pytest

    from esmarc_spark.pipeline.streaming import _batch_doc_id

    web = synth_webtext(spark, n_docs=5, partitions=1, dup_fraction=0)
    last_ok = (1 << 20) - 1
    hi = web.select(_batch_doc_id(last_ok).alias("doc_id")).agg(
        F.min("doc_id"), F.max("doc_id")
    ).collect()[0]
    assert 0 < hi[0] and hi[1] < (1 << 62)
    lo = web.select(_batch_doc_id(0).alias("doc_id")).agg(
        F.max("doc_id")
    ).collect()[0][0]
    assert lo < hi[0]  # batch-ordered: batch 0 ids below batch 2^20-1 ids
    with _pytest.raises(ValueError, match="batch_bits"):
        _batch_doc_id(1 << 20)
    # the knob unlocks longer streams (on a fresh state root)
    wide = web.select(
        _batch_doc_id(1 << 20, batch_bits=24).alias("doc_id")
    ).agg(F.max("doc_id")).collect()[0][0]
    assert 0 < wide < (1 << 62)
