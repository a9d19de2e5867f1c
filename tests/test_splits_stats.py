"""Round-7 additions: deterministic splits, per-host token caps,
cross-dump revisit classification, exact distributed quantiles."""

import duckdb
import pytest


def _docs(spark, n=200, parts=7):
    from pyspark.sql import functions as F

    return (
        spark.range(n)
        .repartition(parts)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("src"), F.pmod("id", F.lit(5)).cast("string")).alias(
                "source"
            ),
            F.concat(
                F.lit("the quick value "),
                F.lit("tok "),
                F.pmod("id", F.lit(13)).cast("string"),
                F.lit(" and some more words here to pass the gates x"),
                F.pmod("id", F.lit(7)).cast("string"),
            ).alias("text"),
        )
    )


# ---------------------------------------------------------------------------
# assign_split
# ---------------------------------------------------------------------------


def test_assign_split_partition_invariant_and_total(spark):
    from esmarc_spark.ops.sampling import assign_split

    df = _docs(spark, 500)
    a = {
        r["doc_id"]: r["split"]
        for r in assign_split(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()
    }
    b = {
        r["doc_id"]: r["split"]
        for r in assign_split(
            df.repartition(31), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
        ).collect()
    }
    assert a == b
    assert len(a) == 500  # every row labeled, none dropped
    counts = {}
    for s in a.values():
        counts[s] = counts.get(s, 0) + 1
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > 300  # ~400 expected; loose band
    assert counts["val"] + counts["test"] < 200


def test_assign_split_append_stability(spark):
    # rows keep their split when the corpus grows — the anti-leak property
    from esmarc_spark.ops.sampling import assign_split

    ratios = {"train": 0.9, "val": 0.05, "test": 0.05}
    small = {
        r["doc_id"]: r["split"]
        for r in assign_split(_docs(spark, 100), "doc_id", ratios).collect()
    }
    big = {
        r["doc_id"]: r["split"]
        for r in assign_split(_docs(spark, 300), "doc_id", ratios).collect()
    }
    assert all(big[k] == v for k, v in small.items())


def test_assign_split_validates_ratios(spark):
    from esmarc_spark.ops.sampling import assign_split

    df = _docs(spark, 10)
    with pytest.raises(ValueError):
        assign_split(df, "doc_id", {"train": 0.5, "val": 0.4})
    with pytest.raises(ValueError):
        assign_split(df, "doc_id", {"train": 1.0})
    with pytest.raises(ValueError):
        assign_split(df, "doc_id", {"train": 1.1, "val": -0.1})


def test_assign_split_duckdb_parity(spark):
    from esmarc_spark.ops.sampling import assign_split, assign_split_sql

    ratios = {"train": 0.7, "val": 0.2, "test": 0.1}
    df = _docs(spark, 150)
    got = sorted(
        (r["doc_id"], r["split"])
        for r in assign_split(df, "doc_id", ratios, salt="s9").collect()
    )
    pdf = df.select("doc_id").toPandas()
    con = duckdb.connect()
    con.register("d", pdf)
    want = sorted(
        con.sql(
            assign_split_sql("SELECT doc_id FROM d", "doc_id", ratios, salt="s9")
        ).fetchall()
    )
    assert got == want


# ---------------------------------------------------------------------------
# cap_host_tokens
# ---------------------------------------------------------------------------


def test_cap_host_tokens_budget_and_order(spark):
    from esmarc_spark.ops.packing import cap_host_tokens
    from esmarc_spark.ops.text import quality_score, token_count

    docs = _docs(spark, 200)
    budget = 120
    kept = cap_host_tokens(docs, budget=budget).collect()
    all_rows = docs.select(
        "source",
        "doc_id",
        (quality_score("text") * 1e6).cast("long").alias("q6"),
        token_count("text").alias("n_tokens"),
    ).collect()
    by_host = {}
    for r in all_rows:
        by_host.setdefault(r["source"], []).append(r)
    kept_by_host = {}
    for r in kept:
        kept_by_host.setdefault(r["host"], []).append(r)
    for host, rows in by_host.items():
        rows.sort(key=lambda r: (-r["q6"], r["doc_id"]))
        # sequential reference: keep while tokens_before < budget
        want, acc = [], 0
        for r in rows:
            if acc < budget:
                want.append(r["doc_id"])
            acc += r["n_tokens"]
        got = sorted(k["doc_id"] for k in kept_by_host.get(host, []))
        assert got == sorted(want), host
        # the cap overruns by at most one document
        got_tokens = sum(k["n_tokens"] for k in kept_by_host.get(host, []))
        max_doc = max(r["n_tokens"] for r in rows)
        assert got_tokens < budget + max_doc


def test_cap_host_tokens_partition_invariant(spark):
    from esmarc_spark.ops.packing import cap_host_tokens

    docs = _docs(spark, 200)
    a = sorted(map(tuple, cap_host_tokens(docs, 150).collect()))
    b = sorted(map(tuple, cap_host_tokens(docs.repartition(17), 150).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# classify_revisits
# ---------------------------------------------------------------------------


def test_classify_revisits_statuses(spark):
    from esmarc_spark.ops.revisits import classify_revisits, refresh_set

    rows = [
        ("u1", "d1", "alpha"),
        ("u1", "d2", "alpha"),       # unchanged
        ("u1", "d3", "alpha v2"),    # changed, latest
        ("u2", "d1", "beta"),        # new, latest (never refetched)
        ("u3", "d2", "gamma"),       # new
        ("u3", "d3", "gamma"),       # unchanged, latest
    ]
    snaps = spark.createDataFrame(rows, "url string, pday string, text string")
    got = {
        (r["url"], r["pday"]): (r["status"], r["is_latest"])
        for r in classify_revisits(snaps).collect()
    }
    assert got == {
        ("u1", "d1"): ("new", False),
        ("u1", "d2"): ("unchanged", False),
        ("u1", "d3"): ("changed", True),
        ("u2", "d1"): ("new", True),
        ("u3", "d2"): ("new", False),
        ("u3", "d3"): ("unchanged", True),
    }
    work = {(r["url"], r["pday"]) for r in refresh_set(snaps).collect()}
    # unchanged-latest urls cost zero downstream work
    assert work == {("u1", "d3"), ("u2", "d1")}


def test_classify_revisits_duckdb_parity(spark):
    from esmarc_spark.ops.revisits import classify_revisits, classify_revisits_sql

    from pyspark.sql import functions as F

    base = _docs(spark, 80)
    snaps = base.selectExpr(
        "'u' || CAST(doc_id % 23 AS string) AS url",
        "'d' || CAST(doc_id % 3 AS string) AS pday",
        "text",
    ).dropDuplicates(["url", "pday"])
    got = sorted(map(tuple, classify_revisits(snaps).collect()))
    con = duckdb.connect()
    con.register("s", snaps.toPandas())
    want = sorted(
        tuple(r) for r in con.sql(
            classify_revisits_sql("SELECT * FROM s")
        ).fetchall()
    )
    assert got == want


# ---------------------------------------------------------------------------
# exact_quantiles
# ---------------------------------------------------------------------------


def _disc_quantile(sorted_vals, q_permyriad):
    import math

    n = len(sorted_vals)
    rank = math.ceil(n * q_permyriad / 10000)
    return sorted_vals[max(rank, 1) - 1]


def test_exact_quantiles_matches_definition(spark):
    from pyspark.sql import functions as F

    from esmarc_spark.ops.stats import exact_quantiles

    df = (
        spark.range(1000)
        .repartition(13)
        .select(
            F.concat(F.lit("g"), F.pmod("id", F.lit(3)).cast("string")).alias("g"),
            # deterministic pseudo-random value with ties
            F.pmod(F.col("id") * 7919, F.lit(97)).alias("v"),
        )
    )
    got = {
        (r["g"], r["q_permyriad"]): r["value"]
        for r in exact_quantiles(df, "v", "g").collect()
    }
    rows = df.collect()
    groups = {}
    for r in rows:
        groups.setdefault(r["g"], []).append(r["v"])
    for g, vals in groups.items():
        vals.sort()
        for q in (2500, 5000, 7500, 9000, 9900):
            assert got[(g, q)] == _disc_quantile(vals, q), (g, q)


def test_exact_quantiles_partition_invariant_and_nulls(spark):
    from pyspark.sql import functions as F

    from esmarc_spark.ops.stats import exact_quantiles

    df = spark.range(500).select(
        F.lit("all").alias("g"),
        F.when(F.pmod("id", F.lit(10)) == 0, None)
        .otherwise(F.pmod(F.col("id") * 31, F.lit(1000)))
        .alias("v"),
    )
    a = sorted(map(tuple, exact_quantiles(df, "v", "g").collect()))
    b = sorted(map(tuple, exact_quantiles(df.repartition(29), "v", "g").collect()))
    assert a == b
    vals = sorted(r["v"] for r in df.collect() if r["v"] is not None)
    got = dict(((r[0], r[1]), r[2]) for r in a)
    assert got[("all", 5000)] == _disc_quantile(vals, 5000)
    assert got[("all", 9900)] == _disc_quantile(vals, 9900)


# ---------------------------------------------------------------------------
# assign_split_leakage_safe
# ---------------------------------------------------------------------------


def _clustered_docs(spark, n_clusters=40, members=4, singletons=30):
    # clusters of exact-duplicate texts (token vocab disjoint across
    # clusters, so no cross-cluster near-dup edge can exist) plus
    # unique-text singletons
    rows = []
    for cid in range(n_clusters):
        text = " ".join(f"c{cid}w{j}" for j in range(12))
        for m in range(members):
            rows.append((cid * 10 + m, text))
    for i in range(singletons):
        rows.append((1000 + i, " ".join(f"s{i}u{j}" for j in range(12))))
    return spark.createDataFrame(rows, "doc_id bigint, text string").repartition(9)


def test_leakage_safe_split_clusters_share_split(spark):
    from esmarc_spark.ops.sampling import assign_split_leakage_safe

    ratios = {"train": 0.6, "val": 0.2, "test": 0.2}
    out = assign_split_leakage_safe(
        _clustered_docs(spark), ratios, salt="ls-v1"
    ).collect()
    by_cluster = {}
    for r in out:
        if r["doc_id"] < 1000:
            by_cluster.setdefault(r["doc_id"] // 10, []).append(r)
    assert len(by_cluster) == 40
    for cid, members in by_cluster.items():
        assert len(members) == 4
        # whole cluster shares one split, rooted at its min doc_id
        assert len({m["split"] for m in members}) == 1
        assert {m["root_id"] for m in members} == {cid * 10}


def test_leakage_safe_split_beats_plain_split(spark):
    # the property the operator exists for: the plain per-doc split
    # fractures at least one near-dup cluster across train/eval on this
    # fixture; the cluster-rooted split never fractures any
    from esmarc_spark.ops.sampling import assign_split, assign_split_leakage_safe

    docs = _clustered_docs(spark)
    ratios = {"train": 0.6, "val": 0.2, "test": 0.2}
    plain = assign_split(docs, "doc_id", ratios, salt="ls-v1").collect()
    frac = {}
    for r in plain:
        if r["doc_id"] < 1000:
            frac.setdefault(r["doc_id"] // 10, set()).add(r["split"])
    assert any(len(s) > 1 for s in frac.values())
    safe = assign_split_leakage_safe(docs, ratios, salt="ls-v1").collect()
    frac_safe = {}
    for r in safe:
        if r["doc_id"] < 1000:
            frac_safe.setdefault(r["doc_id"] // 10, set()).add(r["split"])
    assert all(len(s) == 1 for s in frac_safe.values())


def test_leakage_safe_split_singletons_match_plain(spark):
    # docs with no near-dup edge root at themselves, so their label is
    # exactly the plain assign_split label (same hash key, same salt)
    from esmarc_spark.ops.sampling import assign_split, assign_split_leakage_safe

    docs = _clustered_docs(spark)
    ratios = {"train": 0.9, "val": 0.05, "test": 0.05}
    plain = {
        r["doc_id"]: r["split"]
        for r in assign_split(docs, "doc_id", ratios, salt="s9").collect()
    }
    safe = {
        r["doc_id"]: (r["root_id"], r["split"])
        for r in assign_split_leakage_safe(docs, ratios, salt="s9").collect()
    }
    for doc_id, (root, split) in safe.items():
        if doc_id >= 1000:  # singleton
            assert root == doc_id
            assert split == plain[doc_id]


# ---------------------------------------------------------------------------
# exact_auc
# ---------------------------------------------------------------------------


def _brute_auc_permyriad(pairs):
    # (score, label) -> floor(1e4 * Mann-Whitney AUC), O(n^2) reference
    pos = [s for s, l in pairs if l]
    neg = [s for s, l in pairs if not l]
    num = 0
    for p in pos:
        for q in neg:
            num += 2 if p > q else (1 if p == q else 0)
    return (10000 * num) // (2 * len(pos) * len(neg))


def test_exact_auc_known_values(spark):
    from esmarc_spark.ops.stats import exact_auc

    rows = []
    # group a: perfect separation -> 10000
    rows += [("a", s, True) for s in (10, 11, 12)]
    rows += [("a", s, False) for s in (1, 2, 3)]
    # group b: one shared score -> 5000 (all-tie average rank)
    rows += [("b", 7, True)] * 4 + [("b", 7, False)] * 3
    # group c: mixed with ties, checked against the O(n^2) reference
    c_pairs = [(5, True), (3, True), (3, False), (2, False), (9, True),
               (1, False), (5, False), (5, True), (8, False)]
    rows += [("c", s, l) for s, l in c_pairs]
    # group d: single class -> dropped
    rows += [("d", s, True) for s in (1, 2)]
    # group e: null scores excluded entirely
    rows += [("e", 4, True), ("e", 1, False), ("e", None, True), ("e", None, False)]
    df = spark.createDataFrame(rows, "grp string, score int, label boolean").repartition(5)
    got = {
        r["grp"]: (r["n_pos"], r["n_neg"], r["auc_permyriad"])
        for r in exact_auc(df, "score", "label", "grp").collect()
    }
    assert got["a"] == (3, 3, 10000)
    assert got["b"] == (4, 3, 5000)
    assert got["c"] == (4, 5, _brute_auc_permyriad(c_pairs))
    assert "d" not in got
    assert got["e"] == (1, 1, 10000)
    # partitioning invariance (bit-identical at any parallelism)
    again = {
        r["grp"]: (r["n_pos"], r["n_neg"], r["auc_permyriad"])
        for r in exact_auc(df.repartition(37), "score", "label", "grp").collect()
    }
    assert again == got


def test_exact_auc_duckdb_parity(spark):
    import duckdb

    from esmarc_spark.ops.stats import exact_auc, exact_auc_sql

    rows = [
        (f"g{i % 3}", (i * 13) % 29, (i * 7) % 5 < 2)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "grp string, score int, label boolean")
    got = sorted(
        (r["grp"], r["n_pos"], r["n_neg"], r["auc_permyriad"])
        for r in exact_auc(df, "score", "label", "grp").collect()
    )
    vals = ", ".join(f"('{g}', {s}, {str(l).lower()})" for g, s, l in rows)
    want = sorted(
        tuple(r)
        for r in duckdb.sql(
            exact_auc_sql(
                f"SELECT * FROM (VALUES {vals}) AS t(grp, score, label)",
                "score",
                "label",
                "grp",
            )
        ).fetchall()
    )
    assert got == want and len(got) == 3
    for g, np_, nn, auc in got:
        sub = [(s, l) for gg, s, l in rows if gg == g]
        assert auc == _brute_auc_permyriad(sub)


# ---------------------------------------------------------------------------
# training-release data card (round 7 capstone)
# ---------------------------------------------------------------------------


def test_split_data_card_exact_values(spark):
    """Hand-computable card: counts, token/char sums, diversity, and the
    min-lang tie-break for the dominant language."""
    from esmarc_spark.ops.datacard import split_data_card

    rows = [
        # split, text, lang, source, n_chars
        ("train", "a b c", "en", "web", 5),
        ("train", "d e", "de", "web", 3),
        ("train", "f", "de", "books", 1),
        ("train", "g h", "en", "web", 3),  # en==de: tie -> 'de'
        ("val", "x y z w", None, "web", 7),  # NULL lang -> ''
        ("val", None, "en", "code", 0),  # NULL text: token sum skips
    ]
    card = {
        r["split"]: r
        for r in split_data_card(
            spark.createDataFrame(
                rows, "split string, text string, lang string, source string, n_chars long"
            )
        ).collect()
    }
    t = card["train"]
    assert (t["n_docs"], t["n_tokens"], t["sum_chars"]) == (4, 8, 12)
    assert (t["n_langs"], t["n_sources"]) == (2, 2)
    assert t["top_lang"] == "de"  # 2 vs 2, bytewise-min wins
    assert t["top_lang_permyriad"] == 5000
    v = card["val"]
    assert (v["n_docs"], v["n_tokens"], v["sum_chars"]) == (2, 4, 7)
    assert v["n_langs"] == 2 and v["top_lang"] == ""  # '' < 'en'
    assert v["top_lang_permyriad"] == 5000


def test_training_release_gate_excludes_badwords(spark):
    """The C4 gate runs AFTER the split, so a gated doc vanishes from
    the card but never perturbs any other doc's split assignment."""
    from pyspark.sql import functions as F

    from esmarc_spark.ops.datacard import training_release

    docs = _docs(spark, 80).withColumn("lang", F.lit("en")).withColumn(
        "n_chars", F.length("text")
    )
    dirty = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 4 == 0, F.concat(F.col("text"), F.lit(" casino")))
        .otherwise(F.col("text")),
    )
    ratios = {"train": 0.8, "val": 0.1, "test": 0.1}
    clean_card = {r["split"]: r for r in training_release(docs, ratios).collect()}
    dirty_card = {r["split"]: r for r in training_release(dirty, ratios).collect()}
    assert sum(r["n_docs"] for r in clean_card.values()) == 80
    assert sum(r["n_docs"] for r in dirty_card.values()) == 60
    # gated docs only ever shrink a split, never move survivors
    for s, r in dirty_card.items():
        assert r["n_docs"] <= clean_card[s]["n_docs"]


def test_training_release_duckdb_parity(spark):
    """Full-chain parity on a corpus with near-dup clusters, a badword
    doc, and mixed langs/sources — the driver-query contract in
    miniature."""
    from pyspark.sql import functions as F

    from esmarc_spark.ops.datacard import training_release, training_release_sql

    docs = (
        _docs(spark, 120)
        .withColumn(
            "text",
            F.when(F.col("doc_id") % 10 == 0, F.lit("shared near dup body text"))
            .when(F.col("doc_id") % 17 == 0, F.concat(F.col("text"), F.lit(" xxx")))
            .otherwise(F.col("text")),
        )
        .withColumn(
            "lang",
            F.when(F.col("doc_id") % 3 == 0, F.lit("de")).otherwise(F.lit("en")),
        )
        .withColumn("n_chars", F.length("text"))
    )
    ratios = {"train": 0.7, "val": 0.15, "test": 0.15}
    got = sorted(
        tuple(r) for r in training_release(docs, ratios, salt="s1").collect()
    )
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    want = sorted(
        tuple(r)
        for r in con.execute(training_release_sql(ratios, salt="s1")).fetchall()
    )
    # the template texts near-dup-cluster heavily (by design: the split
    # must follow clusters), so a split can legitimately end up empty —
    # parity and volume conservation are the contract, not 3 rows
    assert got == want and len(got) >= 2


# ---------------------------------------------------------------------------
# exact precision/recall curve (round 7)
# ---------------------------------------------------------------------------


def test_pr_curve_known_values(spark):
    """Hand-computable curve: scores 3,2,2,1 with labels 1,1,0,0."""
    from esmarc_spark.ops.stats import pr_curve

    rows = [("g", 3, True), ("g", 2, True), ("g", 2, False), ("g", 1, False)]
    df = spark.createDataFrame(rows, "grp string, s long, y boolean")
    got = {
        r["threshold"]: (
            r["tp"], r["fp"], r["fn"],
            r["precision_permyriad"], r["recall_permyriad"],
        )
        for r in pr_curve(df, "s", "y", "grp").collect()
    }
    assert got == {
        3: (1, 0, 1, 10000, 5000),
        2: (2, 1, 0, 6666, 10000),
        1: (2, 2, 0, 5000, 10000),
    }
    # a group with no positives is dropped
    neg = spark.createDataFrame(
        [("n", 1, False)], "grp string, s long, y boolean"
    )
    assert pr_curve(neg, "s", "y", "grp").count() == 0


def test_pr_curve_duckdb_parity_and_partitions(spark):
    from pyspark.sql import functions as F

    from esmarc_spark.ops.stats import pr_curve, pr_curve_sql

    df = spark.range(400).select(
        F.concat(F.lit("g"), F.pmod("id", F.lit(3)).cast("string")).alias("grp"),
        F.pmod(F.xxhash64("id"), F.lit(37)).alias("s"),
        (F.pmod(F.xxhash64("id") + 7, F.lit(5)) < 2).alias("y"),
    )
    got = sorted(tuple(r) for r in pr_curve(df, "s", "y", "grp").collect())
    got11 = sorted(
        tuple(r) for r in pr_curve(df.repartition(11), "s", "y", "grp").collect()
    )
    assert got == got11 and got
    con = duckdb.connect()
    con.register("d", df.toPandas())
    want = sorted(
        tuple(r)
        for r in con.execute(
            pr_curve_sql("SELECT * FROM d", "s", "y", "grp")
        ).fetchall()
    )
    assert got == want
