"""BPE training: distributed pair stats + merge learning vs an
independent sequential reference implementation."""

import duckdb


def _py_word_counts(texts):
    wc = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                wc[w] = wc.get(w, 0) + 1
    return wc


def _py_train(word_counts, k, min_count=1):
    """Sequential textbook BPE (Sennrich et al. 2016): symbol tuples,
    full rescan per round — deliberately nothing like the Spark path."""
    words = {tuple(w): n for w, n in word_counts.items()}
    merges = []
    for _ in range(k):
        pairs = {}
        for syms, n in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = pairs.get((syms[i], syms[i + 1]), 0) + n
        if not pairs:
            break
        # deterministic tie-break: count desc, pair string asc
        best_n = max(pairs.values())
        cands = sorted(" ".join(p) for p, n in pairs.items() if n == best_n)
        a, b = cands[0].split(" ")
        if best_n < min_count:
            break
        merges.append((a, b, best_n))
        out = {}
        for syms, n in words.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            out[tuple(merged)] = out.get(tuple(merged), 0) + n
        words = out
    return merges


def _docs(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


TEXTS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest wide",
    "low newer low wide wide",
    "es es esse essen",
]


def test_pair_counts_matches_reference(spark):
    from esmarc_spark.ops.bpe_train import pair_counts, word_counts

    got = {
        r["pair"]: r["n_pair"]
        for r in pair_counts(word_counts(_docs(spark, TEXTS))).collect()
    }
    wc = _py_word_counts(TEXTS)
    want = {}
    for w, n in wc.items():
        for i in range(len(w) - 1):
            p = f"{w[i]} {w[i + 1]}"
            want[p] = want.get(p, 0) + n
    assert got == want


def test_pair_counts_single_char_words_and_partitions(spark):
    from esmarc_spark.ops.bpe_train import pair_counts, word_counts

    docs = _docs(spark, ["a a b  ab", "x"])  # double space -> empty token drops
    got = {
        r["pair"]: r["n_pair"]
        for r in pair_counts(word_counts(docs.repartition(9))).collect()
    }
    assert got == {"a b": 1}  # only "ab" yields a pair; 1-char words yield none


def test_train_merges_matches_sequential_reference(spark):
    from esmarc_spark.ops.bpe_train import train_merges, word_counts

    wc = _py_word_counts(TEXTS)
    want = _py_train(wc, 8)
    got = train_merges(word_counts(_docs(spark, TEXTS)), 8)
    assert got == want
    # merged symbols are real multi-char units by round 8
    assert any(len(a + b) > 2 for a, b, _ in got)


def test_train_merges_overlapping_runs(spark):
    # "aaaa" under merge (a,a): left-to-right non-overlapping -> "aa aa",
    # the classic divergence trap between replace semantics and BPE
    from esmarc_spark.ops.bpe_train import train_merges, word_counts

    docs = _docs(spark, ["aaaa aaa aaaa"])
    want = _py_train(_py_word_counts(["aaaa aaa aaaa"]), 3)
    got = train_merges(word_counts(docs), 3)
    assert got == want


def test_train_merges_min_count_stops(spark):
    from esmarc_spark.ops.bpe_train import train_merges, word_counts

    docs = _docs(spark, ["ab cd"])
    got = train_merges(word_counts(docs), 10, min_count=2)
    assert got == []  # every pair has count 1


def test_pair_counts_sql_parity(spark):
    from esmarc_spark.ops.bpe_train import pair_counts, pair_counts_sql, word_counts

    docs = _docs(spark, TEXTS)
    got = [tuple(r) for r in pair_counts(word_counts(docs), top=10).collect()]
    con = duckdb.connect()
    con.register("d", docs.toPandas())
    want = [tuple(r) for r in con.sql(pair_counts_sql("SELECT text FROM d", 10)).fetchall()]
    assert got == want
