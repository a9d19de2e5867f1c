"""Hashed bigram LM perplexity (ops/lm.py): vendored counts
regeneration byte-identity, a pure-Python reference-scorer exactness
check, in/out-of-domain separation, and edge semantics."""

import json
import math
import subprocess
import sys
from pathlib import Path

from esmarc_spark.ops.lm import lm_perplexity, load_model

REPO = Path(__file__).resolve().parent.parent
MODEL = REPO / "esmarc_spark" / "lookups" / "lm_bigram.json"

sys.path.insert(0, str(REPO / "scripts"))


def test_model_regenerates_byte_identical(tmp_path):
    out = tmp_path / "lm_bigram.json"
    subprocess.run(
        [sys.executable, str(REPO / "scripts" / "gen_lm_model.py"), str(out)],
        check=True,
        cwd=REPO,
    )
    assert out.read_bytes() == MODEL.read_bytes()


def _py_score(text: str, model: dict) -> tuple[float, float] | tuple[None, None]:
    """Independent reference scorer — same formula, plain Python."""
    from gen_lm_model import bucket

    if text is None:
        return None, None
    toks = [t for t in text.lower().split(" ") if t]
    if not toks:
        return None, None
    cu, cb = model["cu"], model["cb"]
    u_w, b_w = model["u_width"], model["b_width"]
    s_u, s_b = model["salt_u"], model["salt_b"]
    lam = model["lambda"]
    denom = model["total"] + 0.5 * u_w

    def p_uni(w: str) -> float:
        return (cu[bucket(w, s_u, u_w)] + 0.5) / denom

    lp = round(math.log10(round(p_uni(toks[0]), 12)), 7)
    for a, b in zip(toks, toks[1:]):
        ctx = cu[bucket(a, s_u, u_w)]
        p_ml = min(cb[bucket(a + " " + b, s_b, b_w)] / ctx, 1.0) if ctx > 0 else 0.0
        q = round(lam * p_ml + (1.0 - lam) * p_uni(b), 12)
        lp += round(math.log10(q), 7)
    lp = round(lp, 6)
    return lp, round(10.0 ** (-lp / len(toks)), 3)


def test_matches_python_reference_exactly(spark):
    model = load_model()
    texts = [
        "the fast key order sort table scan merge part window",
        "table scan table scan table scan",
        "zzqx vvkp wrrt mmnb zzqx",  # fully out-of-vocab
        "the",  # single token: unigram-only path
        "   ",  # whitespace-only -> null
        None,
        "Join A Filter WINDOW row",  # case folding
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["lm_logprob10"], r["lm_perplexity"])
        for r in lm_perplexity(df).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _py_score(t, model), f"doc {i}: {t!r}"


def test_in_domain_scores_lower_than_gibberish(spark):
    import duckdb

    rows = duckdb.sql(
        "SELECT doc_id, text FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet') "
        "WHERE text IS NOT NULL ORDER BY doc_id LIMIT 50"
    ).fetchall()
    gib = [
        (10_000 + i, " ".join("qzx" + str(j * 7 + i) for j in range(40)))
        for i in range(20)
    ]
    df = spark.createDataFrame(list(rows) + gib, "doc_id long, text string")
    scored = lm_perplexity(df).collect()
    in_dom = [r["lm_perplexity"] for r in scored if r["doc_id"] < 10_000]
    out_dom = [r["lm_perplexity"] for r in scored if r["doc_id"] >= 10_000]
    # hard separation, not just means: every in-domain doc beats every
    # gibberish doc by a wide margin
    assert max(in_dom) < min(out_dom) / 10


def test_model_artifact_shape():
    model = json.loads(MODEL.read_text())
    assert len(model["cu"]) == model["u_width"]
    assert len(model["cb"]) == model["b_width"]
    assert sum(model["cu"]) == model["total"]
    assert 0.0 < model["lambda"] < 1.0
