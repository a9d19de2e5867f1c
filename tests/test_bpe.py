"""Real merge-based BPE (ops/bpe.py): encoder semantics, the two
vendored artifacts' regeneration byte-identity (merge table + golden
counts — the crawl_pipeline vendored-golden pattern), and token-exact
chunking."""

import json
import subprocess
import sys
from pathlib import Path

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from esmarc_spark.ops.bpe import (
    MERGES_PATH,
    bpe_exact_count,
    bpe_tokens_col,
    chunk_documents_bpe,
    encode_piece,
    merge_ranks,
    pretokenize,
    token_counts_bpe,
)

REPO = Path(__file__).resolve().parent.parent
GOLDEN = REPO / "tests" / "golden" / "bpe_counts.ldj"


def _reference_count(piece: str) -> int:
    """The independent replay-in-rank-order formulation from
    scripts/regen_golden_bpe.py."""
    sys.path.insert(0, str(REPO / "scripts"))
    from regen_golden_bpe import encode_count

    merges = json.loads(MERGES_PATH.read_text())["merges"]
    return encode_count(piece, merges)


def test_pretokenize_partitions_every_char():
    for t in ["hello, world!  it's 42°C", "a_b__c", "täst 日本語 x", ""]:
        assert "".join(pretokenize(t)) == t


def test_encode_piece_merges_trained_words():
    ranks = merge_ranks()
    # ' s' is the first trained merge (the corpus is space-joined words)
    assert encode_piece(" s", ranks) == [256]
    # untrainable bytes stay at byte granularity
    assert encode_piece("\x00\x01", ranks) == [0, 1]


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=40))
def test_engine_equals_reference_formulation(t):
    ranks = merge_ranks()
    for piece in pretokenize(t):
        assert len(encode_piece(piece, ranks)) == _reference_count(piece)


def test_merge_table_regenerates_byte_identical(tmp_path):
    out = tmp_path / "merges.json"
    subprocess.run(
        [sys.executable, str(REPO / "scripts" / "gen_bpe_vocab.py"), "512", str(out)],
        check=True,
        cwd=REPO,
    )
    assert out.read_bytes() == MERGES_PATH.read_bytes()


def test_golden_counts_regenerate_byte_identical(tmp_path):
    out = tmp_path / "bpe_counts.ldj"
    subprocess.run(
        [sys.executable, str(REPO / "scripts" / "regen_golden_bpe.py"), str(out)],
        check=True,
        cwd=REPO,
    )
    assert out.read_bytes() == GOLDEN.read_bytes()


def test_exact_count_and_null(spark):
    df = spark.createDataFrame(
        [(1, "the fast key order"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["n_tokens"] for r in token_counts_bpe(df).collect()}
    assert rows[2] is None
    assert rows[3] == 0
    ranks = merge_ranks()
    expected = sum(len(encode_piece(p, ranks)) for p in pretokenize("the fast key order"))
    assert rows[1] == expected


def test_tokens_roundtrip_bytes(spark):
    texts = ["the fast key order sort", "täst 日本語, x!  y"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    out = df.select("doc_id", bpe_tokens_col().alias("toks")).collect()
    for r in out:
        joined = "".join(r["toks"]).encode("latin-1")
        assert joined == texts[r["doc_id"]].encode("utf-8")


def test_chunk_bpe_exact_windows(spark):
    text = "the fast key order sort table scan merge part window small hash"
    df = spark.createDataFrame([(7, text)], "doc_id long, text string")
    n_total = df.select(bpe_exact_count().alias("n")).first()["n"]
    chunks = chunk_documents_bpe(df, chunk_tokens=5, overlap=2).orderBy("chunk_id").collect()
    step = 3
    assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))
    assert len(chunks) == len(range(1, n_total + 1, step))
    assert all(c["n_tokens"] <= 5 for c in chunks)
    assert all(c["n_tokens"] == 5 for c in chunks[:-1])
    # ASCII corpus text: zero-overlap chunks concatenate back to the doc
    chunks0 = chunk_documents_bpe(df, chunk_tokens=5, overlap=0).orderBy("chunk_id").collect()
    assert "".join(c["chunk"] for c in chunks0) == text
    # each overlapped chunk is a verbatim substring
    assert all(c["chunk"] in text for c in chunks)


def test_chunk_bpe_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents_bpe(df, chunk_tokens=4, overlap=4)


def test_golden_chunks_regenerate_byte_identical(tmp_path):
    out = tmp_path / "bpe_chunks.ldj"
    subprocess.run(
        [
            sys.executable,
            str(REPO / "scripts" / "regen_golden_bpe_chunks.py"),
            str(out),
        ],
        check=True,
        cwd=REPO,
    )
    golden = REPO / "tests" / "golden" / "bpe_chunks.ldj"
    assert out.read_bytes() == golden.read_bytes()
