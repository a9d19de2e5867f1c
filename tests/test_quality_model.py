"""Hashed n-gram quality classifier (ops/quality_model.py): vendored
weights regeneration byte-identity, held-out accuracy gate, and scoring
semantics."""

import subprocess
import sys
from pathlib import Path

from pyspark.sql import functions as F

from esmarc_spark.ops.quality_model import load_model, quality_model_score

REPO = Path(__file__).resolve().parent.parent
WEIGHTS = REPO / "esmarc_spark" / "lookups" / "quality_weights.json"

sys.path.insert(0, str(REPO / "scripts"))


def test_weights_regenerate_byte_identical(tmp_path):
    # ~35s: full deterministic retrain — the price of proving the
    # vendored artifact is a pure function of the repo
    out = tmp_path / "quality_weights.json"
    subprocess.run(
        [sys.executable, str(REPO / "scripts" / "gen_quality_weights.py"), str(out)],
        check=True,
        cwd=REPO,
    )
    assert out.read_bytes() == WEIGHTS.read_bytes()


def test_heldout_accuracy_gate(spark):
    from gen_quality_weights import corpus_vocab, make_labeled

    labeled = make_labeled(corpus_vocab(), n_per_class=100, seed=999)
    df = spark.createDataFrame(
        [(i, t, l) for i, (t, l) in enumerate(labeled)],
        "doc_id long, text string, label int",
    )
    scored = quality_model_score(df).select(
        "label", (F.col("quality_model") >= 0.5).cast("int").alias("pred")
    )
    agg = scored.agg(
        F.avg((F.col("label") == F.col("pred")).cast("double")).alias("acc")
    ).first()
    assert agg["acc"] >= 0.9, f"held-out accuracy {agg['acc']:.3f} < 0.9"


def test_score_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, "the fast key order sort table scan merge part window"),
            (2, "buy cheap click free win money now casino bonus prize " * 5),
            (3, None),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["quality_model"] for r in quality_model_score(df).collect()}
    assert rows[3] is None
    assert 0.0 <= rows[4] <= 1.0  # empty text -> sigmoid(bias), defined
    assert rows[1] > 0.5 > rows[2]
    assert rows[1] > rows[2]


def test_score_is_deterministic_and_preserves_columns(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma", "x")], "doc_id long, text string, extra string"
    )
    out1 = quality_model_score(df).collect()
    out2 = quality_model_score(df).collect()
    assert out1 == out2
    assert set(out1[0].asDict()) == {"doc_id", "text", "extra", "quality_model"}


def test_model_artifact_shape():
    m = load_model()
    assert m["width"] == len(m["weights"]) == 4096
    assert m["train_accuracy"] >= 0.95
