"""Deterministic trainer for the hashed n-gram quality classifier —
regenerates ``esmarc_spark/lookups/quality_weights.json``.

The standard curation stack scores documents with a lightweight linear
classifier over hashed token n-grams (fastText-style bag of hashed
grams). This trains that model offline, fully deterministically (fixed
seed, fixed iteration count, float64 full-batch gradient descent), on a
synthetic labeled set built from the fixed sf0.001 ``documents`` vocab:

* GOOD: seeded word-salad in the corpus's own vocabulary (what the
  engine's tables actually contain);
* SPAM: the classic failure modes — single-token repetition, keyword
  stuffing, consonant gibberish, digit/punctuation floods.

Features: unigrams + bigrams hashed with the repo's portable md5
bucket (same construction as ops.sampling) into ``WIDTH`` buckets,
mean-pooled. Weights are rounded to 6 decimals before writing so the
artifact is byte-stable; ``tests/test_quality_model.py`` regenerates it
and asserts byte-identity, and gates held-out accuracy.

Usage: python scripts/gen_quality_weights.py [out_path]
"""

from __future__ import annotations

import hashlib
import json
import random
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CORPUS = "/root/testdata/sf0.001/documents.parquet"
WIDTH = 4096
SALT = "qmodel1"
LR = 5.0
ITERS = 6000

_STUFF = [
    "buy", "cheap", "click", "free", "win", "money", "now", "offer",
    "deal", "sale", "casino", "bonus", "prize", "viagra", "loan",
]
_CONS = "bcdfghjklmnpqrstvwxz"
_PUNCT = ["!!!", "$$$", "???", "%%", "##", ">>>", "...", "!!!!"]


def corpus_vocab() -> list[str]:
    import duckdb

    rows = duckdb.sql(
        "SELECT DISTINCT unnest(string_split(text, ' ')) AS w FROM "
        f"read_parquet('{CORPUS}') WHERE text IS NOT NULL ORDER BY w"
    ).fetchall()
    return [r[0] for r in rows if r[0]]


def make_labeled(vocab: list[str], n_per_class: int, seed: int) -> list[tuple[str, int]]:
    """(text, label) — label 1 = good. Deterministic in (vocab, seed)."""
    rng = random.Random(seed)
    out: list[tuple[str, int]] = []
    for _ in range(n_per_class):
        n = rng.randint(40, 160)
        out.append((" ".join(rng.choice(vocab) for _ in range(n)), 1))
    kinds = ["repeat", "stuff", "gibberish", "flood"]
    for i in range(n_per_class):
        kind = kinds[i % len(kinds)]
        n = rng.randint(40, 160)
        if kind == "repeat":
            w = rng.choice(vocab + _STUFF)
            toks = [w] * n
        elif kind == "stuff":
            toks = [rng.choice(_STUFF) for _ in range(n)]
        elif kind == "gibberish":
            toks = [
                "".join(rng.choice(_CONS) for _ in range(rng.randint(4, 12)))
                for _ in range(n)
            ]
        else:
            toks = [
                rng.choice(_PUNCT) if rng.random() < 0.6 else str(rng.randint(0, 10**6))
                for _ in range(n)
            ]
        # light mixing so spam isn't trivially disjoint from the vocab
        toks = [rng.choice(vocab) if rng.random() < 0.15 else t for t in toks]
        out.append((" ".join(toks), 0))
    rng.shuffle(out)
    return out


def bucket(gram: str, salt: str = SALT, width: int = WIDTH) -> int:
    """The portable md5 bucket — MUST equal the engine/oracle rendering
    (conv(substr(md5(g || salt),1,15),16,10) % width)."""
    return int(hashlib.md5((gram + salt).encode("utf-8")).hexdigest()[:15], 16) % width


def featurize(text: str, width: int = WIDTH) -> np.ndarray:
    toks = [t for t in text.lower().split(" ") if t]
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    x = np.zeros(width)
    for g in grams:
        x[bucket(g)] += 1.0
    if grams:
        x /= len(grams)
    return x


def train(labeled: list[tuple[str, int]]) -> tuple[np.ndarray, float]:
    X = np.stack([featurize(t) for t, _ in labeled])
    y = np.array([l for _, l in labeled], dtype=np.float64)
    w = np.zeros(WIDTH)
    b = 0.0
    for _ in range(ITERS):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        grad_w = X.T @ (p - y) / len(y)
        grad_b = float(np.mean(p - y))
        w -= LR * grad_w
        b -= LR * grad_b
    return w, b


def main() -> None:
    out_path = Path(
        sys.argv[1]
        if len(sys.argv) > 1
        else REPO / "esmarc_spark" / "lookups" / "quality_weights.json"
    )
    vocab = corpus_vocab()
    labeled = make_labeled(vocab, n_per_class=400, seed=1234)
    w, b = train(labeled)
    w = np.round(w, 6)
    b = round(b, 6)
    preds = [
        (featurize(t) @ w + b > 0) == bool(l) for t, l in labeled
    ]
    acc = sum(preds) / len(preds)
    out_path.write_text(
        json.dumps(
            {
                "width": WIDTH,
                "salt": SALT,
                "bias": b,
                "train_accuracy": round(acc, 4),
                "weights": [float(v) for v in w],
            }
        )
        + "\n"
    )
    print(f"train acc {acc:.4f}, bias {b}, -> {out_path}")


if __name__ == "__main__":
    main()
