"""Deterministic trainer for the hashed bigram language model —
regenerates ``esmarc_spark/lookups/lm_bigram.json``.

CCNet-style curation scores every document with an n-gram LM
perplexity and gates on it (documents far from the target distribution
score high). The real stack uses KenLM; this sandbox has no KenLM, so
the engine ships a *hashed* bigram LM with Jelinek-Mercer
interpolation — the same model family, with token/bigram identity
replaced by the repo's portable md5 bucket so Spark and the DuckDB
oracle replay the IDENTICAL arithmetic (see ``ops/lm.py``).

Counts come from the fixed sf0.001 ``documents`` corpus (the engine's
own in-domain text), fully deterministically — no RNG at all: the
artifact is a pure function of the corpus bytes. ``tests/test_lm.py``
regenerates it and asserts byte-identity (the vendored-golden pattern
used for the BPE merges and quality weights).

Model (must match ``ops/lm.py`` and its oracle EXACTLY):

* tokens  = lower(text) split on single spaces, empties dropped;
* j_u(w)  = portable md5 bucket of (w  + SALT_U) mod U_WIDTH;
* j_b(w1,w2) = portable md5 bucket of (w1 + ' ' + w2 + SALT_B) mod B_WIDTH;
* cu[j]   = total occurrences of tokens hashing to j; C = sum(cu);
* cb[j]   = total occurrences of adjacent bigrams hashing to j;
* p_u(w)  = (cu[j_u(w)] + 0.5) / (C + 0.5 * U_WIDTH)      (add-half);
* p_ml(w2|w1) = min(cb[j_b] / cu[j_u(w1)], 1)  (0 if context unseen);
* p(w2|w1) = LAMBDA * p_ml + (1 - LAMBDA) * p_u(w2)  in (0, 1).

Usage: python scripts/gen_lm_model.py [out_path]
"""

from __future__ import annotations

import hashlib
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CORPUS = "/root/testdata/sf0.001/documents.parquet"
U_WIDTH = 4096
B_WIDTH = 16384
SALT_U = "lmuni1"
SALT_B = "lmbi1"
LAMBDA = 0.7


def bucket(s: str, salt: str, width: int) -> int:
    """The portable md5 bucket — MUST equal the engine/oracle rendering
    (conv(substr(md5(s || salt),1,15),16,10) % width)."""
    return int(hashlib.md5((s + salt).encode("utf-8")).hexdigest()[:15], 16) % width


def corpus_texts() -> list[str]:
    import duckdb

    rows = duckdb.sql(
        f"SELECT text FROM read_parquet('{CORPUS}') "
        "WHERE text IS NOT NULL ORDER BY doc_id"
    ).fetchall()
    return [r[0] for r in rows]


def count(texts: list[str]) -> tuple[list[int], list[int], int]:
    cu = [0] * U_WIDTH
    cb = [0] * B_WIDTH
    total = 0
    for t in texts:
        toks = [w for w in t.lower().split(" ") if w]
        for w in toks:
            cu[bucket(w, SALT_U, U_WIDTH)] += 1
            total += 1
        for a, b in zip(toks, toks[1:]):
            cb[bucket(a + " " + b, SALT_B, B_WIDTH)] += 1
    return cu, cb, total


def main() -> None:
    out_path = Path(
        sys.argv[1]
        if len(sys.argv) > 1
        else REPO / "esmarc_spark" / "lookups" / "lm_bigram.json"
    )
    cu, cb, total = count(corpus_texts())
    out_path.write_text(
        json.dumps(
            {
                "u_width": U_WIDTH,
                "b_width": B_WIDTH,
                "salt_u": SALT_U,
                "salt_b": SALT_B,
                "lambda": LAMBDA,
                "total": total,
                "cu": cu,
                "cb": cb,
            }
        )
        + "\n"
    )
    nz_u = sum(1 for v in cu if v)
    nz_b = sum(1 for v in cb if v)
    print(
        f"tokens {total}, nonzero uni buckets {nz_u}/{U_WIDTH}, "
        f"nonzero bi buckets {nz_b}/{B_WIDTH} -> {out_path}"
    )


if __name__ == "__main__":
    main()
