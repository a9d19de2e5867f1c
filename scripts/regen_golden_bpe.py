"""Regenerate tests/golden/bpe_counts.ldj — the oracle for the
``token_counts_bpe`` driver query.

INDEPENDENT reference encoder: this script deliberately re-implements
BPE encoding from the merge table instead of importing
``esmarc_spark.ops.bpe.encode_piece`` — it replays ALL merges in rank
order over the whole piece (the trainer's application order), whereas
the engine repeatedly picks the lowest-rank applicable pair. The two
formulations are equivalent for any valid merge table; running both
and hashing cell-for-cell is the point of the golden.

Only the pretokenizer pattern is shared (it is part of the tokenizer's
public contract, like the merge table itself).

Byte-identity of the output is asserted by tests/test_bpe.py (the
crawl_pipeline vendored-golden pattern).

Usage: python scripts/regen_golden_bpe.py [out_path]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CORPUS = "/root/testdata/sf0.01/documents.parquet"


def encode_count(piece: str, merges: list[list[int]]) -> int:
    syms = list(piece.encode("utf-8"))
    for rank, (a, b) in enumerate(merges):
        i, out = 0, []
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(256 + rank)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
        if len(syms) == 1:
            break
    return len(syms)


def main() -> None:
    out_path = Path(
        sys.argv[1] if len(sys.argv) > 1 else REPO / "tests" / "golden" / "bpe_counts.ldj"
    )
    import duckdb

    from esmarc_spark.ops.bpe import MERGES_PATH, pretokenize

    merges = json.loads(MERGES_PATH.read_text())["merges"]
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{CORPUS}') ORDER BY doc_id"
    ).fetchall()
    cache: dict[str, int] = {}
    with out_path.open("w") as f:
        for doc_id, text in rows:
            if text is None:
                n = None
            else:
                n = 0
                for p in pretokenize(text):
                    c = cache.get(p)
                    if c is None:
                        c = cache[p] = encode_count(p, merges)
                    n += c
            f.write(json.dumps({"doc_id": doc_id, "n_tokens": n}) + "\n")
    print(f"{len(rows)} rows -> {out_path}")


if __name__ == "__main__":
    main()
