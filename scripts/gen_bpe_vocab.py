"""Deterministic byte-level BPE trainer — regenerates the vendored
merge table ``esmarc_spark/lookups/bpe_merges.json``.

Trains on the fixed sf0.001 ``documents`` table (driver-generated,
deterministic; no external data), exactly the classic BPE procedure
(Sennrich et al. 2016, the GPT-2 byte-level variant): pretokenize with
the repo's BPE pretokenizer, represent each piece as its UTF-8 byte
ids (0..255), then repeatedly merge the most frequent adjacent symbol
pair — new symbols get ids 256, 257, ... in merge order. Ties break on
the lexicographically smallest pair, so the output is a pure function
of the corpus: ``tests/test_bpe.py`` regenerates it and asserts
byte-identity against the vendored file (the crawl_pipeline golden
pattern).

Usage: python scripts/gen_bpe_vocab.py [max_merges] [out_path]
"""

from __future__ import annotations

import json
import sys
from collections import Counter
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CORPUS = "/root/testdata/sf0.001/documents.parquet"
MIN_PAIR_FREQ = 2


def train(texts: list[str], max_merges: int) -> list[list[int]]:
    from esmarc_spark.ops.bpe import pretokenize

    piece_freq: Counter[str] = Counter()
    for t in texts:
        piece_freq.update(pretokenize(t))
    # each distinct piece once, weighted by its corpus frequency
    words: list[tuple[list[int], int]] = [
        (list(p.encode("utf-8")), f) for p, f in sorted(piece_freq.items())
    ]

    merges: list[list[int]] = []
    next_id = 256
    for _ in range(max_merges):
        pairs: Counter[tuple[int, int]] = Counter()
        for syms, f in words:
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], (-kv[0][0], -kv[0][1])))
        (a, b), freq = best
        if freq < MIN_PAIR_FREQ:
            break
        merges.append([a, b])
        for w, (syms, f) in enumerate(words):
            i, out = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(next_id)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = (out, f)
        next_id += 1
    return merges


def main() -> None:
    max_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    out_path = Path(
        sys.argv[2]
        if len(sys.argv) > 2
        else REPO / "esmarc_spark" / "lookups" / "bpe_merges.json"
    )
    import duckdb

    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM read_parquet('{CORPUS}') "
            "WHERE text IS NOT NULL ORDER BY doc_id"
        ).fetchall()
    ]
    merges = train(texts, max_merges)
    out_path.write_text(
        json.dumps(
            {"corpus": CORPUS, "max_merges": max_merges, "merges": merges},
            indent=1,
        )
        + "\n"
    )
    print(f"{len(merges)} merges -> {out_path}")


if __name__ == "__main__":
    main()
