"""Regenerate tests/golden/bpe_chunks.ldj — the oracle input for the
``bpe_chunk_shards`` driver query (round 7, VERDICT r6 #7: the
training-shard path checked on REAL BPE counts end to end).

INDEPENDENT reference encoder, same stance as regen_golden_bpe.py: all
merges replayed in rank order (trainer order) vs the engine's
lowest-rank-pair loop — equivalent for any valid merge table, and
hashing cell-for-cell is the point. This script additionally KEEPS the
token byte sequences and windows them with the chunking contract
(starts 1, 1+step, ...; final chunk may be short), emitting per chunk:

    {doc_id, chunk_id, n_tokens, chunk_md5}

chunk_md5 is md5 of the chunk's bytes decoded UTF-8 errors='replace'
then re-encoded — byte-identical to the engine's
make_valid_utf8(cast(... AS string)) channel (pinned by the round-4
S1 parity tests). Null-text documents yield no chunks (the engine's
posexplode of an empty array).

Byte-identity of regeneration is asserted by tests/test_bpe.py.

Usage: python scripts/regen_golden_bpe_chunks.py [out_path]
"""

from __future__ import annotations

import hashlib
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CORPUS = "/root/testdata/sf0.01/documents.parquet"
CHUNK_TOKENS = 48
OVERLAP = 8


def encode_tokens(piece: str, merges: list[list[int]]) -> list[bytes]:
    """Token byte sequences after replaying every merge in rank order."""
    syms: list[tuple[int, bytes]] = [
        (b, bytes([b])) for b in piece.encode("utf-8")
    ]
    for rank, (a, b) in enumerate(merges):
        i, out = 0, []
        while i < len(syms):
            if i + 1 < len(syms) and syms[i][0] == a and syms[i + 1][0] == b:
                out.append((256 + rank, syms[i][1] + syms[i + 1][1]))
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
        if len(syms) == 1:
            break
    return [s[1] for s in syms]


def main() -> None:
    out_path = Path(
        sys.argv[1]
        if len(sys.argv) > 1
        else REPO / "tests" / "golden" / "bpe_chunks.ldj"
    )
    import duckdb

    from esmarc_spark.ops.bpe import MERGES_PATH, pretokenize

    merges = json.loads(MERGES_PATH.read_text())["merges"]
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{CORPUS}') ORDER BY doc_id"
    ).fetchall()
    cache: dict[str, list[bytes]] = {}
    step = CHUNK_TOKENS - OVERLAP
    n_chunks = 0
    with out_path.open("w") as f:
        for doc_id, text in rows:
            if text is None:
                continue
            toks: list[bytes] = []
            for p in pretokenize(text):
                t = cache.get(p)
                if t is None:
                    t = cache[p] = encode_tokens(p, merges)
                toks.extend(t)
            if not toks:
                continue
            for chunk_id, start in enumerate(range(0, len(toks), step)):
                window = toks[start : start + CHUNK_TOKENS]
                raw = b"".join(window)
                md = hashlib.md5(
                    raw.decode("utf-8", errors="replace").encode("utf-8")
                ).hexdigest()
                f.write(
                    json.dumps(
                        {
                            "doc_id": doc_id,
                            "chunk_id": chunk_id,
                            "n_tokens": len(window),
                            "chunk_md5": md,
                        }
                    )
                    + "\n"
                )
                n_chunks += 1
    print(f"{len(rows)} docs -> {n_chunks} chunks -> {out_path}")


if __name__ == "__main__":
    main()
