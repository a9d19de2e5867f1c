"""Real merge-based byte-level BPE tokenization (round 6 — VERDICT r5
#3): exact token counts and token arrays under the vendored merge table
``lookups/bpe_merges.json`` (trained by the deterministic seeded
``scripts/gen_bpe_vocab.py``; regeneration byte-identity tested).

The cheap JVM-side proxy (``ops.text.bpe_token_count`` — pretokenizer
regex count, no merges) stays the default for gating/stats; THIS module
is for when the count must agree with an actual tokenizer: token
budgeting, packing, and token-exact chunking.

Design for 100 TB — map-only, zero shuffle, bounded Python:

* the merge loop is inherently per-piece iterative, so this is a
  legitimate Pandas-UDF case (Arrow batches, never row-at-a-time
  pickling);
* Python cost is amortized by a per-executor piece->encoding cache:
  natural text is Zipfian, so after warm-up almost every pretoken piece
  is a dict hit and the per-row work is a regex findall + dict sums —
  the encoder effectively runs once per DISTINCT piece per executor,
  not once per occurrence (the same reason a distinct-piece
  explode/join shape would work, without paying its two shuffles over
  an every-token-a-row explode);
* the merge table ships inside the package (imported lazily per
  executor), so there is no broadcast to manage and no driver state.

Pretokenizer: the Python-`re` rendering of the repo's GPT-2-style
pattern (``ops.text.BPE_PATTERN``). Both the Spark UDF and the golden
reference encoder (scripts/regen_golden_bpe.py) pretokenize in Python
with THIS pattern, so there is no cross-engine regex-parity surface;
the classes are self-consistent and partition every string (letters /
digits / punctuation-or-underscore / whitespace, each optionally
space-prefixed like GPT-2).
"""

# NOTE: no `from __future__ import annotations` here — it stringifies
# the pandas-UDF type hints and pandas_udf's eval-type inference rejects
# string annotations ([UNSUPPORTED_SIGNATURE]).
import json
import re
from functools import lru_cache
from pathlib import Path

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StringType

# Python-re rendering of ops.text.BPE_PATTERN (\p{L} -> [^\W\d_],
# \p{N} -> \d, other -> [^\w\s]|_ so every char lands in one class)
PY_BPE_PATTERN = re.compile(
    r"'(?:s|t|re|ve|m|ll|d)| ?[^\W\d_]+| ?\d+| ?(?:[^\w\s]|_)+|\s+"
)

MERGES_PATH = Path(__file__).resolve().parent.parent / "lookups" / "bpe_merges.json"


def _merges_text() -> str:
    """Read the vendored merge table ZIP-SAFELY: executors import the
    package from the addPyFile zip, where ``Path(__file__)``-relative
    io.open fails with NotADirectoryError — importlib.resources handles
    both the on-disk and zipimport cases."""
    from importlib import resources

    return (
        resources.files("esmarc_spark.lookups")
        .joinpath("bpe_merges.json")
        .read_text()
    )


def pretokenize(text: str) -> list[str]:
    return PY_BPE_PATTERN.findall(text)


@lru_cache(maxsize=1)
def merge_ranks(path: str | None = None) -> dict[tuple[int, int], int]:
    """(sym_a, sym_b) -> rank; merged symbol id is 256 + rank."""
    raw = json.loads(
        Path(path).read_text() if path else _merges_text()
    )
    return {(a, b): r for r, (a, b) in enumerate(raw["merges"])}


def encode_piece(
    piece: str, ranks: dict[tuple[int, int], int]
) -> list[int]:
    """Classic BPE: start from UTF-8 byte ids, repeatedly apply the
    lowest-rank applicable merge until none applies."""
    syms = list(piece.encode("utf-8"))
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [256 + best_rank]
    return syms


class _PieceCache:
    """Per-executor piece->value cache (value = count or token strings).
    Bounded: evicts wholesale at ``cap`` entries — natural-text Zipf
    keeps the working set tiny, and a pathological all-unique corpus
    degrades to encode-per-piece, never to unbounded memory."""

    def __init__(self, fn, cap: int = 1 << 20):
        self.fn, self.cap, self.d = fn, cap, {}

    def __call__(self, piece: str):
        v = self.d.get(piece)
        if v is None:
            v = self.fn(piece)
            if len(self.d) >= self.cap:
                self.d.clear()
            self.d[piece] = v
        return v


def _count_udf():
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(LongType())
    def n_bpe_tokens(texts: pd.Series) -> pd.Series:
        ranks = merge_ranks()
        cache = _PieceCache(lambda p: len(encode_piece(p, ranks)))
        return texts.map(
            lambda t: None
            if t is None
            else sum(cache(p) for p in pretokenize(t))
        ).astype("Int64")

    return n_bpe_tokens


def _tokens_udf():
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(ArrayType(StringType()))
    def bpe_tokens(texts: pd.Series) -> pd.Series:
        ranks = merge_ranks()
        # token string = the symbol's bytes decoded latin-1: reversible
        # byte carrier (encode(x,'ISO-8859-1') on the JVM side restores
        # the exact original bytes)
        pair_of = {256 + r: pair for pair, r in ranks.items()}
        expand: dict[int, bytes] = {}

        def sym_to_bytes(s: int) -> bytes:
            if s < 256:
                return bytes([s])
            b = expand.get(s)
            if b is None:
                a, c = pair_of[s]
                b = sym_to_bytes(a) + sym_to_bytes(c)
                expand[s] = b
            return b

        cache = _PieceCache(
            lambda p: [
                sym_to_bytes(s).decode("latin-1")
                for s in encode_piece(p, ranks)
            ]
        )
        return texts.map(
            lambda t: None
            if t is None
            else [tok for p in pretokenize(t) for tok in cache(p)]
        )

    return bpe_tokens


def bpe_exact_count(text: Column | str = "text") -> Column:
    """Exact token count under the vendored merge table (Arrow-batched;
    see module doc). Returns long; null text -> null."""
    c = F.col(text) if isinstance(text, str) else text
    return _count_udf()(c)


def bpe_tokens_col(text: Column | str = "text") -> Column:
    """array<string> of BPE token strings (latin-1 byte carriers, see
    ``_tokens_udf``) — concatenating them and re-encoding latin-1
    restores the document's exact UTF-8 bytes."""
    c = F.col(text) if isinstance(text, str) else text
    return _tokens_udf()(c)


def token_counts_bpe(documents: DataFrame, text: str = "text") -> DataFrame:
    """(doc_id, n_tokens) under real merge-based BPE — the driver query.
    Oracle: vendored golden (independent plain reference encoder in
    scripts/regen_golden_bpe.py; regeneration byte-identity tested)."""
    return documents.select(
        "doc_id", bpe_exact_count(text).alias("n_tokens")
    )


def chunk_documents_bpe(
    documents: DataFrame,
    chunk_tokens: int = 512,
    overlap: int = 64,
    text: str = "text",
) -> DataFrame:
    """``ops.chunking.chunk_documents`` with REAL BPE token windows:
    same start/step/slice contract (chunk starts at token 1, 1+step,
    ...; final chunk may be short), but token = merge-based BPE token,
    so ``chunk_tokens`` is an actual model-context budget.

    Python does only the tokenization (one Arrow pass); the windowing
    stays Catalyst (sequence/slice/posexplode, row-local, no shuffle).
    Chunk text is the exact byte span of its tokens (latin-1 carrier
    re-encoded, then UTF-8-validated); a boundary can split a
    multi-byte char only if BPE left that char's bytes in separate
    tokens, in which case the dangling bytes render as U+FFFD exactly
    like any byte-window chunker."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}"
        )
    step = chunk_tokens - overlap
    docs = documents.select(
        "doc_id", bpe_tokens_col(text).alias("_toks")
    )
    n = F.size("_toks")
    starts = F.when(
        n >= 1, F.sequence(F.lit(1), n, F.lit(step))
    ).otherwise(F.array().cast("array<int>"))
    chunks = F.transform(
        starts, lambda s: F.slice("_toks", s, F.lit(chunk_tokens))
    )
    return docs.select(
        "doc_id", F.posexplode(chunks).alias("chunk_id", "_ctoks")
    ).select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.size("_ctoks").alias("n_tokens"),
        F.expr(
            "make_valid_utf8(cast(encode(array_join(_ctoks, ''),"
            " 'ISO-8859-1') AS string))"
        ).alias("chunk"),
    )
