"""Document chunking — fixed-token windows with overlap, the standard
prep step before tokenization/packing for training and for embedding
long documents (each chunk becomes an embedding-table row).

Contract (deterministic, mirrored exactly by the oracle SQL):
chunks start at token 1, 1+step, 1+2*step, ... (step = chunk_tokens -
overlap) while the start is within the document; each chunk takes up to
``chunk_tokens`` tokens; the final chunk may be shorter. A document
with fewer tokens than ``chunk_tokens`` yields exactly one chunk.

Row-local explode — the fan-out happens inside the row (no shuffle, no
Python); output size is ~n_tokens/step rows per doc, which is the
output's inherent size, not overhead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    documents: DataFrame,
    chunk_tokens: int = 512,
    overlap: int = 64,
    text: str = "text",
    tokenizer: str = "whitespace",
) -> DataFrame:
    """(doc_id, chunk_id, n_tokens, chunk) — chunk_id is 0-based and
    ordered; n_tokens is the chunk's own token count.

    ``tokenizer="whitespace"`` (default) is pure Catalyst; ``"bpe"``
    windows on REAL merge-based BPE tokens (ops.bpe — one Arrow
    tokenization pass, Catalyst windowing) so ``chunk_tokens`` is an
    actual model-context budget."""
    if tokenizer == "bpe":
        from esmarc_spark.ops.bpe import chunk_documents_bpe

        return chunk_documents_bpe(documents, chunk_tokens, overlap, text)
    if tokenizer != "whitespace":
        raise ValueError(f"unknown tokenizer: {tokenizer!r}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}")
    step = chunk_tokens - overlap
    toks = F.split(F.col(text), " ")
    n = F.size(toks)
    starts = F.when(n >= 1, F.sequence(F.lit(1), n, F.lit(step))).otherwise(
        F.array().cast("array<int>")
    )
    chunks = F.transform(
        starts, lambda s: F.slice(toks, s, F.lit(chunk_tokens))
    )
    return (
        documents.select(
            "doc_id", F.posexplode(chunks).alias("chunk_id", "_ctoks")
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.size("_ctoks").alias("n_tokens"),
            F.array_join("_ctoks", " ").alias("chunk"),
        )
    )


def chunk_documents_sql(
    source_select: str, chunk_tokens: int = 512, overlap: int = 64
) -> str:
    """DuckDB oracle: identical start/step/slice semantics (1-based list
    slicing; range is end-exclusive so the bound is n+1)."""
    step = chunk_tokens - overlap
    return f"""
WITH src AS ({source_select}),
tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM src),
st AS (
  SELECT doc_id, toks,
         range(1, len(toks) + 1, {step}) AS starts
  FROM tok WHERE len(toks) >= 1
),
ex AS (
  SELECT doc_id,
         generate_subscripts(starts, 1) - 1 AS chunk_id,
         unnest(starts) AS start,
         toks
  FROM st
)
SELECT doc_id,
       cast(chunk_id AS int) AS chunk_id,
       len(toks[start : start + {chunk_tokens} - 1]) AS n_tokens,
       array_to_string(toks[start : start + {chunk_tokens} - 1], ' ') AS chunk
FROM ex
ORDER BY doc_id, chunk_id
"""
