"""Sliding-window document chunking — context-window-sized training/RAG
pieces cut from full documents.

``pack_sequences`` (operators/sampling.py) solves the opposite problem
(many short docs → one fixed-size sequence); this one cuts documents
LONGER than the context window into overlapping windows (the Hugging
Face ``return_overflowing_tokens`` convention: advance by ``stride``
tokens, emit a window only while the previous window hasn't already
covered the whole document, so no window is a pure subset of its
predecessor).

Shape: 100% narrow Catalyst expressions — split → sequence → posexplode
→ slice.  No shuffle, no UDF, no Python; a 1→N row explode that
whole-stage codegen streams, so at 10^12 docs it rides the extraction
scan for free.  Exactly SQL-expressible → DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(documents: DataFrame, size: int = 64, stride: int = 48,
                    text_col: str = "text",
                    key_col: str = "doc_id") -> DataFrame:
    """Cut each document into whitespace-token windows of ``size`` tokens
    advancing by ``stride`` (< size ⇒ ``size - stride`` tokens of
    overlap for boundary-loss-free training).

    Emits ``(key, chunk_idx, start_tok, n_tokens, chunk_md5)`` — one row
    per window, ``chunk_idx`` dense from 0 in document order.  A window
    at start s > 0 is emitted only if the previous window did not reach
    the end of the document (``s - stride + size < n_tokens``), so the
    last window may be short but never redundant.  Empty documents
    produce no rows (callers needing every-input accounting wrap with
    the usual status left-join).
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    toks = documents.filter(
        # empty/null text yields NO windows — split('', ' ') is ['']
        # (a phantom 1-token chunk of md5('')), so gate on the string,
        # not the token count (review r3b)
        F.col(text_col).isNotNull() & (F.col(text_col) != "")
    ).select(
        F.col(key_col),
        F.split(F.col(text_col), " ").alias("_toks"),
    ).withColumn("_n", F.size("_toks"))
    starts = toks.select(
        key_col, "_toks", "_n",
        F.posexplode(
            F.sequence(F.lit(0), F.col("_n") - 1, F.lit(stride))
        ).alias("chunk_idx", "_start"),
    ).filter(
        (F.col("_start") == 0)
        | (F.col("_start") - stride + size < F.col("_n"))
    )
    chunk = F.slice("_toks", F.col("_start") + 1, F.lit(size))
    return starts.select(
        key_col,
        "chunk_idx",
        F.col("_start").alias("start_tok"),
        F.size(chunk).alias("n_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )
