"""Spark wrapper for charset sniffing: raw page bytes → decoded text.

``detect_and_decode`` is the crawl-ingest preprocessing step between a
byte source (WARC explode, ``binaryFile``) and everything downstream
that wants ``string`` text: one Arrow-batched ``mapInPandas`` pass, no
shuffle, schema ``input columns + (text, encoding, enc_how)``.  The
pure sniffing logic lives in ``extractors/charset.py`` (stdlib-only,
WHATWG-ordered: BOM → meta prescan → strict-UTF-8 trial →
windows-1252 fallback); this module only supplies the Spark plumbing,
mirroring the extraction pipeline's batch shape.

The default extraction path stays byte-identical to the reference
(utf-8/replace, golden-pinned) — this operator is opt-in, for corpora
where legacy encodings matter.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def detect_and_decode(df: DataFrame, blob_col: str = "html",
                      keep_cols: list | None = None) -> DataFrame:
    """(keep_cols..., text, encoding, enc_how) — one decoded row per
    input row, never fewer (undecodable bytes are replaced, null blobs
    yield null text): the no-silent-drops invariant."""
    out_names = ("text", "encoding", "enc_how")
    if keep_cols is not None:
        clash = sorted(set(keep_cols) & set(out_names))
        if clash:
            raise ValueError(f"keep_cols {clash} collide with the "
                             f"decode output columns {out_names}")
        if blob_col in keep_cols:
            # Would duplicate the blob column in the input select,
            # making pdf[blob_col] a DataFrame and crashing the kernel
            # (round-5 advice).
            raise ValueError(f"keep_cols must not contain the blob "
                             f"column {blob_col!r}; it is consumed by "
                             f"the decode and not carried through")
        keep = keep_cols
    else:
        # The standard pages relation already carries oracle 'text' /
        # 'lang' columns; the decode REPLACES text, so colliding input
        # columns drop from the default carry-through instead of
        # producing a duplicate-name schema (which crashes the Arrow
        # kernel with RESULT_COLUMN_SCHEMA_MISMATCH).
        keep = [c for c in df.columns
                if c != blob_col and c not in out_names]
    in_fields = [df.schema[c] for c in keep]
    out_schema = T.StructType(in_fields + [
        T.StructField("text", T.StringType()),
        T.StructField("encoding", T.StringType()),
        T.StructField("enc_how", T.StringType()),
    ])

    def _decode(batches):
        import pandas as pd

        from ..extractors.charset import sniff_decode

        for pdf in batches:
            texts, encs, hows = [], [], []
            for blob in pdf[blob_col]:
                if blob is None:
                    texts.append(None)
                    encs.append(None)
                    hows.append(None)
                else:
                    t, e, h = sniff_decode(bytes(blob))
                    texts.append(t)
                    encs.append(e)
                    hows.append(h)
            out = pdf[keep].copy()
            out["text"] = texts
            out["encoding"] = encs
            out["enc_how"] = hows
            yield out

    return df.select(*keep, blob_col).mapInPandas(_decode,
                                                  schema=out_schema)
