"""Page-metadata enrichment operator — OpenGraph / JSON-LD /
canonical / published-time / license columns from raw HTML.

One Arrow-batched ``mapInPandas`` pass over the pages relation
(``extractors/page_meta.py`` does the parsing): no shuffle, no pixel
or markdown work, so it composes ahead of any curation stage.  The
columns feed the standard web-curation moves:

- ``canonical_url`` → publisher-declared dedup key (join it against
  ``functions/url.py:canonicalize_url`` output; when both exist the
  publisher's claim wins);
- ``published_time`` (verbatim string + its source precedence) →
  temporal filtering / recency weighting;
- ``license`` → licensing audits (CC-BY corpora builds filter on it);
- ``og_type`` / ``jsonld_types`` → page-kind routing (article vs
  product vs profile) long before an ML classifier runs;
- ``title`` / ``description`` / ``site_name`` → retrieval metadata.

One row in, one row out; pages with no metadata yield all-null
columns (the no-silent-drops invariant).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType, StringType, StructField, StructType,
)

PAGE_META_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("title", StringType(), True),
    StructField("description", StringType(), True),
    StructField("canonical_url", StringType(), True),
    StructField("og_type", StringType(), True),
    StructField("og_image", StringType(), True),
    StructField("site_name", StringType(), True),
    StructField("published_time", StringType(), True),
    StructField("license", StringType(), True),
    StructField("jsonld_types", ArrayType(StringType()), False),
])


def page_metadata(df: DataFrame, url_col: str = "url",
                  html_col: str = "html") -> DataFrame:
    """(url, html) → structured page-metadata columns."""
    from ..extractors.page_meta import extract_page_meta

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, html in zip(pdf[url_col], pdf[html_col]):
                m = extract_page_meta(html if isinstance(html, str)
                                      else "")
                rows.append((url, m.title, m.description,
                             m.canonical_url, m.og_type, m.og_image,
                             m.site_name, m.published_time, m.license,
                             m.jsonld_types))
            yield pd.DataFrame(
                rows, columns=[f.name for f in PAGE_META_SCHEMA])

    return df.select(url_col, html_col).mapInPandas(kernel,
                                                    PAGE_META_SCHEMA)
