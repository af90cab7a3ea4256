"""Input validation guard — the F7 analog of the reference's request
validation (/root/reference/server/ocr_handler.cpp:38-124: URL length,
base64 size caps, parameter ranges).

Row-level rules as pure Column expressions; invalid rows are not
dropped silently — they are split off with a reject_reason so lineage
accounts for every input row (reference returns a structured error per
bad request; we return a rejects DataFrame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dxnn_ocr_cpp_spark.config import DEFAULT_CONFIG, ExtractionConfig

MAX_URL_LEN = 2083  # de-facto max URL length (the reference caps URL
                    # input size the same way, ocr_handler.cpp:54-66)


def reject_reason(cfg: ExtractionConfig = DEFAULT_CONFIG):
    """NULL when the row is processable, else a fixed reason label.
    Order matters (first failing rule wins) and is part of the
    contract — deterministic across runs."""
    url = F.col("url")
    html = F.col("html")
    return (
        F.when(url.isNull() | (F.length(url) == 0), F.lit("null_url"))
        .when(F.length(url) > MAX_URL_LEN, F.lit("url_too_long"))
        .when(~url.rlike(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://"), F.lit("no_scheme"))
        .when(F.length(html) > cfg.max_html_bytes * 4, F.lit("html_too_large"))
        # html NULL / empty is VALID: F8 semantics — row emits text=''
        .otherwise(F.lit(None).cast("string"))
    )


def validate_documents(df: DataFrame,
                       cfg: ExtractionConfig = DEFAULT_CONFIG
                       ) -> tuple[DataFrame, DataFrame]:
    """-> (valid rows, rejects(url, reject_reason)).

    Note max_html_bytes*4: pages between cfg.max_html_bytes and 4x are
    TRUNCATED by the segmenter (P6 policy), only pathologically larger
    payloads are rejected outright — mirrors the reference's two-level
    policy (resize-to-cap vs 413-reject)."""
    tagged = df.withColumn("reject_reason", reject_reason(cfg))
    valid = tagged.filter(F.col("reject_reason").isNull()) \
                  .drop("reject_reason")
    rejects = tagged.filter(F.col("reject_reason").isNotNull()) \
                    .select("url", "reject_reason")
    return valid, rejects
