"""Physical layout: url-bucket partitioning + hot-host salting (X4/X5).

The reference dodges skew/contention by pinning recognition to one
thread (/root/reference/src/pipeline/ocr_pipeline.cpp:128-132) and
batching crops by aspect-ratio bucket
(/root/reference/src/recognition/text_recognizer.cpp:135-183). At
cluster scale our skew is hot hosts (few hosts own half the corpus) and
giant pages. Both are defused before the expensive stage-1 UDF:

  * repartition on xxhash64(url) — uniform, key-independent spread
    (per-doc work is embarrassingly parallel; no key locality needed);
  * len_bucket column (C5 aspect-ratio-bucket analog) so giant pages
    can be observed (lineage histogram) and, when writing, routed.

For the Iceberg layout the DDL (io.py) buckets on url, matching the
north rule `hash(url)` bucket mandate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# byte-length buckets for html blobs (analog of ratio buckets {3,5,10,15,25,35})
LEN_BUCKET_EDGES = [1 << 10, 4 << 10, 16 << 10, 64 << 10, 256 << 10, 1 << 20, 8 << 20]


def with_len_bucket(df, html_col: str = "html", out_col: str = "len_bucket"):
    expr = F.lit(len(LEN_BUCKET_EDGES))
    for i in reversed(range(len(LEN_BUCKET_EDGES))):
        expr = F.when(F.length(F.col(html_col)) <= LEN_BUCKET_EDGES[i], F.lit(i)).otherwise(expr)
    return df.withColumn(out_col, expr.cast("int"))


def host_of(url_col):
    return F.regexp_extract(url_col, r"^[a-z]+://([^/]+)/", 1)


def salted_repartition(df, n_partitions: int, url_col: str = "url",
                       salt_buckets: int = 8):
    """Spread rows uniformly for the UDF stage. xxhash64(url, salt)
    already decorrelates hot hosts; the salt term guards the degenerate
    case of massive per-url duplication upstream."""
    salt = (F.xxhash64(F.col(url_col)) % salt_buckets).cast("int")
    return df.repartition(n_partitions, F.xxhash64(F.col(url_col), salt))


def bucket_id(url_col, n_buckets: int = 32):
    """Stable bucket id for layout/lineage: pmod(xxhash64(url), n)."""
    return F.pmod(F.xxhash64(url_col), F.lit(n_buckets)).cast("int")
