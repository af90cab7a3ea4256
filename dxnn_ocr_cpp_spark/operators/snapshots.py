"""Cross-snapshot corpus diff — the re-crawl delta.

A web-scale corpus is re-crawled in snapshots (Common-Crawl monthly
dumps); the first question against a new snapshot is "what actually
changed?" — the delta drives incremental processing (only re-extract
changed pages), storage (only store new content), and monitoring
(sudden mass-removal or mass-churn is a crawl bug). recrawl_latest
(__spark_entry__) collapses a capture HISTORY to the newest row; this
operator compares two SNAPSHOTS row-for-row.

Scale shape: each side is projected to (key, fingerprint) BEFORE the
join — the full-outer shuffle carries two small columns per row, never
the documents. One exchange per side, hash-partitioned on the key; no
broadcast (both sides are corpus-sized), no window, no O(n^2) shape.
At 10^12 documents this is the minimal possible plan for an exact
diff. If both snapshots are written bucketed/partitioned by hash(url)
(the Iceberg layout io.py mandates), the exchanges vanish entirely.

Reference analog: the reference serves one request against one image
and has no corpus notion; this is the corpus-lifecycle operation its
batch analog needs. Fingerprint policy matches the dedup family
(md5 of raw text — C6 canonical comparison key, textstats.fingerprint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def snapshot_diff(old: DataFrame, new: DataFrame, key_col: str = "url",
                  text_col: str = "text",
                  fp_col: str | None = None) -> DataFrame:
    """Per-key delta between two corpus snapshots.

    Returns exactly ONE row per key appearing on either side:
    (key_col, status, old_fp, new_fp) with status:
      added      key only in `new`
      removed    key only in `old`
      changed    key in both, fingerprints differ
      unchanged  key in both, fingerprints equal

    Duplicate captures of the same key WITHIN one snapshot (a real
    Common-Crawl artifact) are collapsed before the join — each side
    contributes max(fingerprint) per key (deterministic; NULLs lose to
    any non-NULL) — so duplicates can never multiply rows through the
    full-outer join. Callers who care which capture wins should
    collapse history themselves first (recrawl_latest keeps the newest
    by timestamp). The collapse rides the join's own hash exchange on
    the key: partial-aggregated, zero extra shuffles.

    fp_col names a precomputed fingerprint column (skips hashing —
    use when a content digest is already stored, e.g. WARC block
    digests); otherwise the fingerprint is md5(text_col), with NULL
    text fingerprinting to NULL (two NULL-text captures of the same
    url compare as unchanged — null-safe equality, not SQL NULL
    semantics, because "both empty" is not a content change).
    """
    def side(df: DataFrame, alias: str) -> DataFrame:
        fp = F.col(fp_col) if fp_col else F.md5(F.col(text_col))
        return (df.select(F.col(key_col).alias("k"), fp.alias("fp"))
                .groupBy("k")
                .agg(F.max("fp").alias(f"{alias}_fp"),
                     F.lit(True).alias(f"in_{alias}")))

    joined = side(old, "old").join(side(new, "new"), "k", "full_outer")
    status = (F.when(F.col("in_old").isNull(), "added")
              .when(F.col("in_new").isNull(), "removed")
              .when(F.col("old_fp").eqNullSafe(F.col("new_fp")),
                    "unchanged")
              .otherwise("changed"))
    return joined.select(F.col("k").alias(key_col),
                         status.alias("status"), "old_fp", "new_fp")


def incremental_refresh(old_docs: DataFrame, new_docs: DataFrame,
                        prev_results: DataFrame, process_fn,
                        key_col: str = "url",
                        text_col: str = "text") -> DataFrame:
    """Re-crawl refresh of a per-document derived table: produce
    process_fn(new_docs)'s results while only RUNNING process_fn over
    the churn.

      unchanged  previous result rows are reused verbatim (semi-join)
      added      processed fresh
      changed    reprocessed (old result row dropped)
      removed    dropped (their keys left the corpus)

    process_fn(docs) -> DataFrame must be per-document (keyed by
    key_col, one-or-more rows per input doc — the extract() shape) and
    deterministic, so reused rows equal what reprocessing would give;
    under that contract the output is row-identical to
    process_fn(new_docs) (pinned in tests/test_snapshots.py).

    Cost shape at 10^12 docs: the diff join (two (key, fp) column
    projections), two semi-joins on the key, and process_fn over
    churn-sized input only — monthly Common-Crawl churn is a few
    percent, so the expensive stage (extraction's Arrow hop) shrinks
    ~30-50x vs recomputing the snapshot. This is the batch analog of
    lineage.run_incremental_stage's key-resume, generalized to
    content-changed keys; persist the returned frame as the new
    snapshot's derived table (Iceberg MERGE copy-on-write analog).
    """
    # persist the two-column (key, status) diff: both branches below
    # consume it, and without the pin the corpus-sized full-outer join
    # would execute once per branch when the union materializes
    diff = (snapshot_diff(old_docs, new_docs, key_col, text_col)
            .select(key_col, "status").persist())
    reuse_keys = (diff.filter(F.col("status") == "unchanged")
                  .select(F.col(key_col)))
    todo_keys = (diff.filter(F.col("status").isin("added", "changed"))
                 .select(F.col(key_col)))
    reused = prev_results.join(reuse_keys, key_col, "left_semi")
    fresh = process_fn(new_docs.join(todo_keys, key_col, "left_semi"))
    return reused.unionByName(fresh)


def diff_summary(diff: DataFrame) -> DataFrame:
    """(status, n) rollup of a snapshot_diff result — the monitoring
    view (mass-removal/churn alarms). One partial-aggregated groupBy
    over 4 distinct keys."""
    return (diff.groupBy("status")
            .agg(F.count("*").cast("long").alias("n")))
