"""Stage 3 — span emission + final text (recognition/finalize analog).

The reference's finalize step filters by confidence, sorts boxes in
reading order, re-indexes, and emits the per-document result
(/root/reference/src/pipeline/ocr_pipeline.cpp:687-734). Our blocks are
already in document order (the stage-1 stream parser emits in DOM
order, a total order — the (y,x)+epsilon bubble refinement of
compareOCRResults, ocr_pipeline.cpp:180-200, degenerates to a no-op),
but we still array_sort on the canonical key (pos, depth, block_id) so
the output order is independent of any upstream reordering.

All expressions, zero shuffle: the per-document fan-in barrier the
reference builds from atomics (RecognitionTaskContext.pendingCount,
ocr_pipeline.h:251-265) simply doesn't exist here — the blocks never
left their row.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dxnn_ocr_cpp_spark.config import DEFAULT_CONFIG, ExtractionConfig


def span_filter(b, cfg: ExtractionConfig, task=None):
    """Keep predicate (F2/F3/F5/F6 analogs).

    task: optional per-row override struct Column (schemas.TASK_CONFIG,
    the OCRTaskConfig analog — the reference threads per-request
    thresholds through every stage, ocr_pipeline.cpp:457-461). NULL
    fields fall back to the run-level cfg via coalesce — still pure
    Column logic, so the zero-shuffle/one-Python-hop plan shape is
    unchanged by per-row variation."""
    def thresh(field, default):
        lit = F.lit(default)
        return lit if task is None else F.coalesce(task[field], lit)

    ld = b["n_link_chars"] / F.greatest(b["n_text_chars"], F.lit(1))
    return (
        (b["score"] >= thresh("box_thresh", cfg.box_thresh))
        & (b["score"] >= thresh("rec_score_thresh", cfg.rec_score_thresh))
        & (b["n_text_chars"] >= thresh("min_text_chars", cfg.min_text_chars))
        & (ld <= thresh("max_link_density", cfg.max_link_density))
        & (b["text"] != F.lit(""))
    )


def with_spans(df, cfg: ExtractionConfig = DEFAULT_CONFIG,
               scored_col: str = "scored", out_col: str = "spans",
               task_col: str | None = None):
    task = F.col(task_col) if task_col else None
    kept = F.filter(F.col(scored_col), lambda b: span_filter(b, cfg, task))
    # canonical order: (pos, depth, block_id) — struct comparison is
    # field-order lexicographic, so put sort keys first, then re-index.
    ordered = F.array_sort(F.transform(
        kept,
        lambda b: F.struct(
            b["pos"].alias("pos"),
            b["depth"].alias("depth"),
            b["block_id"].alias("block_id"),
            b["text"].alias("text"),
            b["score"].alias("score"),
        ),
    ))
    spans = F.transform(
        ordered,
        lambda b, i: F.struct(
            i.cast("int").alias("span_index"),   # re-index, O2 analog
            b["text"].alias("text"),
            b["score"].alias("score"),
            b["pos"].alias("pos"),
        ),
    )
    return df.withColumn(out_col, spans)


def with_final_text(df, cfg: ExtractionConfig = DEFAULT_CONFIG,
                    spans_col: str = "spans", out_col: str = "text"):
    """concat spans -> final text. Empty span set -> '' (row preserved,
    F8 analog: no-boxes documents still emit a result)."""
    txt = F.array_join(
        F.transform(F.col(spans_col), lambda s: s["text"]),
        cfg.span_separator,
    )
    return df.withColumn(out_col, txt)
