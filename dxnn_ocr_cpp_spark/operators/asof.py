"""Point-in-time (as-of) join — the leakage-free temporal join a
training-data pipeline needs (label row <- most recent feature snapshot
at-or-before the label's timestamp) and the relational generalization of
the reference's task-id result correlation (results matched to the most
recent pending request state, /root/reference/server/ocr_handler.cpp:157-205).

Spark has no ASOF JOIN operator; the naive encodings both die at scale:

  range join      probe JOIN build ON key = key AND b.ts <= p.ts
                  + window max — a non-equi join Spark plans as
                  BroadcastNestedLoop, and every probe row re-scans the
                  build side's whole history: O(|probe| * |history|).
  per-key arrays  groupBy(key).agg(sort_array(collect_list(build))) then
                  binary-search per probe row — a hot key's entire
                  history must fit in one task (the exact skew the north
                  rule exists to defuse).

This implementation is the canonical scalable form: UNION both sides
with a side tag, ONE hash-partition-by-key shuffle, one window sort by
(ts, side, tie), and `last(build_struct, ignorenulls=True)` over the
unbounded-preceding frame. Cost is sort-merge-like O((n+m) log run) per
partition, no join node at all — the plan contains exactly one Exchange
and zero BroadcastNestedLoop/CartesianProduct (pinned in
tests/test_asof.py). Build payload rides as ONE struct so a NULL inside
a payload field can never desynchronize columns across build rows.

Semantics (pandas.merge_asof direction="backward", allow_exact_matches):
for each probe row, the build row with the greatest ts <= probe.ts on
the same key; ties on ts broken by greatest `tie` (pass a unique column
for a total order — determinism under any partitioning). Optional
`tolerance_sec` nulls out matches staler than the window, compared on
raw microsecond timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TS, _SIDE, _B = "__asof_ts", "__asof_side", "__asof_b"


def asof_join(probe: DataFrame, build: DataFrame, on, ts: str,
              payload: list, tie: str,
              tolerance_sec: int | None = None) -> DataFrame:
    """Backward as-of join: probe rows + `asof_<c>` for each payload
    column of the matching build row + `asof_ts` (all NULL when no
    build row at-or-before exists within tolerance).

    on       equality key column name(s) present in BOTH frames
    ts       event-time column name present in BOTH frames
    payload  build columns to carry onto the matched probe row
    tie      build column breaking equal-ts ties (greatest wins); pass
             a unique id for deterministic output
    """
    keys = [on] if isinstance(on, str) else list(on)
    out_cols = [f"asof_{c}" for c in payload] + ["asof_ts"]
    clash = [c for c in out_cols if c in probe.columns]
    if clash:
        raise ValueError(f"probe already has output columns {clash}")

    # build payload as ONE nullable struct (atomic last() pick)
    b_struct = F.struct(
        F.col(ts).alias("asof_ts"), F.col(tie).alias("__tie"),
        *[F.col(c).alias(f"asof_{c}") for c in payload])
    # a build row with NULL event time can never satisfy "greatest ts
    # <= probe.ts" (SQL comparison with NULL is never true, and
    # merge_asof drops such rows) — but the window's nulls-first order
    # would park it at the partition head where last(ignorenulls) could
    # pick it. Exclude up front.
    build_side = build.filter(F.col(ts).isNotNull()).select(
        *keys, F.col(ts).alias(_TS), F.lit(0).alias(_SIDE),
        b_struct.alias(_B),
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c)
          for c in probe.columns if c not in keys])
    probe_side = probe.select(
        *keys, F.col(ts).alias(_TS), F.lit(1).alias(_SIDE),
        F.lit(None).cast(build_side.schema[_B].dataType).alias(_B),
        *[c for c in probe.columns if c not in keys])

    # order: ts asc, build-before-probe at equal ts (inclusive match),
    # equal build ts resolved by tie asc -> last() = greatest tie
    w = (Window.partitionBy(*keys)
         .orderBy(F.col(_TS).asc(), F.col(_SIDE).asc(),
                  F.col(_B)["__tie"].asc_nulls_first())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = build_side.unionByName(probe_side) \
        .withColumn(_B, F.last(_B, ignorenulls=True).over(w)) \
        .filter(F.col(_SIDE) == 1)
    if tolerance_sec is not None:
        fresh = (F.col(_B)["asof_ts"] >=
                 F.col(_TS) - F.expr(f"INTERVAL {int(tolerance_sec)} SECONDS"))
        matched = matched.withColumn(
            _B, F.when(fresh, F.col(_B)))  # else NULL struct
    return matched.select(
        *probe.columns,
        *[F.col(_B)[c].alias(c) for c in out_cols])
