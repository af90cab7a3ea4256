"""Domain-weighted dataset mixing — compose a training corpus to
TARGET per-domain proportions (the Pile/DoReMi-style mixture step:
"the final mix should be 50% web, 30% code, 20% reference", or
per-host/per-language shares over a crawl).

Two halves, split so the expensive half stays trivially parallel:

  mix_rates   (domain, n_avail) x (domain, weight) -> per-domain
              acceptance rate. Domain counts are a partial-aggregated
              groupBy over the corpus (one shuffle of tiny rows); the
              rate arithmetic runs on the GROUP table (thousands of
              rows at web scale, never the corpus). The budget is
              capped by feasibility: domain d can contribute at most
              n_avail(d), so the realized total is
              min over represented domains of n_avail(d)/weight(d),
              optionally clamped by a caller budget — the largest
              total for which NO domain is oversubscribed (rates
              stay <= 1 and the realized mix hits the target shares
              exactly, not "as available").
  mix_sample  corpus filter: keep a row iff
              pmod(hash(key), 10^6) < rate(domain) * 10^6 — the
              deterministic hash-threshold idiom shared with
              partitioning.split_assign (no RNG, no partition-order
              dependence; stable under corpus growth and reruns).
              Rates arrive as a broadcast join (domain tables are
              small); the corpus side never shuffles.

hash_family: "xxhash64" (production: fastest) or "md5" (oracle
family: DuckDB replays md5 bit-for-bit — same discipline as
split_assign / quota_sample).

Reference analog: none (single-request engine); corpus-composition
infrastructure in the snapshots.py category.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000  # rate quantum: 1e-6 resolution on acceptance rates


def _bucket(col, hash_family: str):
    """Column in [0, SCALE): deterministic hash bucket of a key
    column. md5 family: first 15 hex chars (60 bits, sign-safe as
    long) — replayable in DuckDB as from_hex/conv."""
    if hash_family == "md5":
        h = F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
    elif hash_family == "xxhash64":
        h = F.xxhash64(col)
    else:
        raise ValueError(f"unknown hash_family {hash_family!r}")
    return F.pmod(h, F.lit(SCALE))


def mix_rates(domain_counts: DataFrame, weights: DataFrame,
              budget: int | None = None) -> DataFrame:
    """(domain, n_avail, weight, rate) acceptance-rate table.

    domain_counts: (domain, n_avail) — corpus rows per domain.
    weights: (domain, weight) — target shares; normalized here, so
    relative weights are fine. Domains present in the corpus but
    absent from `weights` get rate 0 (excluded from the mix);
    weighted domains absent from the corpus cap the feasible total
    through their 0 availability — both directions use one outer
    join on the SMALL tables.

    total = min_d n_avail(d) / share(d) over weighted represented
    domains (the feasibility bound), then min(budget) if given;
    rate(d) = share(d) * total / n_avail(d), exact in [0, 1].
    """
    w = weights.select(F.col(weights.columns[0]).alias("domain"),
                       F.col(weights.columns[1]).cast("double")
                       .alias("_w"))
    wsum = w.agg(F.sum("_w").alias("_ws"))
    w = (w.crossJoin(F.broadcast(wsum))
         .select("domain", (F.col("_w") / F.col("_ws")).alias("share")))
    dc = domain_counts.select(
        F.col(domain_counts.columns[0]).alias("domain"),
        F.col(domain_counts.columns[1]).cast("long").alias("n_avail"))
    j = (dc.join(w, "domain", "full_outer")
         .select("domain",
                 F.coalesce("n_avail", F.lit(0)).alias("n_avail"),
                 F.coalesce("share", F.lit(0.0)).alias("share")))
    feas = (j.filter(F.col("share") > 0)
            .agg(F.min(F.col("n_avail") / F.col("share"))
                 .alias("_t")))
    if budget is not None:
        feas = feas.select(F.least(F.col("_t"), F.lit(float(budget)))
                           .alias("_t"))
    return (j.crossJoin(F.broadcast(feas))
            .select("domain", "n_avail",
                    F.col("share").alias("weight"),
                    F.when(F.col("n_avail") > 0,
                           F.col("share") * F.col("_t")
                           / F.col("n_avail"))
                    .otherwise(F.lit(0.0)).alias("rate")))


def temperature_weights(domain_counts: DataFrame, tau: float,
                        quantum: int = 1_000_000) -> DataFrame:
    """(domain, weight) mixture weights from corpus shares with a
    sampling temperature: weight ∝ n_avail^tau.

    The standard multilingual/multi-source rebalancing knob (XLM-R /
    mC4 alpha-sampling, typically tau in [0.2, 0.7]): tau=1 keeps
    natural proportions (mixing becomes a no-op), tau=0 is uniform
    over represented domains, 0<tau<1 flattens the mixture — rare
    domains are upsampled relative to their natural share without
    hand-written weight tables. Feed the result straight into
    mix_rates (which normalizes, so these weights need no
    normalization here).

    Weights are quantized to integer micro-units (round(n^tau *
    quantum)) — the dsir.py micro-nat discipline: the DuckDB twin
    replays round(pow(...)) on identical integers, so a last-ulp
    difference between the two engines' pow() can never propagate
    into the acceptance thresholds.

    Runs on the GROUP table only (thousands of rows at web scale,
    never the corpus).
    """
    dc = domain_counts.select(
        F.col(domain_counts.columns[0]).alias("domain"),
        F.col(domain_counts.columns[1]).cast("double").alias("_n"))
    w = F.round(F.pow(F.col("_n"), F.lit(float(tau))) * quantum)
    return dc.select("domain",
                     F.when(F.col("_n") > 0, w)
                     .otherwise(F.lit(0.0)).alias("weight"))


def mix_sample(docs: DataFrame, rates: DataFrame,
               domain_col: str = "domain", key_col: str = "url",
               hash_family: str = "xxhash64") -> DataFrame:
    """Filter `docs` to the target mix: keep a row iff its hash
    bucket clears its domain's acceptance threshold. Preserves the
    input schema. Corpus side: zero shuffle — one broadcast join on
    the domain column plus a codegen'd filter."""
    thresholds = F.broadcast(rates.select(
        F.col("domain").alias("_mix_domain"),
        F.floor(F.col("rate") * SCALE).cast("long").alias("_mix_thr")))
    keep = _bucket(F.col(key_col), hash_family) < F.col("_mix_thr")
    return (docs.join(thresholds,
                      docs[domain_col] == F.col("_mix_domain"), "left")
            .filter(F.coalesce(keep, F.lit(False)))
            .drop("_mix_domain", "_mix_thr"))


def epoch_plan(domain_tokens: DataFrame, weights: DataFrame,
               budget_tokens: int, max_epochs: float = 4.0) -> DataFrame:
    """(domain, n_tokens, share, target_tokens, epochs,
    realized_tokens, shortfall) — the data-constrained training plan:
    how many EPOCHS of each domain fill a token budget at target
    shares when domains may be repeated (Muennighoff et al. 2023:
    up to ~4 epochs of repeated data retain most of fresh-data
    value; beyond that returns collapse, so the cap is a first-class
    argument, not a magic constant).

      target_d   = share_d * budget
      epochs_d   = min(max_epochs, target_d / n_tokens_d)  (fractional
                   final epoch = a mix_sample rate over that domain)
      realized_d = epochs_d * n_tokens_d
      shortfall_d= target_d - realized_d  (> 0 iff the epoch cap bit)

    Deliberately NO deficit redistribution across domains: that would
    be an iterative fixed point (redistributing to a domain can push
    IT to the cap), killing exact SQL replayability — and in practice
    the operator is run, shortfalls inspected, weights adjusted, rerun
    (the DoReMi loop). The one-shot plan is the replayable primitive.

    Runs on the GROUP table only; weights normalized here (relative
    weights fine, temperature_weights output plugs straight in).
    Domains with weight 0 / absent from `weights` get share 0 —
    present in the plan with target 0 (full outer join on the SMALL
    tables, the mix_rates discipline).
    """
    dt = domain_tokens.select(
        F.col(domain_tokens.columns[0]).alias("domain"),
        F.col(domain_tokens.columns[1]).cast("long").alias("n_tokens"))
    w = weights.select(F.col(weights.columns[0]).alias("domain"),
                       F.col(weights.columns[1]).cast("double")
                       .alias("_w"))
    wsum = w.agg(F.sum("_w").alias("_ws"))
    w = (w.crossJoin(F.broadcast(wsum))
         .select("domain", (F.col("_w") / F.col("_ws")).alias("share")))
    j = (dt.join(w, "domain", "full_outer")
         .select("domain",
                 F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
                 F.coalesce("share", F.lit(0.0)).alias("share")))
    target = F.col("share") * F.lit(float(budget_tokens))
    epochs = F.when(F.col("n_tokens") > 0,
                    F.least(F.lit(float(max_epochs)),
                            target / F.col("n_tokens"))) \
        .otherwise(F.lit(0.0))
    realized = epochs * F.col("n_tokens")
    return j.select("domain", "n_tokens", "share",
                    target.alias("target_tokens"),
                    epochs.alias("epochs"),
                    realized.alias("realized_tokens"),
                    (target - realized).alias("shortfall"))
