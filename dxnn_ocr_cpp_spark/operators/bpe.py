"""Distributed BPE vocabulary training + corpus segmentation —
byte-pair encoding (Sennrich, Haddow & Birch, ACL 2016), the tokenizer
step of every modern LM data pipeline, re-expressed Spark-first.

The key scale insight (same as the original algorithm): BPE trains on
the WORD-COUNT table, not the corpus. One corpus-scale groupBy(word)
reduces 10^12 corpus tokens to ~10^7-10^8 distinct words; every merge
iteration after that runs on the word table only.

  word_counts    ONE corpus groupBy (partial-aggregated; the only
                 corpus-scale shuffle in training)
  per iteration  explode adjacent symbol pairs (weighted by word
                 count) -> groupBy(pair) sum -> argmax via
                 orderBy().limit(1) = TakeOrderedAndProject, ONE row
                 to the driver (the ivf.py tiny-collect discipline)
                 -> rewrite symbol arrays with a pure-Catalyst
                 aggregate() fold (greedy left-to-right non-
                 overlapping, exactly the reference semantics)
  lineage        localCheckpoint per round truncates the iterative
                 plan (same failure mode + fix as linkgraph.
                 host_pagerank / operators/cc.py)

Determinism: the argmax tiebreak is (count DESC, pair string ASC) —
the merge list is a pure function of the corpus, partitioning-
invariant (pinned in tests/test_bpe.py against a sequential
pure-Python reference implementation, the htmlseg parity discipline —
BPE's iterative argmax is not SQL-expressible, so the driver records
this family rows-only and pytest carries the proof).

Symbols are strings; words are whitespace-tokenized (lm.tokens_col)
so symbols never contain a space, making 'left right' pair strings
unambiguous. Initial symbolization is characters plus a terminal
'</w>' marker (multi-char, collision-free with any single char).

Segmentation of new text joins words against the trained word table
(the by-product (word, syms) mapping); out-of-vocabulary words fall
back to character symbols with NO merges applied — the rare path is
documented rather than silently wrong; callers needing exact OOV
merges can re-run the fold chain on the OOV subset.

Reference analog: none (fixed CTC charset,
/root/reference/src/models/recognizer_crnn.cpp) — tokenizer-training
infrastructure its batch analog needs, operators/lm.py category.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .lm import tokens_col

END_OF_WORD = "</w>"


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, c) corpus word-frequency table — the BPE training set.
    The one corpus-scale operation in training."""
    return (df.select(F.explode(tokens_col(text_col)).alias("word"))
            .groupBy("word")
            .agg(F.count(F.lit(1)).cast("long").alias("c")))


def _char_symbols(word):
    """Initial symbolization: characters + terminal END_OF_WORD.
    substring() is character-based (unicode-safe)."""
    chars = F.transform(F.sequence(F.lit(1), F.length(word)),
                        lambda i: F.substring(word, i, 1))
    return F.concat(chars, F.array(F.lit(END_OF_WORD)))


def _pair_strings(syms):
    """Adjacent symbol pairs as 'left right' strings (symbols never
    contain spaces); empty array for 1-symbol words. sequence(1, 0)
    would count DOWN — guard."""
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(syms) - 1),
        lambda i: F.concat_ws(" ", F.get(syms, i - 1), F.get(syms, i)))
    return F.when(F.size(syms) >= 2, pairs) \
            .otherwise(F.array().cast("array<string>"))


def _merge_fold(syms, left: str, right: str):
    """Greedy left-to-right non-overlapping merge of (left, right) ->
    left+right over a symbol array, as a pure-Catalyst aggregate()
    fold. CaseWhen branches are evaluated lazily, so element_at(-1)
    never touches the empty accumulator (ANSI-safe)."""
    return F.aggregate(
        syms, F.array().cast("array<string>"),
        lambda acc, s: F.when(F.size(acc) == 0, F.array(s))
        .when((F.element_at(acc, -1) == F.lit(left))
              & (s == F.lit(right)),
              F.concat(F.slice(acc, 1, F.size(acc) - 1),
                       F.array(F.lit(left + right))))
        .otherwise(F.concat(acc, F.array(s))))


def train_bpe(df: DataFrame, text_col: str = "text",
              n_merges: int = 32, max_merges: int = 2048):
    """Train a BPE merge list on a corpus.

    Returns (merges, words) where merges is the ordered driver-side
    list of (left, right, pair_count) — n_merges tiny rows; this IS
    the model — and words is the final (word, c, syms) DataFrame
    (the segmentation lookup table by-product).

    Stops early when no pair occurs twice (merging a count-1 pair is
    pure overfit and breaks the deterministic-tiebreak guarantee's
    usefulness).

    Merge-count envelope: training operates on the word-count table
    (the right scale shape — corpus size only affects the one
    word_counts pass), but BPE merges are inherently sequential and
    each merge here is one driver-looped Spark round (a 1-row argmax
    collect + a fold over the word table). At ~0.1-0.3 s/round that
    is fine for the few-hundred-merge vocabularies this engine
    demos, and absurd for a real 30k-merge tokenizer (30k sequential
    Spark jobs ≈ hours of pure scheduling). For large vocabularies
    the right move is: word_counts(df) in Spark (the only
    corpus-scale step), collect the word table (even a 100 TB corpus
    yields only millions of distinct words — a few hundred MB), and
    run the merge loop single-node over the collected counts. The
    max_merges guard makes that boundary explicit instead of letting
    a 30k-merge call silently melt the scheduler (mirrors
    similarity.cosine_dup_pairs_exact's max_rows guard)."""
    if int(n_merges) > int(max_merges):
        raise ValueError(
            f"train_bpe: n_merges={n_merges} exceeds max_merges="
            f"{max_merges}. Each merge is one sequential driver-looped "
            f"Spark round; at this vocabulary size collect the "
            f"word_counts(df) table (distinct words, not the corpus) "
            f"and train the merge loop single-node instead, or raise "
            f"max_merges explicitly if you accept the scheduling cost.")
    words = (word_counts(df, text_col)
             .select("word", "c",
                     _char_symbols(F.col("word")).alias("syms"))
             .localCheckpoint(eager=False))
    merges: list[tuple[str, str, int]] = []
    for _ in range(int(n_merges)):
        best = (words
                .select("c", F.explode(_pair_strings(F.col("syms")))
                        .alias("p"))
                .groupBy("p").agg(F.sum("c").alias("n"))
                .orderBy(F.desc("n"), F.asc("p"))
                .limit(1).collect())          # ONE row per iteration
        if not best or best[0]["n"] < 2:
            break
        left, right = best[0]["p"].split(" ", 1)
        merges.append((left, right, int(best[0]["n"])))
        words = (words
                 .select("word", "c",
                         _merge_fold(F.col("syms"), left, right)
                         .alias("syms"))
                 .localCheckpoint(eager=False))
    return merges, words


def _apply_merge(syms: list, left: str, right: str) -> list:
    """Greedy left-to-right non-overlapping merge — the Python twin of
    _merge_fold (same semantics, pinned against it in test_bpe)."""
    out, i, ab, n = [], 0, left + right, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(ab)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def train_bpe_collected(df: DataFrame, text_col: str = "text",
                        n_merges: int = 30_000,
                        max_words: int = 50_000_000):
    """The large-vocabulary scale path train_bpe's envelope points at:
    word_counts(df) stays the ONE distributed corpus pass, then the
    word table — distinct words, not the corpus; even a 100 TB corpus
    yields tens of millions of rows (~60 B/entry, a few GB of driver
    heap at the max_words guard) — is collected and the inherently
    sequential merge loop runs single-node with INCREMENTAL pair-count
    maintenance: each merge touches only the words containing the
    merged pair (pair -> words index), not the whole table, so a real
    30k-merge vocabulary costs seconds instead of 30k sequential Spark
    jobs (train_bpe's driver-looped round per merge).

    Same contract and bit-identical output as train_bpe: returns
    (merges, words) with merges = ordered [(left, right, count)] and
    words = (word, c, syms) DataFrame; selection key is (max count,
    lexicographic 'left right' asc) and training stops when no pair
    occurs twice. Equality with train_bpe AND the sequential reference
    is pinned in tests/test_bpe.py."""
    spark = df.sparkSession
    wc_df = word_counts(df, text_col)
    n_words = wc_df.count()
    if n_words > max_words:
        raise ValueError(
            f"train_bpe_collected: {n_words} distinct words exceeds "
            f"max_words={max_words} (driver-heap guard, ~60 B/word). "
            f"Trim the tail first (word_counts(df).filter('c >= 2') "
            f"drops hapaxes) or raise max_words explicitly.")
    wc = {r["word"]: r["c"] for r in wc_df.collect()}

    words = {w: list(w) + [END_OF_WORD] for w in wc}
    pair_counts: dict = {}
    pair_words: dict = {}
    for w, syms in words.items():
        c = wc[w]
        for p in zip(syms, syms[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + c
            pair_words.setdefault(p, set()).add(w)

    merges: list[tuple[str, str, int]] = []
    for _ in range(int(n_merges)):
        if not pair_counts:
            break
        (left, right), n = min(
            pair_counts.items(),
            key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
        if n < 2:
            break
        merges.append((left, right, int(n)))
        # snapshot: the loop body mutates pair_words[(left, right)]
        affected = list(pair_words.get((left, right), ()))
        for w in affected:  # only words containing the merged pair
            syms, c = words[w], wc[w]
            for p in zip(syms, syms[1:]):
                remaining = pair_counts[p] - c
                if remaining:
                    pair_counts[p] = remaining
                else:
                    del pair_counts[p]
                ws = pair_words.get(p)
                if ws is not None:
                    ws.discard(w)
                    if not ws:
                        del pair_words[p]
            syms = _apply_merge(syms, left, right)
            words[w] = syms
            for p in zip(syms, syms[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + c
                pair_words.setdefault(p, set()).add(w)

    rows = [(w, int(wc[w]), words[w]) for w in wc]
    out = spark.createDataFrame(
        rows, "word string, c long, syms array<string>")
    return merges, out


def merges_df(spark, merges) -> DataFrame:
    """The trained merge list as a DataFrame: (merge_idx, left,
    right, n) — the artifact to persist next to the corpus."""
    rows = [(i, l, r, n) for i, (l, r, n) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "merge_idx long, left string, right string, n long")


def bpe_segment(docs: DataFrame, words: DataFrame,
                id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Per-document BPE token stats under a trained vocabulary:
    (id_col, n_words:long, n_tokens:long) where n_tokens counts BPE
    symbols. The corpus explodes to words and joins the (word, syms)
    table — a plain equi-join Spark/AQE sizes (broadcast when the
    vocab fits, shuffle otherwise); OOV words fall back to character
    symbols + END_OF_WORD with no merges applied (see module note).
    explode_outer keeps zero-token docs (F8 invariant)."""
    w = words.select(F.col("word").alias("_w"),
                     F.size("syms").alias("_n_syms"))
    tok = docs.select(id_col,
                      F.explode_outer(tokens_col(text_col)).alias("_w"))
    n_tok = F.when(F.col("_w").isNull(), F.lit(0)) \
        .otherwise(F.coalesce(F.col("_n_syms"),
                              F.length("_w") + 1))  # OOV: chars + </w>
    return (tok.join(w, "_w", "left")
            .groupBy(id_col)
            .agg(F.count("_w").cast("long").alias("n_words"),
                 F.sum(n_tok).cast("long").alias("n_tokens")))
