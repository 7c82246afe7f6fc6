"""Corpus-mixture curation for training-data pipelines: cross-document
boilerplate detection and deterministic stratified sampling with
per-domain caps.

These are the corpus-level companions to the per-document signals in
``textstats.py`` (which needs only the row in hand): boilerplate needs a
corpus-wide n-gram document-frequency index, and mixture sampling needs a
corpus-wide per-domain ranking. Both are standard web-scale curation
steps (C4 removed boilerplate lines seen across pages; RefinedWeb capped
per-domain document mass; The Pile / DoReMi mix strata at fixed rates).
The reference repo has no corpus-curation stage — these extend the
engine for the 100 TB training-data use case.

Determinism: every probabilistic choice is a pure function of
(key, seed) through the engine-portable sha256 hash family
(``conv(substr(sha2(x,256),1,15),16,10)``), so runs are bit-reproducible
across engines, partitionings, and cluster sizes, and the DuckDB oracles
replay them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .textstats import _tokens

#: modulus for the deterministic uniform draw (keeps rate arithmetic in
#: exact integers: keep iff u < rate_ppm, with rates in parts-per-million)
SAMPLE_MOD = 1_000_000


def ngrams_col(words: Column, n: int) -> Column:
    """Adjacent word n-grams (space-joined) for ANY n — generalizes
    textstats._grams beyond 2/3 as a chain of n-1 ``zip_with`` concats
    over shifted slices (each pass is linear and allocation-light).
    The obvious ``transform(sequence(...), i -> array_join(slice(words,
    i, n)))`` formulation re-slices n elements per gram — measured 6×
    slower (4.5 s vs 0.7 s over sf0.1) from the per-gram array copies.

    Empty array when the document has fewer than n words OR a NULL
    token array (NULL text): under ANSI ``size(NULL)`` is NULL, so a
    bare ``size < n`` guard falls through to the build branch and can
    manufacture a NULL gram — coalesce first."""
    size = F.coalesce(F.size(words), F.lit(0))
    count = F.greatest(size - (n - 1), F.lit(0))
    g = F.slice(words, 1, count)
    for i in range(1, n):
        g = F.zip_with(
            g,
            F.slice(words, 1 + i, count),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.when(size < n, F.array().cast("array<string>")).otherwise(g)


def _portable_hash60(c: Column) -> Column:
    """First 15 hex chars of sha256 as a 60-bit long — the repo-wide
    engine-portable hash family (same as dedup.py / textstats.py)."""
    return F.conv(F.substring(F.sha2(c, 256), 1, 15), 16, 10).cast("long")


def boilerplate_scores(
    df: DataFrame,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_docs: int = 3,
    hash_fn: str = "fast",
) -> DataFrame:
    """Cross-document repeated-span (boilerplate) detection: for each
    document, the fraction of its DISTINCT word n-grams that appear in at
    least ``min_docs`` distinct documents corpus-wide. High values mean
    the document is mostly template/boilerplate text shared across the
    corpus (nav menus, license footers, scraped chrome) — C4/CCNet drop
    or strip such content before training.

    Returns one row per input document:
      doc_id, n_grams (distinct n-grams), n_common (of those, how many
      are corpus-common), boilerplate_bp (exact integer basis points).

    Scale shape (the inverted-index pattern, ONE pass over the text):
      1. tokenize + n-gram + hash + ``array_distinct`` ARRAY-SIDE —
         grams are hashed to longs INSIDE the array (``transform``)
         before the explode, so the explode emits 8-byte longs instead
         of gram strings (measured 7× end-to-end: 10.1 s → 1.4 s at
         sf0.1 — copying 14 M gram strings into unsafe rows dominated),
         and within-doc dedup costs no shuffle;
      2. the shuffle therefore ships (doc_id, gram_hash) pairs — 16
         bytes/row regardless of gram length;
      3. document frequency rides a window count partitioned on
         gram_hash: rows are pre-deduped per doc, so count(*) over the
         partition IS doc-frequency, and the same rows flow on — a
         groupBy+self-join formulation would recompute the whole
         tokenize/explode subtree a second time (Spark DAGs don't share
         non-persisted subtrees across join branches);
      4. per-doc totals = one hash-aggregate on doc_id counting all rows
         vs rows whose gram cleared ``min_docs`` — no join back to the
         gram index at all;
      5. documents with zero n-grams (shorter than n words) vanish at the
         explode, so an ids-only left join from the input restores them —
         the probe side carries ONE long column.
    No UDFs, no driver collection. The window's per-partition sort is
    over 8-byte keys; a hot gram's partition holds at most one row per
    document (pre-deduped), the same bound a groupBy would have.

    ``hash_fn``: "fast" (xxhash64 — the production default; one JVM hash
    per gram) or "portable" (sha256-based 60-bit — ~4× slower per gram,
    reproducible in any engine; the board query pins this so the DuckDB
    oracle can replay the index exactly). Same fast/portable split as
    dedup.SIMHASH_HASHES. Hash collisions: ~N²/2⁶¹ expected false merges
    (N = distinct grams corpus-wide); at 10¹⁰ grams that is ~0.05
    expected collisions — negligible under either family.
    """
    words = _tokens(F.col(text_col))
    hash_one = _portable_hash60 if hash_fn == "portable" else F.xxhash64
    base = df.select(
        F.col(doc_id_col).alias("doc_id"),
        F.array_distinct(
            F.transform(ngrams_col(words, n), lambda g: hash_one(g))
        ).alias("grams"),
    )
    exploded = base.select("doc_id", F.explode("grams").alias("gram_h"))

    counted = exploded.withColumn(
        "docs", F.count("*").over(Window.partitionBy("gram_h"))
    )
    stats = counted.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_grams"),
        F.sum(F.when(F.col("docs") >= min_docs, 1).otherwise(0))
        .cast("long").alias("n_common"),
    )
    z = F.lit(0).cast("long")
    return df.select(F.col(doc_id_col).alias("doc_id")).join(
        stats, "doc_id", "left"
    ).select(
        "doc_id",
        F.coalesce(F.col("n_grams"), z).alias("n_grams"),
        F.coalesce(F.col("n_common"), z).alias("n_common"),
        F.floor(
            F.coalesce(F.col("n_common"), z) * 10000
            / F.greatest(F.coalesce(F.col("n_grams"), z), F.lit(1))
        ).cast("long").alias("boilerplate_bp"),
    )


def span_dedup(
    df: DataFrame,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 4,
    hash_fn: str = "fast",
) -> DataFrame:
    """C4-style duplicated-span removal (Raffel et al. 2020 §2.2: "we
    removed any duplicated spans, keeping one occurrence"): split each
    document into lines, and for every line long enough to be a real
    span (≥ ``min_words`` words), keep only its GLOBAL first occurrence
    — ordered by (doc_id, position) — deleting every later copy
    corpus-wide. Short lines (headings, list bullets, blanks) are never
    deduped: collapsing every empty line in the corpus onto one winner
    would shred unrelated documents.

    Returns (doc_id, text) with the surviving lines rejoined in original
    order, plus n_lines/n_removed audit columns.

    Scale shape — ONE text scan, ONE window shuffle, ONE aggregate:
    posexplode lines, then rank first occurrences with a single window
    whose partition key is (eligible, line_hash, doc_id', pos'): for
    dedup-eligible spans the key is the line hash (global grouping);
    for short lines it is the line's own (doc_id, pos) — a singleton
    partition whose row_number is trivially 1, so short lines ride the
    same window instead of forcing a filter/union/extra-scan plan. The
    doc rebuild and the audit counts come from one hash-aggregate on
    doc_id: ``collect_list`` skips NULLs, so ``when(rn = 1,
    struct(pos, line))`` collects survivors while count(*) still sees
    every line. Deterministic under any partitioning: rank order is
    (doc_id, pos), never task order.

    ``hash_fn``: "fast" = xxhash64; "portable" = sha256-based 60-bit
    (board/oracle family, replayable in DuckDB).
    """
    hash_one = _portable_hash60 if hash_fn == "portable" else F.xxhash64
    lines = df.select(
        F.col(doc_id_col).alias("doc_id"),
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), r"\n")).alias(
            "pos", "line"
        ),
    )
    n_words = F.size(F.filter(F.split(F.col("line"), r"\s+"), lambda t: t != ""))
    keyed = lines.select(
        "doc_id",
        "pos",
        "line",
        (n_words >= min_words).alias("eligible"),
        F.when(n_words >= min_words, hash_one(F.col("line")))
        .otherwise(F.lit(0)).alias("line_h"),
        F.when(n_words >= min_words, F.lit("")).otherwise(
            F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("pos"))
        ).alias("self_key"),
    )
    w = Window.partitionBy("eligible", "line_h", "self_key").orderBy(
        F.col("doc_id").asc(), F.col("pos").asc()
    )
    ranked = keyed.withColumn("rn", F.row_number().over(w))
    z = F.lit(0).cast("long")
    return ranked.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("rn") == 1, F.struct("pos", "line"))
                    )
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("text"),
        F.count("*").cast("long").alias("n_lines"),
        F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).cast("long").alias("n_removed"),
    ).select(
        "doc_id", "text", "n_lines", F.coalesce(F.col("n_removed"), z).alias("n_removed")
    )


def uniform_ppm_col(key_col: Column, seed: str) -> Column:
    """Deterministic uniform draw in [0, 1e6): portable sha256 hash of
    ``key || ':' || seed`` reduced mod 1e6. A pure function of (key,
    seed) — independent of partitioning, task order, and cluster size,
    unlike ``rand()`` which is seeded PER PARTITION and silently
    reshuffles the sample when parallelism changes."""
    return F.pmod(
        _portable_hash60(F.concat(key_col.cast("string"), F.lit(":" + seed))),
        F.lit(SAMPLE_MOD),
    ).cast("long")


def stratum_rate_ppm_col(
    stratum_col: Column, rates_ppm: dict[str, int], default_ppm: int = 0
) -> Column:
    """Per-stratum sampling rate (parts-per-million) as a when-chain —
    strata sets (languages, source buckets) are small, so this stays a
    codegen'd scalar expression rather than a join."""
    expr = F.lit(default_ppm)
    for stratum, ppm in sorted(rates_ppm.items()):
        expr = F.when(stratum_col == stratum, F.lit(ppm)).otherwise(expr)
    return expr.cast("long")


def mixture_sample(
    df: DataFrame,
    rates_ppm: dict[str, int],
    doc_id_col: str = "doc_id",
    stratum_col: str = "lang",
    domain_col: str = "source",
    default_ppm: int = 0,
    domain_cap: int | None = None,
    seed: str = "mix-v1",
) -> DataFrame:
    """Deterministic training-mixture sampling: per-stratum keep rates
    (DoReMi/Pile-style mixture weights) plus an optional per-domain
    document cap (RefinedWeb-style anti-domination guard).

    A document is kept iff its deterministic uniform draw u (a pure
    function of doc_id and seed) falls under its stratum's rate; among
    kept documents, each domain retains only its ``domain_cap``
    lowest-u documents (ties broken by doc_id) — a deterministic
    reservoir, stable under re-runs and re-partitioning.

    Returns kept rows: doc_id, stratum, domain, u, domain_rank.

    Scale shape: the rate gate is a map-only filter (scan-cost pass over
    100 TB, zero shuffles). The cap is one window over domain — a single
    hash-partition + per-domain top-k sort; domains are numerous and the
    filter has already cut the row mass by the sample rate. For a
    pathological mega-domain, the window input is at most that domain's
    kept-document count; cap-first-then-rank semantics would need the
    same shuffle anyway.
    """
    u = uniform_ppm_col(F.col(doc_id_col), seed)
    rate = stratum_rate_ppm_col(F.col(stratum_col), rates_ppm, default_ppm)
    kept = (
        df.select(
            F.col(doc_id_col).alias("doc_id"),
            F.col(stratum_col).alias("stratum"),
            F.col(domain_col).alias("domain"),
            u.alias("u"),
            rate.alias("rate_ppm"),
        )
        .where(F.col("u") < F.col("rate_ppm"))
    )
    w = Window.partitionBy("domain").orderBy(F.col("u").asc(), F.col("doc_id").asc())
    ranked = kept.select(
        "doc_id", "stratum", "domain", "u",
        F.row_number().over(w).cast("long").alias("domain_rank"),
    )
    if domain_cap is not None:
        ranked = ranked.where(F.col("domain_rank") <= domain_cap)
    return ranked


def contamination_scores(
    docs: DataFrame,
    eval_docs: DataFrame,
    *,
    n: int = 3,
    min_hits: int = 1,
    hash_fn: str = "fast",
) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing word n-grams
    with an evaluation set (GPT-3 appendix C / PaLM / Llama style).

    ``eval_docs`` is the benchmark suite (doc_id, text) — in practice a
    few MB against a 100 TB corpus, so its distinct gram-hash set is
    BROADCAST and the whole check is a map-side join: one linear scan of
    the corpus, zero shuffles on the big side (the final per-doc agg is
    map-side-combined on doc_id, which parquet row-groups already
    cluster). Grams dedup per doc array-side (hashed longs, same
    convention as boilerplate_scores); matching is on the 60-bit hash.

    ``hash_fn``: "fast" = xxhash64 (production), "portable" = sha256
    60-bit (oracle-replayable). → (doc_id, n_grams, n_contaminated,
    contaminated) with n_grams = distinct grams in the doc,
    n_contaminated = distinct grams also in the eval set, contaminated =
    n_contaminated ≥ min_hits.
    """
    hash_one = _portable_hash60 if hash_fn == "portable" else F.xxhash64
    gr = lambda c: F.array_distinct(ngrams_col(_tokens(c), n))  # noqa: E731
    ev = (
        eval_docs.select(F.explode(gr(F.col("text"))).alias("gram"))
        .select(hash_one(F.col("gram")).alias("g"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    ex = (
        docs.select("doc_id", gr(F.col("text")).alias("_grams"))
        .select(
            "doc_id",
            F.size("_grams").alias("n_grams"),
            F.explode_outer("_grams").alias("gram"),
        )
        .withColumn("g", hash_one(F.col("gram")))
    )
    return (
        ex.join(F.broadcast(ev), "g", "left")
        .groupBy("doc_id", "n_grams")
        .agg(
            F.count_distinct(
                F.when(F.col("_hit").isNotNull(), F.col("g"))
            ).alias("n_contaminated")
        )
        .select(
            "doc_id",
            F.col("n_grams").cast("long").alias("n_grams"),
            F.col("n_contaminated").cast("long").alias("n_contaminated"),
            (F.col("n_contaminated") >= min_hits).alias("contaminated"),
        )
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float] | None = None,
    *,
    seed: str = "split",
    resolution: int = 10_000,
) -> DataFrame:
    """Append a deterministic ``split`` column (train/val/test/...) from
    integer thresholds over a portable hash of the key.

    The first thing a training run does with a curated corpus is carve
    held-out sets — and doing it by RNG makes the split unreproducible
    and cluster-size-dependent, while doing it by range leaks temporal
    or lexicographic structure.  The portable sha256 bucket
    (``h(key:seed) % resolution`` vs cumulative INTEGER thresholds)
    gives bit-identical membership on any engine and any rerun, and a
    document NEVER migrates between splits when the corpus grows — the
    property that prevents eval contamination across dataset versions.

    Fractions are converted to integer bucket counts with
    floor-cumulative rounding (last split takes the remainder), so the
    thresholds themselves are exact. Map-only, zero shuffles.
    """
    splits = dict(splits) if splits else {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1.0, got {total}")
    names = list(splits)
    bounds = []
    acc = 0
    for i, name in enumerate(names):
        acc = resolution if i == len(names) - 1 else acc + int(
            splits[name] * resolution
        )
        bounds.append((name, acc))
    from graphrag_rs_spark.operators.linkpred import _h60

    bucket = _h60(
        F.concat_ws(chr(31), F.col(key_col).cast("string"), F.lit(seed))
    ) % resolution
    expr = None
    for name, hi in bounds:
        cond = bucket < F.lit(hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr)


def corpus_top_ngrams(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 20,
) -> DataFrame:
    """WIMBD-style corpus analytics (Elazar et al., "What's In My Big
    Data?", ICLR 2024): the k most frequent word n-grams with occurrence
    count and document frequency. → (gram, cnt, doc_freq), ties broken
    by gram ascending so the cut is deterministic.

    Spark shape: explode → two-level partial aggregation — first
    (gram, doc) to get per-doc counts (map-side combine soaks repeats
    inside a document, the common case for boilerplate grams), then
    (gram) summing counts and counting docs. The final top-k is a
    TakeOrdered over the gram-distinct frame, never a global sort of
    the corpus. At 100 TB both shuffles carry gram-distinct rows only.
    """
    toks = _tokens(F.col(text_col))
    per_doc = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(ngrams_col(toks, n)).alias("gram"))
        .groupBy("gram", "doc_id")
        .agg(F.count("*").alias("c"))
    )
    return (
        per_doc.groupBy("gram")
        .agg(
            F.sum("c").alias("cnt"),
            F.count("*").alias("doc_freq"),
        )
        .orderBy(F.desc("cnt"), F.asc("gram"))
        .limit(k)
    )


def ngram_duplication(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Corpus n-gram duplication summary (the WIMBD duplication metric):
    one row — (n, total_occurrences, distinct_grams, dup_occurrences,
    dup_rate_bp) where dup_occurrences counts occurrences of grams seen
    more than once and dup_rate_bp is that share in integer basis
    points (exact integer floor-division — no float in the reduction).

    Spark shape: explode → groupBy(gram) partial agg → a single 1-row
    reduce over the gram-distinct frame. Nothing in the plan scales
    with corpus size except the first map-side combine.
    """
    toks = _tokens(F.col(text_col))
    per_gram = (
        docs.select(F.explode(ngrams_col(toks, n)).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("c"))
    )
    return per_gram.agg(
        F.lit(n).cast("int").alias("n"),
        F.coalesce(F.sum("c"), F.lit(0)).alias("total_occurrences"),
        F.count("*").alias("distinct_grams"),
        F.coalesce(
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))),
            F.lit(0),
        ).alias("dup_occurrences"),
    ).select(
        "n",
        "total_occurrences",
        "distinct_grams",
        "dup_occurrences",
        # `div` = exact integer division (float `/` + cast can round up
        # across an integer boundary and diverge from the oracle's `//`)
        F.expr(
            "(dup_occurrences * 10000) div greatest(total_occurrences, 1)"
        ).alias("dup_rate_bp"),
    )


def ngram_novelty(
    docs: DataFrame,
    *,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-order n-gram novelty (WIMBD-family analysis) →
    (doc_id, n_grams, n_novel, novel_ppm): for each doc, how many of
    its DISTINCT n-grams appear for the first time in the corpus when
    docs are consumed in id order (first_doc(gram) == this doc).
    Falling novelty over a crawl is the classic saturation signal for
    stopping collection; per-source novelty ranks sources by marginal
    value.

    Shape: one explode of per-doc distinct grams, one window-min over
    the gram for first_doc, one per-doc count — two shuffles, ONE scan
    of the corpus. (The previous groupBy-gram + join-back formulation
    evaluated the tokenize/explode subtree twice per action — no
    reusable Exchange between the two branches — and its join side
    already gathered every posting of a gram into one partition, so the
    window has the identical skew profile with one scan fewer.)
    """
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != ""
    )
    grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(ngrams_col(toks, n)).alias("grams"),
    ).select("doc_id", F.explode("grams").alias("g"))
    wg = Window.partitionBy("g")
    per_doc = (
        grams.withColumn("first_doc", F.min("doc_id").over(wg))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_grams",
        "n_novel",
        F.floor(F.col("n_novel") * 1000000 / F.col("n_grams"))
        .cast("long")
        .alias("novel_ppm"),
    )


def unimax_sample(
    df: DataFrame,
    *,
    budget: int,
    max_epochs: int = 1,
    doc_id_col: str = "doc_id",
    stratum_col: str = "lang",
    seed: str = "unimax-v1",
) -> DataFrame:
    """UniMax language-balanced sampling (Chung et al. 2023, "UniMax:
    Fairer and More Effective Language Sampling for Large-Scale
    Multilingual Pretraining") → kept rows (doc_id, stratum, u,
    stratum_rank, quota).

    The UniMax allocation: visit strata SMALLEST FIRST; each stratum i
    (of L, 1-based) receives quota_i = min(n_i · max_epochs,
    floor(remaining / (L − i + 1))) and the remainder carries forward —
    small languages get up to ``max_epochs`` passes over their corpus,
    never more (the over-sampling cap that temperature sampling lacks),
    and the budget freed by capped strata flows to the bigger ones.
    Ties in stratum size break lexicographically — the allocation is a
    pure function of the census.

    Within a stratum the quota picks the ``quota_i`` lowest
    deterministic draws (sha256 of doc_id — re-run/partitioning
    stable, same family as :func:`mixture_sample`), doc_id ascending
    on draw ties.

    Scale shape: the census is one partial-agg groupBy (L rows — model
    state, like the k-means centroids); the allocation loop is
    driver-side over L languages; selection is one window per stratum.
    No shuffle touches the full corpus except the final rank window.
    """
    census = sorted(
        (
            (r["n"], str(r["s"]))
            for r in df.groupBy(F.col(stratum_col).alias("s"))
            .agg(F.count("*").alias("n"))
            .collect()
        ),
    )
    quotas: dict[str, int] = {}
    remaining = budget
    for i, (n, stratum) in enumerate(census):
        share = remaining // (len(census) - i)
        quotas[stratum] = min(n * max_epochs, share)
        remaining -= quotas[stratum]

    u = uniform_ppm_col(F.col(doc_id_col), seed)
    quota = stratum_rate_ppm_col(F.col(stratum_col), quotas)
    w = Window.partitionBy(stratum_col).orderBy(
        F.col("u").asc(), F.col("doc_id").asc()
    )
    return (
        df.select(
            F.col(doc_id_col).alias("doc_id"),
            F.col(stratum_col).alias("stratum"),
            u.alias("u"),
            quota.alias("quota"),
        )
        .withColumn(
            "stratum_rank",
            F.row_number().over(
                Window.partitionBy("stratum").orderBy(
                    F.col("u").asc(), F.col("doc_id").asc()
                )
            ).cast("long"),
        )
        .where(F.col("stratum_rank") <= F.col("quota"))
        .select("doc_id", "stratum", "u", "stratum_rank", "quota")
    )
