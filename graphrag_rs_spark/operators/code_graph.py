"""Code dependency graph: imports / symbol defs / file- and repo-level edges.

The north-star input is an Iceberg table of source-code repositories
``(repo, path, commit, lang, content)``.  Beyond prose entities, the KG a
user actually wants over such a corpus is the *code* graph: which file
imports which module, which symbols a file defines, and the file→file /
repo→repo dependency edges those induce.  The reference chunks code at
item boundaries (graphrag-core/src/text/chunking_strategies.rs:145-255,
same boundary set as operators/code_chunking.py); this module adds the
graph-construction layer over those items.

Everything here is pure DataFrame algebra — ``regexp_extract_all`` per
language (JVM codegen, no Python), ``explode``, one equi-join on module
name, hash aggregation:

- imports/defs extraction is a map-only pass: linear scan of content,
  predicate/column pruning reaches the parquet scan, no shuffle at all.
- ``dependency_edges`` is ONE shuffle join keyed on module name.  At
  10^12-file scale the skew risk is a popular module name ("utils",
  "config") becoming a mega-key; AQE skew-split handles the moderate
  case, and ``max_fanin`` provides an explicit cap that converts a
  pathological key into bounded star-links (same guard pattern as the
  MinHash band-bucket cap in dedup.py).
- the repo rollup is a partial-aggregated groupBy of the edge list.

Language coverage mirrors code_chunking's boundary table: python, rust,
go, javascript/typescript.  Unknown langs yield no imports/defs (not an
error) — the corpus scan stays single-pass over mixed languages.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# per-language (pattern, group) lists. Patterns are shared verbatim with
# the DuckDB oracles, so they stay in the RE2 ∩ java.util.regex dialect:
# no lookbehind, no backrefs, ASCII classes only.
IMPORT_PATTERNS: dict[str, list[str]] = {
    "python": [
        r"(?m)^import[ \t]+([A-Za-z_][A-Za-z0-9_]*)",
        r"(?m)^from[ \t]+([A-Za-z_][A-Za-z0-9_]*)[ \t]+import\b",
    ],
    "rust": [
        r"(?m)^use[ \t]+(?:crate|super|self)::([A-Za-z_][A-Za-z0-9_]*)",
        r"(?m)^(?:pub[ \t]+)?mod[ \t]+([A-Za-z_][A-Za-z0-9_]*)[ \t]*;",
    ],
    "go": [
        r"(?m)^[ \t]*import[ \t]+\"([^\"]+)\"",
        r"(?m)^[ \t]+_?[ \t]*\"([^\"]+)\"",  # inside import ( ... ) blocks
    ],
    "javascript": [
        r"(?m)^import[ \t]+[^;\n]*?from[ \t]+['\"]([^'\"]+)['\"]",
        r"(?m)^import[ \t]+['\"]([^'\"]+)['\"]",
        r"require\(['\"]([^'\"]+)['\"]\)",
    ],
}
IMPORT_PATTERNS["typescript"] = IMPORT_PATTERNS["javascript"]

# (kind, pattern) — group 1 is always the symbol name
DEF_PATTERNS: dict[str, list[tuple[str, str]]] = {
    "python": [
        ("function", r"(?m)^(?:async[ \t]+)?def[ \t]+([A-Za-z_][A-Za-z0-9_]*)"),
        ("class", r"(?m)^class[ \t]+([A-Za-z_][A-Za-z0-9_]*)"),
    ],
    "rust": [
        (
            "function",
            r"(?m)^(?:pub(?:\([^)]*\))?[ \t]+)?(?:async[ \t]+)?(?:unsafe[ \t]+)?"
            r"fn[ \t]+([A-Za-z_][A-Za-z0-9_]*)",
        ),
        ("struct", r"(?m)^(?:pub(?:\([^)]*\))?[ \t]+)?struct[ \t]+([A-Za-z_][A-Za-z0-9_]*)"),
        ("enum", r"(?m)^(?:pub(?:\([^)]*\))?[ \t]+)?enum[ \t]+([A-Za-z_][A-Za-z0-9_]*)"),
        ("trait", r"(?m)^(?:pub(?:\([^)]*\))?[ \t]+)?trait[ \t]+([A-Za-z_][A-Za-z0-9_]*)"),
    ],
    "go": [
        ("function", r"(?m)^func[ \t]+(?:\([^)]*\)[ \t]+)?([A-Za-z_][A-Za-z0-9_]*)"),
        ("type", r"(?m)^type[ \t]+([A-Za-z_][A-Za-z0-9_]*)"),
    ],
    "javascript": [
        ("function", r"(?m)^(?:export[ \t]+)?(?:default[ \t]+)?(?:async[ \t]+)?"
                     r"function[ \t]+([A-Za-z_$][A-Za-z0-9_$]*)"),
        ("class", r"(?m)^(?:export[ \t]+)?(?:default[ \t]+)?class[ \t]+"
                  r"([A-Za-z_$][A-Za-z0-9_$]*)"),
    ],
}
DEF_PATTERNS["typescript"] = DEF_PATTERNS["javascript"]


# call sites: identifier directly followed by '(' — the regex-level
# approximation of a call expression (tree-sitter-exact call graphs need
# the C4 plug-point; this is the corpus-scale heuristic). Definition sites
# also match the pattern, so extract_calls subtracts the file's OWN defs
# (array_except) — which also drops recursive self-calls, documented.
CALL_PATTERN = r"([A-Za-z_][A-Za-z0-9_$]*)[ \t]*\("

# syntactic keywords that precede '(' without being calls
CALL_KEYWORDS: dict[str, list[str]] = {
    "python": ["if", "elif", "while", "for", "with", "return", "yield",
               "assert", "lambda", "del", "raise", "except", "not", "and",
               "or", "in", "is"],
    "rust": ["if", "while", "for", "match", "loop", "return", "unsafe",
             "move", "in"],
    "go": ["if", "for", "switch", "select", "go", "defer", "return",
           "range", "func"],
    "javascript": ["if", "while", "for", "switch", "catch", "function",
                   "return", "typeof", "await", "in", "of", "new"],
}
CALL_KEYWORDS["typescript"] = CALL_KEYWORDS["javascript"]


def _lang_dispatch(per_lang: dict[str, Column], default: Column) -> Column:
    """CASE WHEN lang = ... chain — one codegen'd expression, no UDF."""
    expr = None
    for lang, col in per_lang.items():
        cond = F.col("lang") == F.lit(lang)
        expr = F.when(cond, col) if expr is None else expr.when(cond, col)
    return expr.otherwise(default) if expr is not None else default


def module_stem(path_col: Column) -> Column:
    """``src/a/mod_7.py`` → ``mod_7`` — the name an import resolves to."""
    return F.regexp_extract(path_col, r"([^/]+)\.[A-Za-z0-9]+$", 1)


def _imports_arr() -> Column:
    """Per-file distinct imported-module array (lang-dispatched regexes)."""
    per_lang = {
        lang: F.array_distinct(
            F.concat(*[
                F.regexp_extract_all(F.col("content"), F.lit(p), F.lit(1))
                for p in pats
            ])
        )
        for lang, pats in IMPORT_PATTERNS.items()
    }
    return _lang_dispatch(per_lang, F.array().cast("array<string>"))


def extract_imports(files: DataFrame) -> DataFrame:
    """(repo, path, lang, content) → one row per distinct imported module.

    Map-only: per-lang ``regexp_extract_all`` concatenated, dedup'd with
    ``array_distinct`` (a file importing the same module twice is one
    edge), exploded. Unknown langs produce zero rows.
    """
    return (
        files.select("repo", "path", "lang", _imports_arr().alias("_imports"))
        .select("repo", "path", "lang", F.explode("_imports").alias("imported"))
    )


def _defs_arr() -> Column:
    """Per-file distinct (kind, symbol) struct array (lang-dispatched)."""
    def _tag(kind):
        # single-arg lambda on purpose: a 2-arg lambda would make
        # F.transform pass the array INDEX as the second argument
        return lambda s: F.struct(F.lit(kind).alias("kind"), s.alias("symbol"))

    per_lang = {}
    for lang, pats in DEF_PATTERNS.items():
        parts = [
            F.transform(
                F.regexp_extract_all(F.col("content"), F.lit(p), F.lit(1)),
                _tag(kind),
            )
            for kind, p in pats
        ]
        per_lang[lang] = F.array_distinct(F.concat(*parts))
    empty = F.array().cast("array<struct<kind:string,symbol:string>>")
    return _lang_dispatch(per_lang, empty)


def extract_defs(files: DataFrame) -> DataFrame:
    """(repo, path, lang, content) → one row per defined symbol.

    Each (kind, pattern) contributes ``transform(extract_all, s ->
    struct(kind, s))``; kinds are concatenated and exploded in the same
    map-only pass.  Duplicate (kind, symbol) pairs within a file collapse
    (re-defs / overloads are one node).
    """
    return (
        files.select("repo", "path", "lang", _defs_arr().alias("_defs"))
        .select("repo", "path", "lang", F.explode("_defs").alias("_d"))
        .select(
            "repo", "path", "lang",
            F.col("_d.kind").alias("kind"), F.col("_d.symbol").alias("symbol"),
        )
    )


def _calls_raw_arr() -> Column:
    """Per-file distinct called-symbol array, language keywords removed
    (own defined symbols NOT yet subtracted)."""
    raw = F.array_distinct(
        F.regexp_extract_all(F.col("content"), F.lit(CALL_PATTERN), F.lit(1))
    )
    per_lang = {
        lang: F.array_except(raw, F.array(*[F.lit(k) for k in kws]))
        for lang, kws in CALL_KEYWORDS.items()
    }
    return _lang_dispatch(per_lang, F.array().cast("array<string>"))


def extract_calls(files: DataFrame) -> DataFrame:
    """(repo, path, lang, content) → one row per distinct called symbol.

    Map-only like extract_imports: ``regexp_extract_all(CALL_PATTERN)``,
    minus the language's keywords, minus the file's own defined symbols
    (def/fn sites match the call pattern too — subtracting own defs drops
    them AND recursive/intra-file calls, which call_edges would discard
    anyway). Unknown langs yield zero rows.
    """
    arr = _calls_raw_arr()
    own_defs = extract_defs(files).groupBy("repo", "path").agg(
        F.collect_set("symbol").alias("_own")
    )
    return (
        files.select("repo", "path", "lang", arr.alias("_calls"))
        .join(own_defs, ["repo", "path"], "left")
        .select(
            "repo", "path", "lang",
            F.explode(
                F.array_except(
                    "_calls", F.coalesce("_own", F.array().cast("array<string>"))
                )
            ).alias("called"),
        )
    )


def call_edges(
    files: DataFrame,
    calls: DataFrame | None = None,
    defs: DataFrame | None = None,
    max_fanout: int | None = None,
) -> DataFrame:
    """File→file CALLS edges: called symbol == a *function* def in another
    file of the SAME repo (cross-repo reuse goes through imports — that's
    dependency_edges' job; scoping resolution to the repo keeps the join
    key (repo, symbol) instead of the skew-prone bare symbol).

    One shuffle join.  Unresolved calls (stdlib, vendored, cross-repo)
    drop out of the inner join; same-file hits are excluded.  ``max_fanout``
    keeps only the first N defining files per (repo, symbol) — the guard
    for a repo that defines the same popular name in hundreds of files.
    """
    if calls is None:
        calls = extract_calls(files)
    if defs is None:
        defs = extract_defs(files)
    providers = defs.where(F.col("kind") == "function").select(
        "repo", F.col("path").alias("dst_path"), F.col("symbol").alias("called")
    )
    if max_fanout is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("repo", "called").orderBy("dst_path")
        providers = (
            providers.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= max_fanout)
            .drop("_rn")
        )
    return (
        calls.join(providers, ["repo", "called"])
        .where(F.col("path") != F.col("dst_path"))
        .select(
            "repo",
            F.col("path").alias("src_path"),
            F.lit("CALLS").alias("pred"),
            "dst_path",
            F.col("called").alias("symbol"),
        )
    )


def dependency_edges(
    files: DataFrame,
    imports: DataFrame | None = None,
    max_fanin: int | None = None,
) -> DataFrame:
    """File→file DEPENDS_ON edges: import name == target module stem.

    One shuffle join on module name.  Self-loops (a file whose stem
    matches its own import) are dropped; dangling imports (no file with
    that stem in the corpus) drop out of the inner join — both exactly
    the semantics a resolver would give.  ``max_fanin`` optionally keeps
    only the first N providers per module name (ordered by repo, path —
    deterministic) to bound a pathological shared-stem key at scale.
    """
    if imports is None:
        imports = extract_imports(files)
    providers = files.select(
        F.col("repo").alias("dst_repo"),
        F.col("path").alias("dst_path"),
        module_stem(F.col("path")).alias("_module"),
    )
    if max_fanin is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("_module").orderBy("dst_repo", "dst_path")
        providers = (
            providers.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= max_fanin)
            .drop("_rn")
        )
    return (
        imports.withColumnRenamed("imported", "_module")
        .join(providers, "_module")
        .where(
            (F.col("repo") != F.col("dst_repo"))
            | (F.col("path") != F.col("dst_path"))
        )
        .select(
            F.col("repo").alias("src_repo"),
            F.col("path").alias("src_path"),
            F.lit("DEPENDS_ON").alias("pred"),
            "dst_repo",
            "dst_path",
            F.col("_module").alias("module"),
        )
    )


def repo_rollup(edges: DataFrame) -> DataFrame:
    """Repo→repo dependency rollup: edge count, distinct importing files,
    distinct modules crossed. Partial-aggregated groupBy — one shuffle."""
    return edges.groupBy("src_repo", "dst_repo").agg(
        F.count("*").alias("n_edges"),
        F.countDistinct("src_path").alias("n_src_files"),
        F.countDistinct("module").alias("n_modules"),
    )


def fan_metrics(edges: DataFrame) -> DataFrame:
    """Per-file coupling metrics over the dependency graph →
    (repo, path, fan_in, fan_out, instability_pm).

    fan_out (Ce, efferent coupling) = distinct files this file depends
    on; fan_in (Ca, afferent) = distinct files depending on it;
    instability I = Ce/(Ca+Ce) (Martin 1994, "OO Design Quality
    Metrics") reported as ``floor(1000·Ce/(Ca+Ce))`` per-mille — exact
    integer arithmetic. I→1000 marks leaf glue code (easy to change,
    nothing depends on it), I→0 marks load-bearing core modules; the
    stable-abstractions audit every large refactor starts from.

    Scale shape: the (src,dst) file-pair frame is deduped once, then
    TWO partial-agg groupBys (one per direction) and a full outer merge
    on the file key — ids only, no content, no window.
    """
    pairs = edges.select(
        F.concat_ws("@", "src_repo", "src_path").alias("src"),
        F.concat_ws("@", "dst_repo", "dst_path").alias("dst"),
    ).distinct()
    ce = pairs.groupBy(F.col("src").alias("file")).agg(
        F.count("*").alias("fan_out")
    )
    ca = pairs.groupBy(F.col("dst").alias("file")).agg(
        F.count("*").alias("fan_in")
    )
    merged = ce.join(ca, "file", "full_outer").select(
        "file",
        F.coalesce("fan_in", F.lit(0)).alias("fan_in"),
        F.coalesce("fan_out", F.lit(0)).alias("fan_out"),
    )
    return merged.select(
        F.substring_index("file", "@", 1).alias("repo"),
        F.substring_index("file", "@", -1).alias("path"),
        "fan_in",
        "fan_out",
        F.floor(
            1000 * F.col("fan_out") / (F.col("fan_in") + F.col("fan_out"))
        ).cast("long").alias("instability_pm"),
    )


def code_triples(files: DataFrame) -> DataFrame:
    """Unified triple view of the code graph, in the engine's
    (subj, pred, obj) shape: file IMPORTS module, file DEFINES symbol,
    file DEPENDS_ON file.  Subjects/objects are ``repo/path`` ids, so
    these triples union cleanly with the prose-entity triples.

    ONE fused content scan: the four union branches previously each
    re-ran their regex extraction over ``content`` (imports twice, defs
    three times counting call resolution — six regex passes per action).
    Here imports/defs/raw-calls are extracted as arrays in a single
    projection, materialized as a narrow per-file frame (ids + symbol
    arrays — tiny next to the content it summarizes, so scale-safe), and
    every branch reads that. Own-def subtraction for calls becomes an
    in-row array_except instead of a collect_set self-join. Output rows
    are identical to the unfused per-operator pipelines."""
    fid = lambda r, p: F.concat_ws("/", F.col(r), F.col(p))  # noqa: E731
    ext = files.select(
        "repo", "path", "lang",
        _imports_arr().alias("_imports"),
        _defs_arr().alias("_defs"),
        _calls_raw_arr().alias("_callsraw"),
    ).localCheckpoint(eager=True)

    imp_rows = ext.select(
        "repo", "path", "lang", F.explode("_imports").alias("imported")
    )
    def_rows = ext.select(
        "repo", "path", "lang", F.explode("_defs").alias("_d")
    ).select(
        "repo", "path", "lang",
        F.col("_d.kind").alias("kind"), F.col("_d.symbol").alias("symbol"),
    )
    call_rows = ext.select(
        "repo", "path", "lang",
        F.explode(
            F.array_except(
                "_callsraw", F.transform("_defs", lambda d: d["symbol"])
            )
        ).alias("called"),
    )

    imp = imp_rows.select(
        fid("repo", "path").alias("subj"),
        F.lit("IMPORTS").alias("pred"),
        F.col("imported").alias("obj"),
    )
    dfs = def_rows.select(
        fid("repo", "path").alias("subj"),
        F.lit("DEFINES").alias("pred"),
        F.concat_ws(":", "kind", "symbol").alias("obj"),
    )
    dep = dependency_edges(ext, imports=imp_rows).select(
        fid("src_repo", "src_path").alias("subj"),
        F.col("pred"),
        fid("dst_repo", "dst_path").alias("obj"),
    )
    cal = call_edges(ext, calls=call_rows, defs=def_rows).select(
        fid("repo", "src_path").alias("subj"),
        F.col("pred"),
        fid("repo", "dst_path").alias("obj"),
    )
    return imp.unionByName(dfs).unionByName(dep).unionByName(cal)


def external_api_usage(files: DataFrame, imports: DataFrame | None = None) -> DataFrame:
    """Third-party dependency census: imported modules that resolve to NO
    file in the corpus, ranked by usage → (lang, module, n_files, n_repos).

    This is the table every corpus-curation run wants first: which
    external libraries the code actually depends on (requests, serde,
    lodash, ...), how widely, and in which language — the package-level
    complement of ``dependency_edges`` (which keeps only *resolved*
    imports; this keeps exactly the ones that dangle).

    Scale shape: the stem side is projected to the bare module-stem
    column and de-dup'd BEFORE the join, so the anti-join ships ids-only
    rows; both sides shuffle on the module name (same bounded-width key
    and skew profile as ``dependency_edges`` — AQE skew-split covers hot
    names).  The final groupBy is a partial-aggregated count on
    (lang, module).  Nothing in the plan touches ``content`` after the
    map-only import extraction.
    """
    if imports is None:
        imports = extract_imports(files)
    stems = (
        files.select(module_stem(F.col("path")).alias("_module"))
        .where(F.col("_module") != "")
        .distinct()
    )
    ext = imports.withColumnRenamed("imported", "_module").join(
        stems, "_module", "left_anti"
    )
    return ext.groupBy("lang", F.col("_module").alias("module")).agg(
        F.count("*").alias("n_files"),
        F.countDistinct("repo").alias("n_repos"),
    )


# test-file naming conventions: pytest/unittest "test_X.py", go/rust
# "X_test.go" — group 1 of whichever matches is the tested module stem.
TEST_PREFIX_PATTERN = r"(?:^|/)test_([A-Za-z_][A-Za-z0-9_]*)\.[A-Za-z0-9]+$"
TEST_SUFFIX_PATTERN = r"(?:^|/)([A-Za-z_][A-Za-z0-9_]*)_test\.[A-Za-z0-9]+$"


def test_link_edges(files: DataFrame) -> DataFrame:
    """Test→source TESTS edges by filename convention, repo-scoped:
    ``tests/test_parser.py`` → the repo's file whose stem is ``parser``
    (or ``parser_test.go`` style) → (repo, test_path, pred, src_path,
    module).

    Linking tests to the code they exercise is a first-class KG edge for
    a source corpus — it is how curation keeps test/impl pairs together
    (training on impl without its test loses the supervision signal) and
    how per-file quality scores can inherit "has a test" as a feature.

    Resolution is repo-scoped like ``call_edges`` (the join key is
    (repo, stem), never the bare skew-prone stem).  Test files
    themselves are excluded from the provider side, so test_x.py never
    links to x_test.go style siblings.  One shuffle join; both sides are
    map-only projections of ``path`` (content is never read — the plan
    prunes it at the scan).
    """
    tested = F.coalesce(
        F.nullif(F.regexp_extract(F.col("path"), TEST_PREFIX_PATTERN, 1), F.lit("")),
        F.nullif(F.regexp_extract(F.col("path"), TEST_SUFFIX_PATTERN, 1), F.lit("")),
    )
    with_stem = files.select("repo", "path", tested.alias("_tested"))
    tests = with_stem.where(F.col("_tested").isNotNull()).select(
        "repo", F.col("path").alias("test_path"), F.col("_tested").alias("_module")
    )
    providers = (
        with_stem.where(F.col("_tested").isNull())
        .select(
            "repo",
            F.col("path").alias("src_path"),
            module_stem(F.col("path")).alias("_module"),
        )
        .where(F.col("_module") != "")
    )
    return tests.join(providers, ["repo", "_module"]).select(
        "repo",
        "test_path",
        F.lit("TESTS").alias("pred"),
        "src_path",
        F.col("_module").alias("module"),
    )


def identifier_subtokens(defs: DataFrame, *, symbol_col: str = "symbol") -> DataFrame:
    """Corpus-level identifier-subtoken vocabulary → one row per subtoken:
    (subtoken, n_defs, n_files).

    Splits every defined symbol on snake_case AND camelCase boundaries
    (``getHTTPServer`` → get/http/server, ``parse_json`` → parse/json),
    lowercases, and aggregates corpus frequency.  This is the input
    table for code-tokenizer/BPE training and identifier-based code
    search — subtoken frequency over 10^12 files is how a vocab gets
    chosen.

    Map-only split/explode (two codegen ``regexp_replace`` passes insert
    the camel boundaries, then one split — no UDF) into a two-phase
    aggregation: the map side combines on (subtoken, file) before the
    first exchange, and the distinct-file rollup reshuffles only
    group-cardinality rows on the subtoken alone.  The key space is
    vocabulary-sized — Zipf head keys are exactly what map-side combine
    flattens.
    """
    parts = F.split(
        F.regexp_replace(
            F.regexp_replace(F.col(symbol_col), "([a-z0-9])([A-Z])", "$1_$2"),
            "([A-Z]+)([A-Z][a-z])",
            "$1_$2",
        ),
        "_+",
    )
    ex = (
        defs.select("repo", "path", F.explode(parts).alias("_t"))
        .where(F.col("_t") != "")
    )
    return ex.groupBy(F.lower(F.col("_t")).alias("subtoken")).agg(
        F.count("*").alias("n_defs"),
        F.countDistinct("repo", "path").alias("n_files"),
    )


def api_cooccurrence(
    files: DataFrame,
    *,
    imports: DataFrame | None = None,
    min_support: int = 2,
    max_basket_modules: int = 100_000,
) -> DataFrame:
    """Market-basket analysis over per-repo import sets: which external
    APIs are adopted TOGETHER? → one row per unordered module pair
    co-imported by ≥ min_support repos: (module_a, module_b, co_baskets,
    support_a, support_b, confidence_ppm, lift_ppm), all counts exact
    and the ratios in integer parts-per-million (no float anywhere, so
    results are bit-stable across engines and cluster sizes).

    lift > 1e6 ppm means the pair co-occurs more than independent
    adoption would predict — the classic association-rule signal for
    "these libraries form a stack" (agrawal-style a-priori, first pass
    only: the per-module ``min_support`` prefilter IS a-priori's
    downward-closure cut, applied before any pairing).

    Scale shape: baskets are repo-distinct module sets, so the pairing
    self-join is O(Σ basket²) — bounded by the support prefilter, and
    guarded: any basket still wider than ``max_basket_modules`` after
    the cut raises with guidance (raise min_support) instead of
    detonating a quadratic shuffle. Counts aggregate with map-side
    partial aggregation; the basket-count total rides a broadcast
    1-row frame.
    """
    imp = imports if imports is not None else extract_imports(files)
    basket = imp.select("repo", "imported").distinct()
    support = basket.groupBy("imported").agg(F.count("*").alias("sup"))
    frequent = support.where(F.col("sup") >= min_support)
    kept = basket.join(frequent, "imported")

    widths = kept.groupBy("repo").agg(F.count("*").alias("w")).where(
        F.col("w") > max_basket_modules
    )
    if widths.limit(1).count() > 0:
        raise ValueError(
            f"a basket exceeds max_basket_modules={max_basket_modules} "
            "after the support cut; raise min_support (a-priori's "
            "downward closure makes that sound) or the cap"
        )

    n_baskets = basket.select(
        F.count_distinct("repo").alias("n_baskets")
    )
    a = kept.select("repo", F.col("imported").alias("module_a"),
                    F.col("sup").alias("support_a"))
    b = kept.select("repo", F.col("imported").alias("module_b"),
                    F.col("sup").alias("support_b"))
    pairs = (
        a.join(b, "repo")
        .where(F.col("module_a") < F.col("module_b"))
        .groupBy("module_a", "module_b", "support_a", "support_b")
        .agg(F.count("*").alias("co_baskets"))
        .where(F.col("co_baskets") >= min_support)
        .crossJoin(F.broadcast(n_baskets))
    )
    return pairs.select(
        "module_a",
        "module_b",
        "co_baskets",
        "support_a",
        "support_b",
        F.expr("(co_baskets * 1000000) div support_a").alias(
            "confidence_ppm"
        ),
        F.expr(
            "(co_baskets * n_baskets * 1000000) div (support_a * support_b)"
        ).alias("lift_ppm"),
    )


def dead_exports(
    files: DataFrame,
    defs: DataFrame | None = None,
    calls: DataFrame | None = None,
) -> DataFrame:
    """Defined symbols never referenced by any call site in the corpus —
    the repo-scale dead-code sweep (tree-shaking candidates).

    Liveness here is corpus-wide and textual: a def survives if ANY other
    file (any repo, any language) has a call site with that name.  This is
    deliberately broader than ``call_edges``' repo-scoped resolution — a
    dead-export report must not flag a symbol that a vendored copy or a
    cross-repo script still names, so the reference set errs inclusive.
    Recursive self-calls do NOT keep a symbol alive (``extract_calls``
    subtracts the file's own defs), matching how exporters reason about
    public surface: "does anyone ELSE use this?".

    Shape at scale: ``calls`` distincts to the corpus call-vocabulary
    (bounded by distinct identifiers, far smaller than call sites after
    the per-file partial aggregation in ``array_distinct``) and the kill
    test is ONE left_anti shuffle join on ``symbol`` — no skew risk beyond
    the vocabulary's natural Zipf, which the anti-join tolerates (hot
    symbols just drop more def rows).
    """
    if defs is None:
        defs = extract_defs(files)
    if calls is None:
        calls = extract_calls(files)
    referenced = calls.select(F.col("called").alias("symbol")).distinct()
    return defs.join(referenced, "symbol", "left_anti").select(
        "repo", "path", "lang", "kind", "symbol"
    )


def api_diff(old_files: DataFrame, new_files: DataFrame) -> DataFrame:
    """Repo-level API diff between two corpus snapshots →
    (repo, kind, symbol, change), change ∈ {'removed', 'added'}.

    'removed' is the breaking direction: a symbol the old snapshot
    defined anywhere in the repo that no file of the new snapshot
    defines (file moves within a repo are NOT breaking — the key is
    (repo, kind, symbol), not the path).  Two def extractions + two
    anti-joins; symbol sets are tiny relative to content, so the
    shuffles move ids only.
    """
    old_api = (
        extract_defs(old_files).select("repo", "kind", "symbol").distinct()
    )
    new_api = (
        extract_defs(new_files).select("repo", "kind", "symbol").distinct()
    )
    removed = old_api.join(
        new_api, ["repo", "kind", "symbol"], "left_anti"
    ).withColumn("change", F.lit("removed"))
    added = new_api.join(
        old_api, ["repo", "kind", "symbol"], "left_anti"
    ).withColumn("change", F.lit("added"))
    return removed.unionByName(added)


def stale_tests(files: DataFrame, removed: DataFrame) -> DataFrame:
    """Tests whose linked source file is gone in the next snapshot →
    (repo, test_path, src_path, reason).

    ``files`` is the OLD snapshot (tests resolve against it via
    test_link_edges); ``removed`` is (repo, src_path) of files absent
    from the new snapshot.  A test that still names a vanished module
    is the highest-signal hygiene row a code KG can emit: it points at
    supervision (the test) that no longer exercises anything.  One
    repo-scoped equi-join on top of the TESTS edges — ids only.
    """
    edges = test_link_edges(files)
    return edges.join(
        removed.select("repo", "src_path").distinct(),
        ["repo", "src_path"],
    ).select(
        "repo",
        "test_path",
        "src_path",
        F.lit("target_removed").alias("reason"),
    )


# declaration/comment lines carry the import syntax itself plus prose —
# neither counts as *usage* of the imported binding
_DECL_OR_COMMENT = (
    r"(?m)^[ \t]*(?:import\b|from\b|use\b|(?:pub[ \t]+)?mod\b|#|//).*"
)
_IDENT_TOKEN = r"[A-Za-z_$][A-Za-z0-9_$]*"


def unused_imports(files: DataFrame) -> DataFrame:
    """(repo, path, lang, content) → imports never referenced in the body.

    Module-level textual liveness, the import-side twin of
    ``dead_exports``: an import is *used* iff its binding name appears as
    an identifier token anywhere in the file after stripping
    declaration and comment lines.  For path-style imports (go paths,
    js relative specifiers) the binding name is the trailing identifier
    run of the import string — the same approximation every
    lint-without-a-resolver makes.

    One map-only projection per file (import array + distinct body-token
    array computed side by side), one explode, one ``array_contains``
    filter — no join, no shuffle, scan stays single-pass at any corpus
    size.
    """
    per_lang = {
        lang: F.array_distinct(
            F.concat(*[
                F.regexp_extract_all(F.col("content"), F.lit(p), F.lit(1))
                for p in pats
            ])
        )
        for lang, pats in IMPORT_PATTERNS.items()
    }
    arr = _lang_dispatch(per_lang, F.array().cast("array<string>"))
    body = F.regexp_replace(F.col("content"), _DECL_OR_COMMENT, "")
    toks = F.array_distinct(
        F.regexp_extract_all(body, F.lit(_IDENT_TOKEN), F.lit(0))
    )
    return (
        files.select(
            "repo", "path", "lang",
            arr.alias("_imports"), toks.alias("_toks"),
        )
        .select(
            "repo", "path", "lang",
            F.explode("_imports").alias("imported"), "_toks",
        )
        .where(
            ~F.array_contains(
                "_toks",
                F.regexp_extract(
                    "imported", r"([A-Za-z_$][A-Za-z0-9_$]*)$", 1
                ),
            )
        )
        .select("repo", "path", "lang", "imported")
    )
