"""Deterministic synthetic corpora (FIXTURES.md §4; seed-stable, ASCII-only).

Generates the (repo, path, commit, lang, content) input table of the north
rule (BASELINE.json input_hint). Recipes mirror the reference's bench
generators (/root/reference/benches/graph_construction.rs:98-256) and test
fixtures so golden outputs are reproducible — but the generator itself is
original code (the reference's is Rust + uuid-based; ours derives every id
deterministically from (seed, row index)).
"""

from __future__ import annotations

import hashlib
import random

PEOPLE = [
    "Dr. John Smith", "Alice Johnson", "Prof. Robert Brown", "Ms. Sarah Wilson",
    "Mr. David Lee", "Dr. Emily Chen", "Prof. Michael Davis", "Jane Anderson",
]
ORGANIZATIONS = [
    "Microsoft Corporation", "Google Inc", "Stanford University", "Acme Corp",
    "Globex Company", "Initech LLC", "Wayne Technologies", "Stark Solutions",
]
LOCATIONS = [
    "Seattle, Washington", "New York", "Boston", "California",
    "London", "Paris", "Tokyo", "Berlin",
]
FILLER = (
    "research development innovation technology science collaboration project "
    "study analysis implementation algorithm system platform framework methodology"
).split()
REL_PHRASES = [
    "works for", "employed by", "founded", "born in", "lives in", "based in",
    "headquartered", "married", "colleague", "partner",
]
LANGS = ["text", "markdown", "rust"]


def _commit_for(repo: str, path: str) -> str:
    return hashlib.sha1(f"{repo}:{path}".encode()).hexdigest()


def make_text_content(
    rng: random.Random, n_sentences: int, entity_density: float = 1.0
) -> str:
    """Entity-rich English prose exercising E2-E4 and R1/R2.

    ``entity_density`` < 1 interleaves pure-filler sentences (realistic
    corpora run ~1-2 entities per chunk, not 8 — used by scaling runs)."""
    sentences = []
    for _ in range(n_sentences):
        if entity_density < 1.0 and rng.random() > entity_density:
            filler = " ".join(rng.choice(FILLER) for _ in range(rng.randrange(8, 16)))
            sentences.append(f"The {filler} continued without incident.")
            continue
        kind = rng.randrange(6)
        person = rng.choice(PEOPLE)
        org = rng.choice(ORGANIZATIONS)
        loc = rng.choice(LOCATIONS)
        phrase = rng.choice(REL_PHRASES)
        filler = " ".join(rng.choice(FILLER) for _ in range(rng.randrange(3, 9)))
        if kind == 0:
            s = f"{person} {phrase} {org} on the {filler} effort."
        elif kind == 1:
            s = f"{person} {phrase} {loc} while leading {filler}."
        elif kind == 2:
            s = f"{org} is {phrase} in {loc} near the {filler} campus."
        elif kind == 3:
            p2 = rng.choice(PEOPLE)
            s = f"{person} and {p2} are {phrase} on {filler}."
        elif kind == 4:
            s = f"The {filler} initiative at {org} expanded rapidly."
        else:
            s = f"Further {filler} confirmed the earlier results."
        sentences.append(s)
    return " ".join(sentences)


def make_markdown_content(
    rng: random.Random, n_sections: int, entity_density: float = 1.0
) -> str:
    parts = ["# Introduction", ""]
    parts.append(make_text_content(rng, 3, entity_density))
    for i in range(n_sections):
        parts += ["", f"## Section {i + 1}", ""]
        parts.append(make_text_content(rng, rng.randrange(2, 6), entity_density))
    return "\n".join(parts)


def make_rust_content(
    rng: random.Random, n_items: int, entity_density: float = 1.0
) -> str:
    """Deterministic Rust-source templates with entity names in doc comments."""
    items = []
    for i in range(n_items):
        if rng.random() < entity_density:
            person = rng.choice(PEOPLE)
            org = rng.choice(ORGANIZATIONS)
            doc = f"/// Module maintained by {person} at {org}.\n"
        else:
            doc = "/// Internal helper, no owner recorded.\n"
        items.append(
            doc
            + f"pub fn process_{i}(input: &str) -> usize {{\n"
            f"    input.split_whitespace().count() + {i}\n"
            f"}}\n\n"
            f"pub struct Record{i} {{\n    pub id: u64,\n    pub name: String,\n}}\n"
        )
    return "\n".join(items)


EDGE_CASES = [
    ("", "empty"),
    ("   \n\t  ", "whitespace_only"),
    ("Tiny.", "below_min_chunk"),
    ("Dr. Smith went to Boston. He met Prof. Brown there.", "abbreviations"),
    ("ACME Corp. announced a merger with Acme Corp today.", "dedup_variants"),
    ("New York and New York City hosted Jon Smith and Jhon Smith.", "near_dup_names"),
    ("Alice Johnson " * 300, "hot_key_skew"),
]


def make_doc(
    i: int, seed: int = 42, entity_density: float = 1.0, doc_scale: int = 1
) -> dict:
    """One deterministic corpus row — pure function of (seed, i), so corpus
    generation parallelizes (see generate_corpus_distributed)."""
    rng = random.Random(f"{seed}:{i}")
    lang = LANGS[i % len(LANGS)]
    repo = f"org{i % 5}/proj{i % 3}"
    if lang == "text":
        path = f"docs/chapter_{i}.txt"
        content = make_text_content(
            rng, rng.randrange(8, 40) * doc_scale, entity_density
        )
    elif lang == "markdown":
        path = f"docs/guide_{i}.md"
        content = make_markdown_content(
            rng, rng.randrange(2, 6) * doc_scale, entity_density
        )
    else:
        path = f"src/module_{i}.rs"
        content = make_rust_content(
            rng, rng.randrange(3, 10) * doc_scale, entity_density
        )
    return {
        "repo": repo,
        "path": path,
        "commit": _commit_for(repo, path),
        "lang": lang,
        "content": content,
    }


def generate_corpus(
    n_docs: int = 20,
    seed: int = 42,
    include_edge_cases: bool = True,
    entity_density: float = 1.0,
    doc_scale: int = 1,
) -> list[dict]:
    """Rows of the north-rule input table: (repo, path, commit, lang, content)."""
    rows = [make_doc(i, seed, entity_density, doc_scale) for i in range(n_docs)]
    if include_edge_cases:
        for j, (content, tag) in enumerate(EDGE_CASES):
            repo = "org-edge/proj-edge"
            path = f"edge/{tag}.txt"
            rows.append(
                {
                    "repo": repo,
                    "path": path,
                    "commit": _commit_for(repo, path),
                    "lang": "text",
                    "content": content,
                }
            )
    return rows


def generate_corpus_distributed(
    spark,
    n_docs: int,
    seed: int = 42,
    entity_density: float = 1.0,
    doc_scale: int = 1,
    partitions: int = 64,
):
    """Corpus generation as a Spark job (mapInPandas over an index range) —
    the driver-side generator is single-threaded and becomes the bottleneck
    past ~10^5 docs; this parallelizes the identical deterministic rows."""
    import pandas as pd

    from graphrag_rs_spark.schemas import SOURCE_SCHEMA

    def gen(batches):
        for pdf in batches:
            rows = [
                make_doc(int(i), seed, entity_density, doc_scale)
                for i in pdf["id"]
            ]
            yield pd.DataFrame(rows)

    return (
        spark.range(n_docs)
        .repartition(partitions)
        .mapInPandas(gen, schema=SOURCE_SCHEMA)
    )


def doc_id_for(row: dict) -> str:
    """Deterministic doc id: ``{repo}/{path}@{commit}`` (no uuids — SURVEY §7)."""
    return f"{row['repo']}/{row['path']}@{row['commit']}"
