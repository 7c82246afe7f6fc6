"""Sequential greedy linker — reference semantics for linking goldens.

Transcription of StringSimilarityLinker::link_entities
(string_similarity_linker.rs:68-124): greedy single-pass clustering in
entity order; canonical = max-confidence member. Order-dependent by
construction — the distributed linker uses connected components instead,
so golden tests score cluster-pair F1 with the documented tolerance rather
than exact ids (FIXTURES.md §2).
"""

from __future__ import annotations

from graphrag_rs_spark.kernel.linking import compute_similarity


def link_entities_greedy(
    entities: list[dict],
    *,
    min_similarity: float = 0.85,
    fuzzy_matching: bool = True,
    use_phonetic: bool = False,
    max_edit_distance: int = 2,
) -> dict[str, str]:
    """entities: [{entity_id, name, entity_type, confidence}] in a fixed
    order. Returns {entity_id → canonical_id} for linked entities only."""
    links: dict[str, str] = {}
    clustered: set[int] = set()
    clusters: list[list[int]] = []

    for i in range(len(entities)):
        if i in clustered:
            continue
        cluster = [i]
        clustered.add(i)
        for j in range(i + 1, len(entities)):
            if j in clustered:
                continue
            sim = compute_similarity(
                entities[i]["name"],
                entities[j]["name"],
                entities[i]["entity_type"],
                entities[j]["entity_type"],
                fuzzy_matching=fuzzy_matching,
                use_phonetic=use_phonetic,
                max_edit_distance=max_edit_distance,
            )
            if sim >= min_similarity:
                cluster.append(j)
                clustered.add(j)
        if len(cluster) > 1:
            clusters.append(cluster)

    for cluster in clusters:
        canonical_idx = max(cluster, key=lambda k: entities[k]["confidence"])
        canonical_id = entities[canonical_idx]["entity_id"]
        for idx in cluster:
            if idx != canonical_idx:
                links[entities[idx]["entity_id"]] = canonical_id
    return links


def cluster_pairs(links: dict[str, str], all_ids: list[str]) -> set[tuple[str, str]]:
    """Same-cluster pairs induced by a linking map (for pair-F1 scoring)."""
    groups: dict[str, list[str]] = {}
    for eid in all_ids:
        root = links.get(eid, eid)
        groups.setdefault(root, []).append(eid)
    pairs = set()
    for members in groups.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                pairs.add((ms[i], ms[j]))
    return pairs
