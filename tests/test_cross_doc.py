"""L10 cross-document linking — five-strategy parity
(corpus/entity_linker.rs:144-430)."""

from __future__ import annotations

import pytest

from graphrag_rs_spark.operators.cross_doc import (
    edit_ratio_sim,
    link_cross_document,
)


@pytest.fixture(scope="module")
def ents(spark):
    return spark.createDataFrame(
        [
            ("e01", "Apple"),
            ("e02", "Apple"),
            ("e03", "Apple"),      # 3× exact "Apple"
            ("e04", "Applo"),      # edit ratio 0.8 to Apple (1 edit / 5)
            ("e05", "Appla"),      # also 0.8 to Apple, 0.8 to Applo
            ("e06", "Microsoft"),
            ("e07", "Microsoft"),  # 2× exact
            ("e08", "Zebra"),      # unrelated singleton
        ],
        ["entity_id", "name"],
    )


def _by_id(df):
    return {r["entity_id"]: r for r in df.collect()}


def test_edit_ratio_literals(spark):
    import pyspark.sql.functions as F

    rows = spark.createDataFrame(
        [("Apple", "Apple"), ("Apple", "Applo"), ("ab", "cd"), ("", "")],
        ["a", "b"],
    ).select(edit_ratio_sim(F.col("a"), F.col("b")).alias("s")).collect()
    assert [round(r["s"], 4) for r in rows] == [1.0, 0.8, 0.0, 1.0]


def test_exact_strategy(spark, ents):
    out = _by_id(link_cross_document(ents, strategy="exact"))
    assert len(out) == 8  # every entity appears once
    apple = {out[e]["cluster_id"] for e in ("e01", "e02", "e03")}
    assert len(apple) == 1
    assert out["e01"]["canonical_name"] == "Apple"
    assert out["e01"]["confidence_score"] == 1.0
    assert out["e01"]["document_frequency"] == 3  # exact counts members
    # near-misses do NOT join under exact
    assert out["e04"]["cluster_id"] != out["e01"]["cluster_id"]
    assert out["e08"]["document_frequency"] == 1


def test_fuzzy_strategy(spark, ents):
    out = _by_id(link_cross_document(ents, strategy="fuzzy", threshold=0.8))
    # Apple/Applo/Appla all ≥0.8-similar → one cluster of 5
    c = {out[e]["cluster_id"] for e in ("e01", "e02", "e03", "e04", "e05")}
    assert len(c) == 1
    # canonical name = most frequent (Apple ×3)
    assert out["e04"]["canonical_name"] == "Apple"
    assert out["e04"]["confidence_score"] == pytest.approx(0.8)
    assert out["e04"]["document_frequency"] == 1  # reference quirk (:255)
    assert out["e08"]["cluster_id"] != out["e01"]["cluster_id"]
    # Microsoft pair clusters via the same-name edge
    assert out["e06"]["cluster_id"] == out["e07"]["cluster_id"]


def test_semantic_strategy_is_fuzzy_at_08x(spark, ents):
    # reference placeholder (:288-292): semantic(t) ≡ fuzzy(0.8·t)
    sem = _by_id(link_cross_document(ents, strategy="semantic", threshold=1.0))
    fuz = _by_id(link_cross_document(ents, strategy="fuzzy", threshold=0.8))
    assert {
        (e, r["cluster_id"] is not None, r["canonical_name"]) for e, r in sem.items()
    } == {
        (e, r["cluster_id"] is not None, r["canonical_name"]) for e, r in fuz.items()
    }


def test_lmcd_strategy(spark, ents):
    out = _by_id(link_cross_document(ents, strategy="lmcd", confidence_threshold=0.8))
    # first-seen order = min entity_id: "Apple" (e01) keys a cluster;
    # "Applo"/"Appla" are 0.8-similar — NOT >0.9 — so they key their own
    assert out["e01"]["cluster_id"] == out["e03"]["cluster_id"]
    assert out["e01"]["confidence_score"] == pytest.approx(0.9)   # +0.1
    assert out["e04"]["cluster_id"].startswith("lmcd_cluster_")
    # boundary literal: sim(Microsoft, Microsofts) = 1 − 1/10 = 0.9 is
    # NOT strictly > 0.9, so the near-name still keys its own cluster
    ents2 = ents.union(
        spark.createDataFrame([("e09", "Microsofts")], ["entity_id", "name"])
    )
    out2 = _by_id(link_cross_document(ents2, strategy="lmcd", confidence_threshold=0.8))
    assert out2["e09"]["cluster_id"].startswith("lmcd_cluster_")
    assert out2["e09"]["confidence_score"] == pytest.approx(0.9)


def test_lmcd_diverts_near_duplicate_names(spark):
    ents = spark.createDataFrame(
        [
            ("e1", "International Business Machines"),
            ("e2", "International Business Machines"),
            ("e3", "International Business Machinez"),  # ratio 29/30 > 0.9
            ("e4", "International Business Machinez"),
        ],
        ["entity_id", "name"],
    )
    out = _by_id(link_cross_document(ents, strategy="lmcd", confidence_threshold=0.8))
    # the earlier name keys a cluster (+0.1); the later near-dup name's
    # entities are each their own SINGLETON at −0.1 (:357-375)
    assert out["e1"]["cluster_id"] == out["e2"]["cluster_id"]
    assert out["e1"]["confidence_score"] == pytest.approx(0.9)
    assert out["e3"]["cluster_id"] != out["e4"]["cluster_id"]
    assert out["e3"]["cluster_id"].startswith("lmcd_singleton_")
    assert out["e3"]["confidence_score"] == pytest.approx(0.7)


def test_lmcd_driver_sees_only_pair_adjacent_names(spark, monkeypatch):
    """The greedy must collect only names that appear in a >0.9-similar
    pair — isolated names are keys by definition and stay distributed."""
    # patch the CLASSIC DataFrame class — pyspark.sql.DataFrame is the
    # dispatching base in Spark 4 and its collect is overridden there
    from pyspark.sql.classic.dataframe import DataFrame

    ents = spark.createDataFrame(
        [
            ("e1", "International Business Machines"),
            ("e2", "International Business Machinez"),  # adjacent pair
            ("e3", "Zebra Holdings"),                   # isolated
            ("e4", "Quux Industrial Group"),            # isolated
            ("e5", "Totally Unrelated Concern"),        # isolated
        ],
        ["entity_id", "name"],
    )
    collected_names: set[str] = set()
    real_collect = DataFrame.collect

    def spy_collect(self):
        rows = real_collect(self)
        for r in rows:
            d = r.asDict()
            for k in ("name", "name_a", "name_b"):
                if d.get(k) is not None:
                    collected_names.add(d[k])
        return rows

    monkeypatch.setattr(DataFrame, "collect", spy_collect)
    out = _by_id(link_cross_document(ents, strategy="lmcd", confidence_threshold=0.8))
    assert collected_names == {
        "International Business Machines",
        "International Business Machinez",
    }
    # isolated names still key their own clusters, computed distributed
    assert out["e3"]["cluster_id"].startswith("lmcd_cluster_")
    assert out["e4"]["cluster_id"].startswith("lmcd_cluster_")
    assert out["e1"]["cluster_id"].startswith("lmcd_cluster_")
    assert out["e2"]["cluster_id"].startswith("lmcd_singleton_")


def test_hybrid_strategy(spark, ents):
    out = _by_id(link_cross_document(ents, strategy="hybrid"))
    # multi-entity names → exact clusters at confidence 1.0
    assert out["e01"]["cluster_id"] == out["e03"]["cluster_id"]
    assert out["e01"]["confidence_score"] == 1.0
    assert out["e01"]["document_frequency"] == 3
    # singleton names (Applo, Appla, Zebra) go through fuzzy@0.85:
    # sim(Applo, Appla) = 0.8 < 0.85 → separate clusters
    assert out["e04"]["cluster_id"] != out["e05"]["cluster_id"]
    assert out["e04"]["confidence_score"] == pytest.approx(0.85)
    # exact pool and fuzzy pool never mix
    assert out["e04"]["cluster_id"] != out["e01"]["cluster_id"]
    assert len(_by_id(link_cross_document(ents, strategy="hybrid"))) == 8


def test_unknown_strategy_raises(spark, ents):
    with pytest.raises(ValueError, match="unknown cross-document"):
        link_cross_document(ents, strategy="nope")
