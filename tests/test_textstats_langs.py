"""Broadened language-ID family (round-5 verdict #5): ~21 languages with
an explicit `und` fallback, plus documented behavior on non-Latin and
space-free scripts.

Contract recap (operators/textstats.py):
- tokens = lower + translate(ASCII delimiters -> space) + split: non-ASCII
  bytes stay INSIDE tokens, so whitespace-separated non-Latin scripts
  (Cyrillic) tokenize correctly on the Spark side;
- the DuckDB oracle splits on `[^a-zA-Z0-9']+` — identical on ASCII
  corpora (board-verified every round), undefined beyond ASCII; the
  board corpus is ASCII so the contract holds;
- languages score by stopword hit ratio; argmax wins, ties break to the
  lexicographically largest code; below a 2% ratio floor -> 'und'.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _pred(spark, texts):
    from graphrag_rs_spark.operators.textstats import language_id_col

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    return {
        r["doc_id"]: r["lang"]
        for r in df.select(
            "doc_id", language_id_col(F.col("text")).alias("lang")
        ).collect()
    }


def test_latin_script_family(spark):
    texts = [
        "il gatto non sono che un animale per la casa e di questo lo so",  # it
        "o gato e um animal que vive na casa da familia para os mais",  # pt
        "de kat is een dier dat in het huis van de familie was en niet",  # nl
        "och jag har en katt som han den med var till ett hus om du vi",  # sv
        "yang kucing itu dan di dalam rumah dengan untuk tidak ini dari saya",  # id
        "bir kedi bu ve ne o da gibi ama ben daha var sen ki mi en",  # tr
        "a az macska es nem hogy is egy ez van de ha meg csak mar el",  # hu
        "si pisica in de la a cu pe este nu o un care mai pentru din",  # ro
    ]
    got = _pred(spark, texts)
    assert got == {0: "it", 1: "pt", 2: "nl", 3: "sv",
                   4: "id", 5: "tr", 6: "hu", 7: "ro"}


def test_cyrillic_whitespace_script_detected_spark_side(spark):
    # Russian is whitespace-separated: the translate-based tokenizer keeps
    # Cyrillic bytes inside tokens, so stopword hits land and ru wins.
    got = _pred(spark, [
        "я не знаю что он сказал но она была у них в доме и они ушли за ним"
    ])
    assert got[0] == "ru"


def test_space_free_scripts_fall_to_und(spark):
    # CJK/Thai have no ASCII-space word boundaries: the whole line is one
    # giant token, no stopword list matches, ratio 0 -> 'und'. This is the
    # documented honest behavior (a real deployment adds a CJK n-gram
    # model; the heuristic refuses rather than misclassifies).
    got = _pred(spark, ["这是一个测试文档没有空格分词", "นี่คือเอกสารทดสอบภาษาไทย"])
    assert got == {0: "und", 1: "und"}


def test_und_floor_and_empty(spark):
    got = _pred(spark, ["zzz qqq xxw pfl mmt", ""])
    assert got == {0: "und", 1: "und"}


def test_oracle_lang_family_mirrors_engine():
    # the oracle's language inventory is IMPORTED from the operator module
    # (no drift possible) — assert the generated SQL names every language
    import __spark_entry__ as m
    from graphrag_rs_spark.operators.textstats import STOPWORDS

    sql = m.oracle_sql()["text_langid"]
    assert len(STOPWORDS) >= 20
    for code in STOPWORDS:
        assert f"s_{code}" in sql
    assert "'und'" in sql


def test_udf_and_column_strategies_identical(spark):
    # the one-pass dict UDF must reproduce the 21-regex column
    # formulation bit-for-bit, including tokenizer edges: empty,
    # punctuation-only, ASCII-space-only splitting (U+00A0 stays inside
    # a token in BOTH paths), Cyrillic, mixed case, apostrophes
    from graphrag_rs_spark.operators.textstats import language_id_col

    texts = [
        "",
        "?!... --- ###",
        "the cat and the dog are in the house with a friend",
        "LE CHAT ET LES CHIENS SONT DANS LA MAISON POUR UN AMI",
        "я не знаю что он сказал но она была у них в доме",
        "don't it's the cat's toy and that was for you",
        "the cat and",                # NBSP is NOT a delimiter
        "the cat\tand\nthe dog is here",      # ASCII tab/newline are
        "zzz qqq xxw",
    ]
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    udf_side = {
        r["doc_id"]: r["l"]
        for r in df.select(
            "doc_id", language_id_col(F.col("text"), "udf").alias("l")
        ).collect()
    }
    col_side = {
        r["doc_id"]: r["l"]
        for r in df.select(
            "doc_id", language_id_col(F.col("text"), "column").alias("l")
        ).collect()
    }
    assert udf_side == col_side
