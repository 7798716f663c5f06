"""lang_id accuracy over the real lexicon (VERDICT r2 #4): each of ten
stopword-dense native-language sentences must classify correctly, the
codegen and broadcast-join variants must agree row-for-row, and zero-hit
docs must take the deterministic fallback."""

import pytest
from pyspark.sql import functions as F

from btrdb_spark.functions import text
from btrdb_spark.functions.lexicon import STOPWORDS, lexicon_rows

SENTENCES = [
    ("en", "the cat sat on the mat and it was happy to be there with all of them"),
    ("es", "el perro corre por la calle y no quiere estar en la casa porque hace calor"),
    ("de", "der hund läuft über die straße und das wetter ist heute nicht so schön wie gestern"),
    ("fr", "le chien court dans la rue et il ne veut pas être dans la maison avec nous"),
    ("it", "il cane corre nella strada e non vuole essere in casa perché fa molto caldo"),
    ("pt", "o cachorro corre pela rua e não quer estar em casa porque faz muito calor"),
    ("nl", "de hond loopt over de straat en het weer is vandaag niet zo mooi als gisteren"),
    ("sv", "hunden springer på gatan och den vill inte vara i huset eftersom det är så varmt"),
    ("ru", "собака бежит по улице и она не хочет быть в доме потому что очень жарко"),
    ("pl", "pies biegnie przez ulicę i nie chce być w domu bo jest bardzo gorąco"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, s, lang) for i, (lang, s) in enumerate(SENTENCES)],
        "doc_id long, text string, true_lang string",
    )


@pytest.fixture(scope="module")
def lex_df(spark):
    return spark.createDataFrame(lexicon_rows(), "lang string, word string")


def test_lexicon_shape():
    assert len(STOPWORDS) == 10
    for lang, ws in STOPWORDS.items():
        assert len(ws) >= 40, f"{lang}: lexicon too small to discriminate"
        assert all(w == w.lower() for w in ws)
        assert len(set(ws)) == len(ws), f"{lang}: duplicate words"


def test_native_sentences_classify_correctly(docs):
    got = {r["doc_id"]: r["pred_lang"] for r in text.lang_id(docs).collect()}
    want = {i: lang for i, (lang, _s) in enumerate(SENTENCES)}
    assert got == want


def test_join_variant_agrees_with_codegen_variant(docs, lex_df):
    a = text.lang_id(docs).collect()
    b = text.lang_id_lexicon(docs, lex_df).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_zero_hit_fallback_is_deterministic(spark, lex_df):
    noise = spark.createDataFrame(
        [(0, "qqq zzz xxx www"), (1, "blorp fnord glark")],
        "doc_id long, text string",
    )
    for out in (text.lang_id(noise), text.lang_id_lexicon(noise, lex_df)):
        rows = out.collect()
        assert all(r["pred_hits"] == 0 for r in rows)
        assert all(r["pred_lang"] == min(STOPWORDS) for r in rows)


def test_case_insensitive(spark):
    docs = spark.createDataFrame(
        [(0, "The Cat And The Hat Was On It")], "doc_id long, text string"
    )
    r = text.lang_id(docs).collect()[0]
    assert r["pred_lang"] == "en" and r["pred_hits"] >= 5
