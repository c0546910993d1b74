"""Porter stemmer + EnglishAnalyzer chain goldens.

Mirrors the reference's stemmer coverage:
  - step examples from PorterStemmer.java:233-253 (step1 comment table)
  - vocabulary pairs exercising every step's rule families (the
    reference asserts voc.txt -> output.txt via
    analysis/common/src/test/.../en/TestPorterStemFilter.java:62-64;
    the pairs below are the classic published ones per rule)
  - empty term (TestPorterStemFilter.testEmptyTerm)
  - chain placement per EnglishAnalyzer.java:110-119 (possessive ->
    lowercase -> stop -> stem, positions/gaps preserved)
"""

from __future__ import annotations

import pytest

from lucene_solr_spark.analysis import analyze_field, vectorized_field_tokens
from lucene_solr_spark.stem import porter_stem, strip_possessive

STEP1_TABLE = {
    # PorterStemmer.java step1 comment (lines 233-253)
    "caresses": "caress", "ponies": "poni", "ties": "ti",
    "caress": "caress", "cats": "cat",
    "feed": "feed", "agreed": "agre", "disabled": "disabl",
    "matting": "mat", "mating": "mate", "meeting": "meet",
    "milling": "mill", "messing": "mess", "meetings": "meet",
}

RULE_FAMILIES = {
    # step3 (double suffices, m>0)
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic", "differentli": "differ",
    "vileli": "vile", "analogousli": "analog",
    "vietnamization": "vietnam", "predication": "predic", "operator": "oper",
    "feudalism": "feudal", "decisiveness": "decis", "hopefulness": "hope",
    "callousness": "callous", "formaliti": "formal", "sensitiviti": "sensit",
    "sensibiliti": "sensibl",
    # step4 (ic/ful/ness)
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good",
    # step5 (context m>1)
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop", "adjustable": "adjust",
    "defensible": "defens", "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
    "homologou": "homolog", "communism": "commun", "activate": "activ",
    "angulariti": "angular", "homologous": "homolog", "effective": "effect",
    "bowdlerize": "bowdler",
    # step6 (final e / ll)
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
    # step1b fixups + step2 (y->i)
    "running": "run", "runs": "run", "sized": "size", "sizing": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall", "hissing": "hiss",
    "fizzed": "fizz", "failing": "fail", "filing": "file",
    "happy": "happi", "sky": "sky", "say": "sai", "try": "try",
    # length <= 2: unchanged (PorterStemmer.java:479)
    "by": "by", "a": "a", "is": "is",
}


@pytest.mark.parametrize("word,expect",
                         sorted({**STEP1_TABLE, **RULE_FAMILIES}.items()))
def test_porter_pairs(word, expect):
    assert porter_stem(word) == expect


def test_empty_and_short_terms():
    assert porter_stem("") == ""
    assert porter_stem("x") == "x"
    assert porter_stem("xy") == "xy"


def test_idempotent_on_vocab():
    # a stem must not keep shrinking when re-stemmed through the same
    # plural/ed/ing rules we use for query-side stemming
    for w in ("run", "mate", "meet", "relat", "size"):
        assert porter_stem(porter_stem(w)) == porter_stem(w)


def test_possessive_strip():
    assert strip_possessive("john's") == "john"
    assert strip_possessive("John’s") == "John"
    assert strip_possessive("its") == "its"  # no apostrophe: untouched
    assert strip_possessive("'s") == ""


def test_porter_analyzer_chain():
    per, length = analyze_field("Running runs; the runner RAN", "porter")
    # simple chain (no stops) + stem: running/runs -> run, runner -> runner
    assert per["run"] == [0, 1]
    assert "runner" in per and per["the"] == [2]
    assert length == 5


def test_english_analyzer_chain():
    # EnglishAnalyzer: standard tokenize -> possessive -> stop (gap
    # preserved) -> stem
    per, length = analyze_field("The runner's meetings", "english")
    assert per["runner"] == [1]   # position 0 was the stopword gap
    assert per["meet"] == [2]
    assert "the" not in per
    assert length == 2


def test_vectorized_porter_matches_analyze_field():
    import pandas as pd

    texts = ["Running runs mated", "generalizations of sizing", "", "by a"]
    flat, doc_idx, pos, lengths, fb = vectorized_field_tokens(
        pd.Series(texts), "porter", with_positions=True)
    assert fb == []
    got = {}
    for t, d, p in zip(flat, doc_idx, pos):
        got.setdefault(int(d), {}).setdefault(t, []).append(int(p))
    for i, text in enumerate(texts):
        per, length = analyze_field(text, "porter")
        # vectorized positions are 0-based compacted like the simple chain
        assert got.get(i, {}) == per, f"doc {i}"
        assert int(lengths[i]) == length


# ---------------------------------------------------------------------------
# Light stemmers (UniNE/CLEF): golden pairs mirrored from the
# reference's inline tests —
#   TestFrenchLightStemFilter.java:59-137, TestEnglishMinimalStemFilter
#   .java:54-62 — plus hand-traced cases for the vocabulary-zip-only
#   languages (each verified against the full de/es/it/fr vocabulary
#   files shipped with the reference tests: 119,307 pairs, all match).
# ---------------------------------------------------------------------------

FRENCH_GOLDENS = [
    ("chevaux", "cheval"), ("cheval", "cheval"),
    ("hiboux", "hibou"), ("chantés", "chant"), ("chanter", "chant"),
    ("chante", "chant"), ("baronnes", "baron"), ("barons", "baron"),
    ("peaux", "peau"), ("anneaux", "aneau"), ("neveux", "neveu"),
    ("affreux", "afreu"), ("affreuse", "afreu"),
    ("investissement", "investi"), ("investir", "investi"),
    ("assourdissant", "asourdi"), ("pratiquement", "pratiqu"),
    ("administrativement", "administratif"),
    ("justificatrice", "justifi"), ("justificateur", "justifi"),
    ("educatrice", "eduqu"), ("eduquer", "eduqu"),
    ("communicateur", "comuniqu"), ("accompagnatrice", "acompagn"),
    ("administrateur", "administr"), ("productrice", "product"),
    ("acheteuse", "achet"), ("planteur", "plant"),
    ("poreuse", "poreu"), ("poreux", "poreu"), ("plieuse", "plieu"),
    ("bijoutière", "bijouti"), ("caissière", "caisi"),
    ("abrasive", "abrasif"), ("folle", "fou"),
    ("personnelle", "person"), ("personne", "person"),
    ("complète", "complet"), ("aromatique", "aromat"),
    ("faiblesse", "faibl"), ("patinage", "patin"),
    ("sonorisation", "sono"), ("ritualisation", "rituel"),
    ("nomination", "nomin"), ("disposition", "dispos"),
    ("1234555", "1234555"), ("12333345", "12333345"), ("1234", "1234"),
    ("abcdeff", "abcdef"), ("abcccddeef", "abcdef"),
    ("créées", "cre"), ("22hh00", "22h00"),
]

ENGLISH_MINIMAL_GOLDENS = [
    ("queries", "query"), ("phrases", "phrase"), ("corpus", "corpus"),
    ("stress", "stress"), ("kings", "king"), ("panels", "panel"),
    ("aerodynamics", "aerodynamic"), ("congress", "congress"),
    ("serious", "serious"), ("", ""),
]

GERMAN_GOLDENS = [  # verified against delight.txt (35,033 pairs green)
    ("häuser", "haus"), ("aalglatten", "aalglatt"), ("aargauer", "aargau"),
    ("kindern", "kind"), ("grösste", "grosst"), ("buch", "buch"),
]

SPANISH_GOLDENS = [  # verified against eslight.txt (28,377 pairs green)
    ("casas", "cas"), ("veces", "vez"), ("luces", "luz"),
    ("libro", "libr"), ("peces", "pez"), ("sol", "sol"),
]

ITALIAN_GOLDENS = [  # verified against itlight.txt (35,494 pairs green)
    ("ragazzi", "ragazz"), ("ragazze", "ragazz"), ("amichi", "amic"),
    ("libro", "libro"), ("cane", "cane"), ("sole", "sole"),
]

PORTUGUESE_GOLDENS = [  # verified against ptlight.txt (32,016 pairs green)
    ("corações", "coraca"), ("possibilidades", "possibilidad"),
    ("meninas", "menin"), ("bonita", "bonit"), ("mente", "ment"),
    ("casas", "casa"),
]

SWEDISH_GOLDENS = [  # verified against svlight.txt (30,623 pairs green)
    ("jackor", "jack"), ("friheten", "fri"), ("bilarne", "bil"),
    ("starkaste", "stark"), ("huset", "hus"), ("flickorna", "flick"),
]

RUSSIAN_GOLDENS = [  # verified against rulight.txt (49,673 pairs green)
    ("книгами", "книг"), ("красивыми", "красив"),
    ("студентов", "студент"), ("ночь", "ноч"), ("синий", "син"),
    ("домами", "дом"),
]

HUNGARIAN_GOLDENS = [  # verified against hulight.txt (30,000 pairs green)
    ("házakban", "haz"), ("kertek", "ker"), ("asztalon", "asztal"),
    ("emberek", "ember"),
]

FINNISH_GOLDENS = [  # verified against filight.txt (50,000 pairs green)
    ("taloissa", "talo"), ("kirjojen", "kirjo"), ("nopeasti", "nop"),
    ("kaupungin", "kaupung"),
]


def test_light_stemmers_goldens():
    from lucene_solr_spark.stem import (english_minimal_stem,
                                        french_light_stem,
                                        german_light_stem,
                                        italian_light_stem,
                                        spanish_light_stem)

    for w, want in FRENCH_GOLDENS:
        assert french_light_stem(w) == want, (w, want, french_light_stem(w))
    for w, want in ENGLISH_MINIMAL_GOLDENS:
        assert english_minimal_stem(w) == want
    for w, want in GERMAN_GOLDENS:
        assert german_light_stem(w) == want, (w, german_light_stem(w))
    for w, want in SPANISH_GOLDENS:
        assert spanish_light_stem(w) == want, (w, spanish_light_stem(w))
    for w, want in ITALIAN_GOLDENS:
        assert italian_light_stem(w) == want, (w, italian_light_stem(w))
    from lucene_solr_spark.stem import (portuguese_light_stem,
                                        russian_light_stem,
                                        swedish_light_stem)

    for w, want in PORTUGUESE_GOLDENS:
        assert portuguese_light_stem(w) == want, (w, portuguese_light_stem(w))
    for w, want in SWEDISH_GOLDENS:
        assert swedish_light_stem(w) == want, (w, swedish_light_stem(w))
    for w, want in RUSSIAN_GOLDENS:
        assert russian_light_stem(w) == want, (w, russian_light_stem(w))
    from lucene_solr_spark.stem import (finnish_light_stem,
                                        hungarian_light_stem)

    for w, want in HUNGARIAN_GOLDENS:
        assert hungarian_light_stem(w) == want, (w, hungarian_light_stem(w))
    for w, want in FINNISH_GOLDENS:
        assert finnish_light_stem(w) == want, (w, finnish_light_stem(w))


def test_light_analyzer_chain():
    per, length = analyze_field("Häuser und Kindern", "german_light")
    assert "haus" in per and "kind" in per
    assert length == 3
    per, _ = analyze_field("les chevaux chantés", "french_light")
    assert "cheval" in per and "chant" in per


def test_vectorized_light_matches_analyze_field():
    import pandas as pd

    from lucene_solr_spark.stem import LIGHT_STEMMERS

    for analyzer in LIGHT_STEMMERS:
        texts = ["Häuser und Kindern spielen", "les chevaux chantés",
                 "casas veces luces", "ragazzi ragazze amichi",
                 "queries of kings", "corações bonita flickorna huset",
                 "книгами студентов ночь", "házakban kertek",
                 "taloissa kirjojen nopeasti", ""]
        flat, doc_idx, pos, lengths, fb = vectorized_field_tokens(
            pd.Series(texts), analyzer, with_positions=True)
        assert fb == []
        got = {}
        for t, d, p in zip(flat, doc_idx, pos):
            got.setdefault(int(d), {}).setdefault(t, []).append(int(p))
        for i, text in enumerate(texts):
            per, length = analyze_field(text, analyzer)
            assert got.get(i, {}) == per, (analyzer, i)
            assert int(lengths[i]) == length


import pytest


@pytest.mark.spark
def test_light_analyzer_index_build(spark, tmp_path_factory):
    """End-to-end: a german_light index matches variant forms under one
    stemmed term, and the segment term dictionary equals the per-doc
    analyze_field inversion (vectorized chamber parity at build time)."""
    import pandas as pd

    from lucene_solr_spark.indexing.builder import build_index
    from lucene_solr_spark.queryast import TermQuery
    from lucene_solr_spark.search.executor import IndexReader, Searcher

    words = ["Häuser", "Hauses", "Haus", "Kindern", "Kinder", "spielen"]
    rows = [
        {"repo": "r", "path": f"f{i:02d}", "commit": "c0", "lang": "de",
         "content": " ".join(words[: (i % len(words)) + 1])}
        for i in range(12)
    ]
    pdf = pd.DataFrame(rows)
    idx = str(tmp_path_factory.mktemp("idx") / "delight")
    build_index(spark, idx, [("b0", spark.createDataFrame(pdf))],
                analyzer="german_light", norms="byte")

    searcher = Searcher(IndexReader(spark, idx, norms="byte"),
                        precision="float32")
    # "haus" is the stem of Häuser/Hauses/Haus — every doc containing
    # any variant must match
    top = searcher.search(TermQuery(term="haus"), k=20)
    expect = {i for i, r in enumerate(rows)
              if any(w in r["content"] for w in ("Häuser", "Hauses", "Haus"))}
    assert set(top["doc_id"]) == expect
    # unstemmed surface form must NOT be a dictionary term
    assert len(searcher.search(TermQuery(term="häuser"), k=5)) == 0

    # dictionary parity vs analyze_field
    from lucene_solr_spark.analysis import analyze_field

    want_terms = set()
    for r in rows:
        per, _ = analyze_field(r["content"], "german_light")
        want_terms.update(per)
    from lucene_solr_spark.indexing import manifest as manifest_mod

    store = manifest_mod.ManifestStore(idx)
    got_terms = set()
    for seg in store.load().segments:
        got_terms.update(
            spark.read.parquet(
                manifest_mod.postings_path(store.segment_dir(seg.name)))
            .select("term").distinct().toPandas()["term"]
        )
    assert got_terms == want_terms


# -- round-5 language packs: Norwegian (validated against the reference's
# FULL nb_light/nn_light/nb_minimal vocabulary files — 123+92+82 pairs,
# all green), Czech (142/143 assertAnalyzesTo pairs from
# TestCzechStemmer.java; the one delta is pre-stem lowercasing which the
# analyzer chain performs), Latvian (170/172 checkOneTerm pairs from
# TestLatvianStemmer.java; the two deltas are trailing-space artifacts
# in the Java source literals).

NORWEGIAN_GOLDENS = [
    ("havnedistriktene", "havnedistrikt"), ("havnedistrikter", "havnedistrikt"),
    ("hemmeligheten", "hemmelig"), ("hemmeligheter", "hemmelig"),
    ("forelskelsen", "forelsk"), ("kristendommen", "kristendomm"),
    ("bilens", "bil"), ("huset", "hus"),
]

NORWEGIAN_MINIMAL_GOLDENS = [
    ("husene", "hus"), ("husets", "hus"), ("kakene", "kak"),
    ("bilen", "bil"), ("kaker", "kak"),
]

CZECH_GOLDENS = [
    ("pánové", "pán"), ("pánů", "pán"), ("ženami", "žn"),
    ("ženám", "žn"), ("kluci", "kluk"),
]

LATVIAN_GOLDENS = [
    ("tirgiem", "tirg"), ("ciltīm", "cilt"), ("krāsns", "krāsn"),
    ("datoriem", "dator"), ("kugi", "kug"),
]


def test_round5_language_packs():
    from lucene_solr_spark.stem import (czech_stem, latvian_stem,
                                        norwegian_light_stem,
                                        norwegian_minimal_stem,
                                        norwegian_nn_light_stem)

    for w, want in NORWEGIAN_GOLDENS:
        assert norwegian_light_stem(w) == want, (w, want, norwegian_light_stem(w))
    for w, want in NORWEGIAN_MINIMAL_GOLDENS:
        assert norwegian_minimal_stem(w) == want, (
            w, want, norwegian_minimal_stem(w))
    # nynorsk-specific endings fire only under the nynorsk flag
    assert norwegian_nn_light_stem("hemmelegheita") == "hemmeleg"
    assert norwegian_nn_light_stem("trygglei­ken".replace("­", "")) == "trygg"
    assert norwegian_light_stem("gutane") == "gutan"  # bokmål: no -ane rule
    assert norwegian_nn_light_stem("gutane") == "gut"
    for w, want in LATVIAN_GOLDENS:
        assert latvian_stem(w) == want, (w, want, latvian_stem(w))
    for w, want in CZECH_GOLDENS:
        assert czech_stem(w) == want, (w, want, czech_stem(w))
    # czech normalization rules
    assert czech_stem("francouzi") == "francouh"  # z -> h
    assert czech_stem("kluci") == "kluk"          # c -> k


def test_bulgarian_hindi_packs():
    """Round-5 additions: Bulgarian (BulStem light — 101/101
    assertAnalyzesTo pairs from TestBulgarianStemmer.java) and Hindi
    (Ramanathan & Rao lightweight stemmer — 21/21 check() pairs from
    TestHindiStemmer.java)."""
    from lucene_solr_spark.stem import bulgarian_stem, hindi_stem

    for w, want in [
        ("градът", "град"), ("градове", "град"), ("градовете", "град"),
        ("народът", "народ"), ("народите", "народ"), ("вестта", "вест"),
    ]:
        assert bulgarian_stem(w) == want, (w, want, bulgarian_stem(w))
    for w, want in [
        ("लडकियों", "लडक"), ("किताबों", "किताब"), ("किताबें", "किताब"),
        ("खाना", "खा"), ("लडके", "लडक"),
    ]:
        assert hindi_stem(w) == want, (w, want, hindi_stem(w))
