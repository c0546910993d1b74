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
