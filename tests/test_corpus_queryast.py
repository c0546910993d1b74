"""Corpus generator determinism + query parser coverage."""

import hashlib

from lucene_solr_spark.corpus import VOCAB, gen_corpus_pdf, gen_doc
from lucene_solr_spark.queryast import (
    BooleanQuery,
    MatchNoDocsQuery,
    MultiTermQuery,
    Occur,
    PhraseQuery,
    TermQuery,
    levenshtein_within,
    parse_query,
    query_terms,
    rewrite,
)


def test_vocab_size():
    assert len(VOCAB) == 2000


def test_gen_doc_deterministic_and_order_independent():
    a = gen_doc(17, 200)
    b = gen_doc(17, 200)
    assert a == b
    # generating doc 17 must not depend on having generated 0..16
    c = gen_doc(16, 200)
    assert gen_doc(17, 200) == a and c == gen_doc(16, 200)


def test_corpus_sorted_by_repo_path_with_sha():
    df = gen_corpus_pdf(200)
    assert len(df) == 200
    keys = list(zip(df["repo"], df["path"]))
    assert keys == sorted(keys)
    sha = hashlib.sha256(df.loc[5, "content"].encode()).hexdigest()
    assert len(sha) == 64
    assert df["repo"].nunique() == 2


def test_unicode_goldens_embedded():
    d0 = gen_doc(0, 200)
    assert "Վիքիպեդիայի" in d0["content"] or "Testing 1234" in d0["content"]


def test_parse_term_and():
    q = parse_query("import AND numpy")
    assert isinstance(q, BooleanQuery)
    assert [c.occur for c in q.clauses] == [Occur.MUST, Occur.MUST]
    assert query_terms(q) == {"import", "numpy"}


def test_parse_grouped_mixed():
    q = parse_query("(class OR def) AND ident042")
    assert isinstance(q, BooleanQuery)
    occurs = [c.occur for c in q.clauses]
    assert occurs == [Occur.MUST, Occur.MUST]
    inner = q.clauses[0].query
    assert isinstance(inner, BooleanQuery)
    assert all(c.occur == Occur.SHOULD for c in inner.clauses)


def test_parse_must_not():
    q = parse_query("return -static")
    assert isinstance(q, BooleanQuery)
    assert [c.occur for c in q.clauses] == [Occur.SHOULD, Occur.MUST_NOT]


def test_parse_phrase_prefix_fuzzy_range_boost():
    q = parse_query('"public static void"~2')
    assert isinstance(q, PhraseQuery) and q.slop == 2
    q = parse_query("iden*")
    assert isinstance(q, MultiTermQuery) and q.kind == "prefix" and q.pattern == "iden"
    q = parse_query("ident~1")
    assert isinstance(q, MultiTermQuery) and q.kind == "fuzzy" and q.max_edits == 1
    q = parse_query("[aaa TO bbb]")
    assert q.kind == "range" and q.include_lower and q.include_upper
    q = parse_query("{aaa TO bbb}")
    assert not q.include_lower and not q.include_upper
    q = parse_query("import^2.5")
    assert isinstance(q, TermQuery) and q.boost == 2.5


def test_rewrite_expansion_and_empty():
    dictionary = ["alpha", "alps", "beta"]
    q = rewrite(parse_query("alp*"), dictionary)
    assert set(q.terms) == {"alpha", "alps"}
    q = rewrite(parse_query("zzz*"), dictionary)
    assert isinstance(q, MatchNoDocsQuery)


def test_levenshtein():
    assert levenshtein_within("kitten", "sitten", 1)
    assert not levenshtein_within("kitten", "sitting", 2)
    assert levenshtein_within("abc", "abc", 0)


def test_wildcard_matcher():
    m = MultiTermQuery(kind="wildcard", pattern="id*4?").matcher()
    assert m("ident042")
    assert not m("ident04")
