"""Analyzer goldens (FIXTURES.md §3), mirrored from
lucene/core/src/test/.../analysis/standard/TestStandardAnalyzer.java
(assertAnalyzesTo style)."""

from lucene_solr_spark.analysis import (
    ENGLISH_STOP_WORDS,
    simple_analyze,
    standard_analyze,
    standard_field_length,
    tokenize,
)


def terms(text):
    return [t for t, _ in standard_analyze(text)]


def test_alphanum_and_num():
    assert terms("Testing 1234") == ["testing", "1234"]


def test_mixed_alnum():
    assert terms("B2B 2B") == ["b2b", "2b"]


def test_stop_and_lowercase():
    assert terms("the quick Brown FOX") == ["quick", "brown", "fox"]


def test_code_punctuation():
    # UAX#29: word-internal '.' between letters joins (MidNumLet);
    # '_' joins (ExtendNumLet); '(', ')', ';', '=' break.
    assert terms("foo.bar(baz_qux); x=1") == ["foo.bar", "baz_qux", "x", "1"]


def test_symbols_dropped():
    assert terms("C++ C#") == ["c", "c"]


def test_overlong_token_skipped_with_position_gap():
    long_tok = "x" * 256
    toks = standard_analyze(f"alpha {long_tok} beta")
    assert [t for t, _ in toks] == ["alpha", "beta"]
    positions = {t: p for t, p in toks}
    assert positions["beta"] - positions["alpha"] == 2  # gap preserved


def test_len_255_kept():
    tok = "y" * 255
    assert terms(f"a1 {tok}") == ["a1", tok]


def test_unicode_armenian():
    assert terms("Վիքիպեդիայի 13") == ["վիքիպեդիայի", "13"]


def test_all_stopwords_removed_after_lowercase():
    # pins the tokenize -> lowercase -> stop order
    assert terms("AND OR NOT") == []


def test_stopword_positions_preserved():
    toks = standard_analyze("the quick and the dead")
    # positions: the=0 quick=1 and=2 the=3 dead=4 -> emitted quick@1 dead@4
    assert toks == [("quick", 1), ("dead", 4)]


def test_field_length_counts_post_stop_tokens():
    assert standard_field_length("the quick brown fox") == 3
    assert standard_field_length("a an and") == 0


def test_apostrophe_and_number_mids():
    assert terms("don't stop") == ["don't", "stop"]
    # ',' between digits is MidNum: '1,000' joins (WB11/12); 'v1' glues
    # ALetter+Numeric (WB9), so 'v1,000' is ONE token per UAX#29.
    assert terms("pi 3.14 v1,000") == ["pi", "3.14", "v1,000"]
    # '.' between digit and letter breaks (MidNumLet needs same class)
    assert terms("foo.123") == ["foo", "123"]
    # '.' after '_' breaks (ExtendNumLet is not ALetter)
    assert terms("foo_.bar") == ["foo_", "bar"]


def test_stop_set_is_33():
    assert len(ENGLISH_STOP_WORDS) == 33


def test_tokenize_positions_monotonic():
    toks = tokenize("a b c d")
    assert [p for _, p in toks] == [0, 1, 2, 3]


def test_simple_analyzer_sql_replicable():
    assert simple_analyze("Foo.Bar(baz_qux); x=1") == ["foo", "bar", "baz", "qux", "x", "1"]
    assert simple_analyze("The Quick", stop=True) == ["quick"]


class TestFieldAnalyzerRegistry:
    """analyze_field: the per-field analyzer registry (SURVEY §2.2,
    IndexSchema per-field analyzers)."""

    def test_keyword_whole_value_case_preserved(self):
        from lucene_solr_spark.analysis import analyze_field

        per, length = analyze_field("Hello World-42", "keyword")
        assert per == {"Hello World-42": [0]} and length == 1
        assert analyze_field("", "keyword") == ({}, 0)
        assert analyze_field(None, "keyword") == ({}, 0)

    def test_whitespace_preserves_case_splits_on_ws(self):
        from lucene_solr_spark.analysis import analyze_field

        per, length = analyze_field("Foo  bar\tFoo\nBaz", "whitespace")
        assert length == 4
        assert per["Foo"] == [0, 2] and per["bar"] == [1] and per["Baz"] == [3]

    def test_shingle_bigrams(self):
        from lucene_solr_spark.analysis import analyze_field

        per, length = analyze_field("a b c b c", "shingle")
        assert length == 4
        assert per["a b"] == [0] and per["b c"] == [1, 3] and per["c b"] == [2]
        assert analyze_field("one", "shingle") == ({}, 0)

    def test_simple_stop_compacted_positions(self):
        from lucene_solr_spark.analysis import analyze_field

        per, length = analyze_field("the quick and the dead", "simple_stop")
        assert per == {"quick": [0], "dead": [1]} and length == 2

    def test_standard_matches_invert_tokens(self):
        from lucene_solr_spark.analysis import analyze_field, invert_tokens

        text = "The quick brown-fox can't stop; version 1.2.3 is HERE"
        assert analyze_field(text, "standard") == invert_tokens(text)

    def test_edge_ngram(self):
        from lucene_solr_spark.analysis import analyze_field

        per, length = analyze_field("spark sql", "edge_ngram")
        assert length == 2  # field length counts SOURCE tokens
        assert per["sp"] == [0] and per["spa"] == [0] and per["spark"] == [0]
        assert per["sq"] == [1] and per["sql"] == [1]
        assert "s" not in per  # below minGram
        # shared prefix across tokens accumulates positions
        per2, _ = analyze_field("spa spark", "edge_ngram")
        assert per2["sp"] == [0, 1] and per2["spa"] == [0, 1]

    def test_word_delimiter_goldens(self):
        # splits mirror WordDelimiterGraphFilter with generateWordParts
        # + generateNumberParts + splitOnCaseChange + splitOnNumerics
        # (catenate/preserveOriginal off), then lowercase — cases from
        # TestWordDelimiterGraphFilter.java (PowerShot, SD500, j2se,
        # wi-fi) and WordDelimiterIterator case-transition rules.
        from lucene_solr_spark.analysis import word_delimiter_analyze as w

        assert w("PowerShot") == ["power", "shot"]
        assert w("SD500") == ["sd", "500"]
        assert w("j2se") == ["j", "2", "se"]
        assert w("wi-fi") == ["wi", "fi"]
        assert w("HTTPServer") == ["http", "server"]
        assert w("getUserName") == ["get", "user", "name"]
        assert w("snake_case_id") == ["snake", "case", "id"]
        assert w("ident123") == ["ident", "123"]
        assert w("") == []

    def test_word_delimiter_field_registry(self):
        from lucene_solr_spark.analysis import analyze_field

        per, length = analyze_field("parseHTTPResponse42", "word_delimiter")
        assert per == {"parse": [0], "http": [1], "response": [2], "42": [3]}
        assert length == 4

    def test_word_delimiter_spark_duckdb_parity(self):
        # the boundary-substitution chain must behave identically under
        # Python re (this oracle), Java regex (Spark, backref $n) and
        # RE2 (DuckDB, backref \n) — verified here for DuckDB; the
        # registry entry ft_word_delimiter covers Spark vs DuckDB.
        import duckdb

        from lucene_solr_spark.analysis import (
            WORD_DELIMITER_BOUNDARIES, word_delimiter_analyze)

        texts = ["PowerShot", "getHTTPServer42x", "j2se wi-fi SD500",
                 "snake_case ident123 XMLHttpRequest"]
        con = duckdb.connect()
        for t in texts:
            expr = "?"
            for pat, _ in WORD_DELIMITER_BOUNDARIES:
                expr = f"regexp_replace({expr}, '{pat}', '\\1 \\2', 'g')"
            got = con.execute(
                f"SELECT list_filter(regexp_split_to_array(lower({expr}),"
                " '[^a-z0-9]+'), x -> x <> '')", [t]).fetchone()[0]
            assert got == word_delimiter_analyze(t), t


class TestCJKBigram:
    def test_cjk_bigram_goldens(self):
        # CJKBigramFilter semantics (CJKBigramFilter.java:40-66, cases
        # from TestCJKBigramFilter.java): adjacent CJK chars pair into
        # overlapping bigrams, a lone CJK char stays a unigram, non-CJK
        # text passes through the (lowercase) word chain, and bigrams
        # cross the Han/Hiragana/Katakana/Hangul script boundaries
        # (all four flags on — the CJKAnalyzer default).
        from lucene_solr_spark.analysis import cjk_bigram_analyze as c

        assert c("世界平和") == ["世界", "界平", "平和"]
        assert c("本") == ["本"]
        assert c("Hello 世界 test") == ["hello", "世界", "test"]
        assert c("カタカナです") == ["カタ", "タカ", "カナ", "ナで", "です"]
        assert c("한국어") == ["한국", "국어"]
        assert c("abc123") == ["abc123"]
        assert c("") == []

    def test_cjk_field_registry_positions(self):
        # a run of n chars emits n-1 bigrams at consecutive positions
        # (each bigram consumes one position; outputUnigrams=false)
        from lucene_solr_spark.analysis import analyze_field

        per, length = analyze_field("分散検索", "cjk_bigram")
        assert per == {"分散": [0], "散検": [1], "検索": [2]}
        assert length == 3

    def test_cjk_width_folding(self):
        # CJKWidthFilter analog: halfwidth katakana folds to fullwidth
        from lucene_solr_spark.analysis import cjk_bigram_analyze as c

        assert c("ｶﾅ") == c("カナ") == ["カナ"]
