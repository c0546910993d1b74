"""Query AST + classic-syntax parser + rewrite.

A thin logical layer mirroring the reference's Query tree and rewrite
fixpoint (lucene/core/.../search/IndexSearcher.java:683-686,
BooleanQuery.java:211, MultiTermQuery.java:94-116). The relational
optimization (pushdown, pruning) is Catalyst's job; this layer only does
what Catalyst can't see: boolean flattening, single-clause inlining,
multi-term expansion against the term dictionary, analyzer application
at parse time (query-time analysis == index-time analysis,
QueryParserBase.getFieldQuery:466).

Grammar subset of queryparser/classic/QueryParser.jj: AND/OR/NOT, +/-,
grouping, boost `^f`, fuzzy `~n`, prefix `foo*`, wildcard `f?o*`,
regexp `/re/`, ranges `[a TO b]` / `{a TO b}`, phrases `"a b"~slop`.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from enum import Enum
from typing import List, Optional, Tuple


class Occur(Enum):
    MUST = "MUST"
    SHOULD = "SHOULD"
    MUST_NOT = "MUST_NOT"
    FILTER = "FILTER"  # match without scoring


@dataclass(frozen=True)
class Query:
    boost: float = 1.0


@dataclass(frozen=True)
class TermQuery(Query):
    """field=None targets the index's default (single) field; a named
    field scopes the term to that field's postings/norms/stats
    (index/Term.java — a term IS a (field, text) pair)."""

    term: str = ""
    field: Optional[str] = None


@dataclass(frozen=True)
class TermInSetQuery(Query):
    """Constant-score disjunction over N terms (TermInSetQuery.java:68)."""

    terms: Tuple[str, ...] = ()
    field: Optional[str] = None


@dataclass(frozen=True)
class SynonymQuery(Query):
    """Terms scored as one pseudo-term: summed tf, df = max over terms
    (SynonymQuery.java:47 uses max docFreq / max totalTermFreq)."""

    terms: Tuple[str, ...] = ()
    field: Optional[str] = None


@dataclass(frozen=True)
class PhraseQuery(Query):
    terms: Tuple[str, ...] = ()
    slop: int = 0
    field: Optional[str] = None


@dataclass(frozen=True)
class BooleanClause:
    occur: Occur
    query: Query


@dataclass(frozen=True)
class BooleanQuery(Query):
    clauses: Tuple[BooleanClause, ...] = ()
    min_should_match: int = 0


@dataclass(frozen=True)
class DisjunctionMaxQuery(Query):
    disjuncts: Tuple[Query, ...] = ()
    tie_breaker: float = 0.0


@dataclass(frozen=True)
class MatchAllDocsQuery(Query):
    pass


@dataclass(frozen=True)
class MatchNoDocsQuery(Query):
    pass


@dataclass(frozen=True)
class MultiTermQuery(Query):
    """Term-dictionary-expanding query; kind in
    {prefix, wildcard, regexp, fuzzy, range}.

    rewrite_method (MultiTermQuery.java:94,114,116):
      constant_score   — expand to TermInSetQuery, all matches score the
                         boost (CONSTANT_SCORE_REWRITE, the default)
      scoring_boolean  — expand to SHOULD TermQuery per matched term,
                         each scored with its own idf
                         (SCORING_BOOLEAN_REWRITE); fuzzy terms carry
                         the FuzzyTermsEnum similarity boost
                         1 - editDistance/min(|term|,|pattern|)
      top_terms_N      — scoring_boolean restricted to the N most
                         competitive terms (TopTermsRewrite size cap;
                         competitiveness = boost desc, then term asc)
    """

    kind: str = "prefix"
    pattern: str = ""
    upper: Optional[str] = None  # for range
    include_lower: bool = True
    include_upper: bool = True
    max_edits: int = 2  # for fuzzy
    field: Optional[str] = None
    rewrite_method: str = "constant_score"

    def matcher(self):
        """Return a predicate str -> bool over dictionary terms."""
        if self.kind == "prefix":
            p = self.pattern
            return lambda t: t.startswith(p)
        if self.kind == "wildcard":
            rx = re.compile(
                "".join(
                    ".*" if c == "*" else "." if c == "?" else re.escape(c)
                    for c in self.pattern
                )
                + r"\Z"
            )
            return lambda t: rx.match(t) is not None
        if self.kind == "regexp":
            rx = re.compile(self.pattern + r"\Z")
            return lambda t: rx.match(t) is not None
        if self.kind == "range":
            lo, hi = self.pattern, self.upper

            def in_range(t: str) -> bool:
                if lo is not None:
                    if t < lo or (t == lo and not self.include_lower):
                        return False
                if hi is not None:
                    if t > hi or (t == hi and not self.include_upper):
                        return False
                return True

            return in_range
        if self.kind == "fuzzy":
            p, n = self.pattern, self.max_edits
            return lambda t: levenshtein_within(p, t, n)
        raise ValueError(self.kind)


def levenshtein_distance(a: str, b: str) -> int:
    """Full edit distance (for the FuzzyTermsEnum similarity boost)."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return prev[-1]


def levenshtein_within(a: str, b: str, max_edits: int) -> bool:
    """Banded Levenshtein <= max_edits (FuzzyQuery.java:53 semantics on
    the distinct-terms table; the reference compiles an automaton — same
    accepted set)."""
    if abs(len(a) - len(b)) > max_edits:
        return False
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        lo = len(b) + 1
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            lo = min(lo, cur[j])
        if lo > max_edits:
            return False
        prev = cur
    return prev[-1] <= max_edits


# ---------------------------------------------------------------------------
# Rewrite (the IndexSearcher.rewrite fixpoint analog)
# ---------------------------------------------------------------------------

def rewrite(q: Query, dictionary_terms=None) -> Query:
    """Rewrite to fixpoint: flatten single-clause booleans, drop empty
    clauses, expand MultiTermQuery against the term dictionary
    (CONSTANT_SCORE rewrite -> TermInSetQuery, like
    MultiTermQuery.CONSTANT_SCORE_REWRITE)."""
    while True:
        q2 = _rewrite_once(q, dictionary_terms)
        if q2 == q:
            return q
        q = q2


def _rewrite_once(q: Query, dictionary_terms) -> Query:
    if isinstance(q, MultiTermQuery):
        if dictionary_terms is None:
            return q
        pred = q.matcher()
        matched = tuple(sorted(t for t in dictionary_terms if pred(t)))
        if not matched:
            return MatchNoDocsQuery(boost=q.boost)
        return TermInSetQuery(boost=q.boost, terms=matched, field=q.field)
    if isinstance(q, BooleanQuery):
        new_clauses: List[BooleanClause] = []
        for c in q.clauses:
            cq = _rewrite_once(c.query, dictionary_terms)
            if isinstance(cq, MatchNoDocsQuery) and c.occur in (Occur.SHOULD,):
                continue  # empty SHOULD vanishes
            if isinstance(cq, MatchNoDocsQuery) and c.occur == Occur.MUST_NOT:
                continue  # excluding nothing
            new_clauses.append(BooleanClause(c.occur, cq))
        # single positive SHOULD/MUST clause with no other clauses inlines
        if (
            len(new_clauses) == 1
            and new_clauses[0].occur in (Occur.MUST, Occur.SHOULD)
            and q.min_should_match <= 1
            and q.boost == 1.0
        ):
            return new_clauses[0].query
        return BooleanQuery(
            boost=q.boost, clauses=tuple(new_clauses), min_should_match=q.min_should_match
        )
    if isinstance(q, DisjunctionMaxQuery):
        return DisjunctionMaxQuery(
            boost=q.boost,
            disjuncts=tuple(_rewrite_once(d, dictionary_terms) for d in q.disjuncts),
            tie_breaker=q.tie_breaker,
        )
    return q


def with_field(q: Query, field: Optional[str]) -> Query:
    """Recursively scope every unscoped leaf to `field` — the
    `field:(a b)` group syntax (QueryParser.jj:289 field-prefixed
    Clause). Leaves that already carry a field keep it (inner override
    wins, like the reference parser's nested field switches)."""
    if field is None:
        return q
    if isinstance(q, (TermQuery, TermInSetQuery, SynonymQuery, PhraseQuery,
                      MultiTermQuery)):
        if q.field is None:
            from dataclasses import replace

            return replace(q, field=field)
        return q
    if isinstance(q, BooleanQuery):
        return BooleanQuery(
            boost=q.boost,
            clauses=tuple(
                BooleanClause(c.occur, with_field(c.query, field)) for c in q.clauses
            ),
            min_should_match=q.min_should_match,
        )
    if isinstance(q, DisjunctionMaxQuery):
        return DisjunctionMaxQuery(
            boost=q.boost,
            disjuncts=tuple(with_field(d, field) for d in q.disjuncts),
            tie_breaker=q.tie_breaker,
        )
    return q


def query_terms(q: Query) -> set:
    """All index terms a (rewritten) query touches."""
    if isinstance(q, TermQuery):
        return {q.term}
    if isinstance(q, (TermInSetQuery, SynonymQuery, PhraseQuery)):
        return set(q.terms)
    if isinstance(q, BooleanQuery):
        s = set()
        for c in q.clauses:
            s |= query_terms(c.query)
        return s
    if isinstance(q, DisjunctionMaxQuery):
        s = set()
        for d in q.disjuncts:
            s |= query_terms(d)
        return s
    return set()


# ---------------------------------------------------------------------------
# Parser (classic syntax subset). Query-time analysis applied per term.
# ---------------------------------------------------------------------------

_TOKEN_SPEC = [
    ("WS", r"\s+"),
    ("LPAREN", r"\("),
    ("RPAREN", r"\)"),
    ("AND", r"AND\b|&&"),
    ("OR", r"OR\b|\|\|"),
    ("NOT", r"NOT\b"),
    ("PLUS", r"\+"),
    ("MINUS", r"-"),
    ("PHRASE", r'"[^"]*"(~\d+)?'),
    ("REGEXP", r"/[^/]*/"),
    ("RANGE", r"[\[{][^\]}]*[\]}]"),
    ("TERM", r"[^\s()+\-\"/\[{]+"),  # may carry ^boost / ~fuzzy / wildcards
]
_LEXER = re.compile("|".join(f"(?P<{n}>{p})" for n, p in _TOKEN_SPEC))


def parse_query(qstring: str, analyzer=None) -> Query:
    """Parse classic query syntax -> Query AST.

    `analyzer`: callable str -> list[str]; applied to each term text
    (getFieldQuery:466 — analysis may drop the term entirely, e.g. a
    stopword clause analyzes to nothing and the clause disappears, or
    split one text into a multi-token phrase/synonym).
    """
    tokens = [
        (m.lastgroup, m.group(0)) for m in _LEXER.finditer(qstring) if m.lastgroup != "WS"
    ]
    pos = [0]

    def peek():
        return tokens[pos[0]] if pos[0] < len(tokens) else (None, None)

    def advance():
        t = tokens[pos[0]]
        pos[0] += 1
        return t

    def analyze_one(text: str) -> List[str]:
        if analyzer is None:
            return [text]
        return list(analyzer(text))

    def parse_boost_suffix(text: str) -> Tuple[str, float]:
        m = re.match(r"(.*)\^(\d+(?:\.\d+)?)$", text)
        if m:
            return m.group(1), float(m.group(2))
        return text, 1.0

    def parse_atom(field: Optional[str] = None) -> Optional[Tuple[Occur, Query]]:
        kind, text = peek()
        occur = Occur.SHOULD
        if kind in ("PLUS", "MINUS", "NOT"):
            advance()
            occur = Occur.MUST if kind == "PLUS" else Occur.MUST_NOT
            kind, text = peek()
        if kind is None:
            return None
        # `field:` prefix on a TERM token (QueryParser.jj:289): applies
        # to the rest of the token, or — when the token is just the
        # prefix — to the following phrase/range/regexp/group atom
        if kind == "TERM" and field is None:
            m = re.match(r"^([A-Za-z_][A-Za-z0-9_]*):(.*)$", text)
            if m:
                advance()
                fld, rest = m.group(1), m.group(2)
                if rest:
                    tokens.insert(pos[0], ("TERM", rest))
                nxt = parse_atom(field=fld)
                if nxt is None:
                    return None
                # occur prefix parsed here wins over the inner default
                inner_occur = nxt[0] if occur == Occur.SHOULD else occur
                return inner_occur, nxt[1]
        if kind == "LPAREN":
            advance()
            inner = parse_or()
            k, _ = peek()
            if k == "RPAREN":
                advance()
            if inner is None:
                return None
            return occur, with_field(inner, field)
        advance()
        if kind == "PHRASE":
            m = re.match(r'"([^"]*)"(?:~(\d+))?', text)
            body, slop = m.group(1), int(m.group(2) or 0)
            terms = analyze_one(body) if analyzer else body.split()
            if not terms:
                return None
            if len(terms) == 1:
                return occur, TermQuery(term=terms[0], field=field)
            return occur, PhraseQuery(terms=tuple(terms), slop=slop, field=field)
        if kind == "REGEXP":
            return occur, MultiTermQuery(kind="regexp", pattern=text[1:-1], field=field)
        if kind == "RANGE":
            inc_lo = text[0] == "["
            inc_hi = text[-1] == "]"
            m = re.match(r"[\[{]\s*(\S+)\s+TO\s+(\S+)\s*[\]}]", text)
            lo = None if m.group(1) == "*" else m.group(1)
            hi = None if m.group(2) == "*" else m.group(2)
            return occur, MultiTermQuery(
                kind="range",
                pattern=lo,
                upper=hi,
                include_lower=inc_lo,
                include_upper=inc_hi,
                field=field,
            )
        # TERM: may carry ^boost, ~fuzzy, wildcard chars
        text, boost = parse_boost_suffix(text)
        fuzzy = re.match(r"(.+)~(\d?)$", text)
        if fuzzy:
            base = fuzzy.group(1)
            edits = int(fuzzy.group(2) or 2)
            toks = analyze_one(base)
            if not toks:
                return None
            return occur, MultiTermQuery(kind="fuzzy", pattern=toks[0], max_edits=edits,
                                         boost=boost, field=field)
        if "*" in text or "?" in text:
            low = text.lower()
            if low.endswith("*") and "*" not in low[:-1] and "?" not in low:
                return occur, MultiTermQuery(kind="prefix", pattern=low[:-1],
                                             boost=boost, field=field)
            return occur, MultiTermQuery(kind="wildcard", pattern=low, boost=boost,
                                         field=field)
        toks = analyze_one(text)
        if not toks:
            return None  # stopword clause: analyzes to nothing
        if len(toks) == 1:
            return occur, TermQuery(term=toks[0], boost=boost, field=field)
        return occur, PhraseQuery(terms=tuple(toks), boost=boost, field=field)

    def parse_and() -> Optional[Query]:
        clauses: List[Tuple[Occur, Query]] = []
        first = parse_atom()
        if first:
            clauses.append(first)
        while True:
            kind, _ = peek()
            if kind == "AND":
                advance()
                # AND promotes both sides to MUST
                if clauses and clauses[-1][0] == Occur.SHOULD:
                    clauses[-1] = (Occur.MUST, clauses[-1][1])
                nxt = parse_atom()
                if nxt:
                    occur = Occur.MUST if nxt[0] == Occur.SHOULD else nxt[0]
                    clauses.append((occur, nxt[1]))
            elif kind in ("TERM", "PHRASE", "LPAREN", "PLUS", "MINUS", "NOT", "REGEXP", "RANGE"):
                nxt = parse_atom()
                if nxt:
                    clauses.append(nxt)
            else:
                break
        if not clauses:
            return None
        if len(clauses) == 1 and clauses[0][0] == Occur.SHOULD:
            return clauses[0][1]
        return BooleanQuery(
            clauses=tuple(BooleanClause(o, q) for o, q in clauses)
        )

    def parse_or() -> Optional[Query]:
        left = parse_and()
        disjuncts = [left] if left is not None else []
        while peek()[0] == "OR":
            advance()
            nxt = parse_and()
            if nxt is not None:
                disjuncts.append(nxt)
        if not disjuncts:
            return None
        if len(disjuncts) == 1:
            return disjuncts[0]
        return BooleanQuery(
            clauses=tuple(BooleanClause(Occur.SHOULD, d) for d in disjuncts)
        )

    q = parse_or()
    return q if q is not None else MatchNoDocsQuery()
