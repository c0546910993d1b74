"""Brute-force pandas oracle engine — the rank-identity reference.

Literal, exhaustive implementation of the reference scoring semantics
(BM25Similarity.java float32 math; HitQueue.java:76-81 tie-break: score
desc then docID asc; Boolean2ScorerSupplier.java occur buckets;
DisjunctionSumScorer double accumulation cast to float). Every Spark
engine result is asserted rank-identical against this oracle, mirroring
the reference's CheckHits cross-check strategy
(test-framework/.../search/CheckHits.java:96).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd

from . import bm25
from .analysis import simple_analyze, standard_analyze
from .queryast import (
    BooleanQuery,
    DisjunctionMaxQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    MultiTermQuery,
    Occur,
    PhraseQuery,
    Query,
    SynonymQuery,
    TermInSetQuery,
    TermQuery,
    rewrite,
)
from .smallfloat import int_to_byte4


class OracleIndex:
    """In-memory exhaustive index over a small corpus."""

    def __init__(self, docs: pd.DataFrame, analyzer: str = "standard",
                 norms: str = "byte"):
        """docs: DataFrame with a `content` column, rows already in
        canonical docID order (docID = positional index).
        norms: 'byte' (Lucene intToByte4 quantization) or 'exact'."""
        self.analyzer = analyzer
        self.norms_mode = norms
        contents = docs["content"].tolist()
        self.doc_count = len(contents)
        self.postings: Dict[str, Dict[int, int]] = {}
        self.positions: Dict[str, Dict[int, List[int]]] = {}
        lengths = np.zeros(self.doc_count, dtype=np.int64)
        for doc_id, text in enumerate(contents):
            if analyzer == "standard":
                toks = standard_analyze(text or "")
            else:
                toks = [(t, p) for p, t in enumerate(simple_analyze(text or ""))]
            lengths[doc_id] = len(toks)
            for term, pos in toks:
                self.postings.setdefault(term, {})
                self.postings[term][doc_id] = self.postings[term].get(doc_id, 0) + 1
                self.positions.setdefault(term, {}).setdefault(doc_id, []).append(pos)
        self.lengths = lengths
        if norms == "byte":
            self.norm_bytes = np.array(
                [int_to_byte4(int(x)) for x in lengths], dtype=np.int64
            )
        else:
            self.norm_bytes = None
        # collection stats: sumTotalTermFreq = sum of field lengths
        self.sum_ttf = int(lengths.sum())
        self.df = {t: len(d) for t, d in self.postings.items()}
        self.ttf = {t: sum(d.values()) for t, d in self.postings.items()}

    # -- scoring -----------------------------------------------------------

    def term_weight(self, term: str, boost: float) -> bm25.TermWeight:
        return bm25.make_term_weight(
            term, self.df.get(term, 0), self.doc_count, self.sum_ttf, boost
        )

    def _score_postings(
        self, weight: bm25.TermWeight, doc_ids: np.ndarray, tfs: np.ndarray
    ) -> np.ndarray:
        if self.norms_mode == "byte":
            nb = self.norm_bytes[doc_ids]
            return weight.score(tfs, nb)
        # exact norms: norm = k1*((1-b) + b*dl/avgdl) in float32
        avgdl = bm25.avg_field_length(self.sum_ttf, self.doc_count)
        dl = self.lengths[doc_ids].astype(np.float32)
        norm = (
            bm25.K1
            * ((np.float32(1.0) - bm25.B) + (bm25.B * dl) / np.float32(avgdl))
        ).astype(np.float32)
        freq = tfs.astype(np.float32)
        return ((weight.weight_value * freq) / (freq + norm)).astype(np.float32)

    def _term_postings(self, term: str) -> Tuple[np.ndarray, np.ndarray]:
        plist = self.postings.get(term, {})
        if not plist:
            return np.array([], dtype=np.int64), np.array([], dtype=np.int64)
        items = sorted(plist.items())
        return (
            np.array([d for d, _ in items], dtype=np.int64),
            np.array([tf for _, tf in items], dtype=np.int64),
        )

    # -- evaluation: returns (doc_ids sorted asc, float32 scores) ----------

    def evaluate(self, q: Query, boost: float = 1.0) -> Tuple[np.ndarray, np.ndarray]:
        q = rewrite(q, dictionary_terms=self.postings.keys())
        return self._eval(q, boost)

    def _eval(self, q: Query, boost: float) -> Tuple[np.ndarray, np.ndarray]:
        b = boost * q.boost
        if isinstance(q, MatchNoDocsQuery):
            return np.array([], dtype=np.int64), np.array([], dtype=np.float32)
        if isinstance(q, MatchAllDocsQuery):
            ids = np.arange(self.doc_count, dtype=np.int64)
            return ids, np.full(self.doc_count, np.float32(b), dtype=np.float32)
        if isinstance(q, TermQuery):
            ids, tfs = self._term_postings(q.term)
            if len(ids) == 0:
                return ids, np.array([], dtype=np.float32)
            w = self.term_weight(q.term, b)
            return ids, self._score_postings(w, ids, tfs)
        if isinstance(q, TermInSetQuery):
            docs = set()
            for t in q.terms:
                docs.update(self.postings.get(t, {}).keys())
            ids = np.array(sorted(docs), dtype=np.int64)
            return ids, np.full(len(ids), np.float32(b), dtype=np.float32)
        if isinstance(q, SynonymQuery):
            # SynonymQuery.java:47: blended stats — df = max df, ttf = max
            # ttf over synonyms; tf = per-doc sum across synonyms.
            tf_by_doc: Dict[int, int] = {}
            for t in q.terms:
                for d, tf in self.postings.get(t, {}).items():
                    tf_by_doc[d] = tf_by_doc.get(d, 0) + tf
            if not tf_by_doc:
                return np.array([], dtype=np.int64), np.array([], dtype=np.float32)
            df = max(self.df.get(t, 0) for t in q.terms)
            w = bm25.make_term_weight("|".join(q.terms), df, self.doc_count, self.sum_ttf, b)
            items = sorted(tf_by_doc.items())
            ids = np.array([d for d, _ in items], dtype=np.int64)
            tfs = np.array([tf for _, tf in items], dtype=np.int64)
            return ids, self._score_postings(w, ids, tfs)
        if isinstance(q, PhraseQuery):
            return self._eval_phrase(q, b)
        if isinstance(q, DisjunctionMaxQuery):
            per: Dict[int, List[np.float32]] = {}
            for d in q.disjuncts:
                ids, scores = self._eval(d, b)
                for i, s in zip(ids, scores):
                    per.setdefault(int(i), []).append(s)
            ids = np.array(sorted(per.keys()), dtype=np.int64)
            out = np.empty(len(ids), dtype=np.float32)
            for k, i in enumerate(ids):
                ss = per[int(i)]
                mx = max(ss)
                # DisjunctionMaxScorer: max + tieBreaker * (sum - max), double acc
                out[k] = np.float32(
                    float(mx) + q.tie_breaker * (float(np.sum(np.asarray(ss, dtype=np.float64))) - float(mx))
                )
            return ids, out
        if isinstance(q, BooleanQuery):
            return self._eval_boolean(q, b)
        if isinstance(q, MultiTermQuery):
            raise ValueError("MultiTermQuery must be rewritten before eval")
        raise TypeError(f"unsupported query: {q!r}")

    def _eval_phrase(self, q: PhraseQuery, boost: float) -> Tuple[np.ndarray, np.ndarray]:
        """Exact phrase (slop=0): tf = #occurrences of consecutive
        positions; idf = sum of per-term idfs (BM25 idfExplain array)."""
        if not q.terms:
            return np.array([], dtype=np.int64), np.array([], dtype=np.float32)
        cand: Optional[set] = None
        for t in q.terms:
            docs = set(self.positions.get(t, {}).keys())
            cand = docs if cand is None else (cand & docs)
        ids_list, tf_list = [], []
        for d in sorted(cand or ()):
            first = self.positions[q.terms[0]][d]
            count = 0
            for p in first:
                if all((p + k) in self.positions[q.terms[k]].get(d, []) for k in range(1, len(q.terms))):
                    count += 1
            if count > 0:
                ids_list.append(d)
                tf_list.append(count)
        if not ids_list:
            return np.array([], dtype=np.int64), np.array([], dtype=np.float32)
        # sum idfs in double, cast float (idfExplain(termStats[]))
        idf_sum = np.float32(
            float(np.sum(np.array([
                float(bm25.idf(self.df.get(t, 0), self.doc_count)) for t in q.terms
            ], dtype=np.float64)))
        )
        weight = np.float32(idf_sum * np.float32(boost))
        wv = np.float32(weight * (bm25.K1 + np.float32(1.0)))
        avgdl = bm25.avg_field_length(self.sum_ttf, self.doc_count)
        w = bm25.TermWeight(" ".join(q.terms), wv, bm25.norm_cache(avgdl))
        ids = np.array(ids_list, dtype=np.int64)
        tfs = np.array(tf_list, dtype=np.int64)
        return ids, self._score_postings(w, ids, tfs)

    def _eval_boolean(self, q: BooleanQuery, boost: float) -> Tuple[np.ndarray, np.ndarray]:
        musts, filters, shoulds, nots = [], [], [], []
        for c in q.clauses:
            {Occur.MUST: musts, Occur.FILTER: filters,
             Occur.SHOULD: shoulds, Occur.MUST_NOT: nots}[c.occur].append(c.query)

        scored: Dict[int, List[float]] = {}
        match_must: Dict[int, int] = {}
        match_should: Dict[int, int] = {}

        for sub in musts:
            ids, scores = self._eval(sub, boost)
            for i, s in zip(ids, scores):
                scored.setdefault(int(i), []).append(float(s))
                match_must[int(i)] = match_must.get(int(i), 0) + 1
        filter_sets = [set(int(x) for x in self._eval(sub, boost)[0]) for sub in filters]
        for sub in shoulds:
            ids, scores = self._eval(sub, boost)
            for i, s in zip(ids, scores):
                scored.setdefault(int(i), []).append(float(s))
                match_should[int(i)] = match_should.get(int(i), 0) + 1
        not_docs: set = set()
        for sub in nots:
            not_docs.update(int(x) for x in self._eval(sub, boost)[0])

        mm = q.min_should_match
        has_required = bool(musts) or bool(filters)
        if not has_required and shoulds:
            mm = max(mm, 1)

        out_ids, out_scores = [], []
        universe = set(scored.keys())
        for fs in filter_sets:
            universe = universe & fs if (musts or shoulds) else fs
        if not musts and not shoulds and filters:
            # pure-filter query: constant score 0 docs
            universe = set.intersection(*filter_sets) if filter_sets else set()
            for d in sorted(universe - not_docs):
                out_ids.append(d)
                out_scores.append(np.float32(0.0))
            return np.array(out_ids, dtype=np.int64), np.array(out_scores, dtype=np.float32)
        for d in sorted(universe):
            if d in not_docs:
                continue
            if match_must.get(d, 0) != len(musts):
                continue
            if match_should.get(d, 0) < mm:
                continue
            # double accumulation, cast to float32 (DisjunctionSumScorer)
            out_ids.append(d)
            out_scores.append(np.float32(float(np.sum(np.array(scored[d], dtype=np.float64)))))
        return np.array(out_ids, dtype=np.int64), np.array(out_scores, dtype=np.float32)

    # -- top-k --------------------------------------------------------------

    def top_k(self, q: Query, k: int) -> pd.DataFrame:
        """(rank, doc_id, score) — score desc, docID asc (HitQueue.java:76-81)."""
        ids, scores = self.evaluate(q)
        order = np.lexsort((ids, -scores.astype(np.float64)))
        top = order[:k]
        return pd.DataFrame(
            {
                "rank": np.arange(1, len(top) + 1),
                "doc_id": ids[top],
                "score": scores[top],
            }
        )
