"""Multi-field document model.

Lucene's core data model is a Document of many typed fields with
per-field postings, norms, stats and analyzers
(lucene/core/.../document/Document.java:41, index/FieldInfo.java,
index/Term.java — a term IS a (field, text) pair; per-field analyzers
solr/core/.../schema/IndexSchema.java:93).

Spark-first restatement: the term dictionary holds (field, term) pairs
encoded as a single sorted string key `field \\x1f term` — exactly the
flattened form Lucene's per-field FST forest represents. This keeps the
whole postings pipeline (FOR-128 codec, block metadata, parquet min/max
term pushdown, tiered merge) field-agnostic: a field-scoped query is a
prefix-range scan over the same sorted term column, which parquet
row-group stats prune just like a bare term lookup. Norms are per
(posting, field) by construction — each field is inverted with its own
field length — and per-field collection stats (docCount, sumTotalTermFreq)
live in the segment manifest (FieldInfos analog).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

# ASCII unit separator: cannot appear in any analyzer's token output
# (every tokenizer here splits on non-word chars) nor in field names.
FIELD_SEP = "\x1f"


def term_key(field: Optional[str], term: str) -> str:
    """Encode a (field, term) pair as the index's term-dict key."""
    return term if field is None else f"{field}{FIELD_SEP}{term}"


def split_term_key(key: str) -> Tuple[Optional[str], str]:
    i = key.find(FIELD_SEP)
    if i < 0:
        return None, key
    return key[:i], key[i + 1:]


@dataclass(frozen=True)
class FieldSpec:
    """One indexed field: name, source DataFrame column, analyzer.

    analyzer in {standard, simple, simple_stop, whitespace, keyword,
    shingle}: see analysis.analyze_field. The FieldType analog
    (document/FieldType.java) — positions always on (v1)."""

    name: str
    source_col: str
    analyzer: str = "standard"


def normalize_fields(fields) -> List[FieldSpec]:
    """Accept [FieldSpec...], [(name, col)...], [(name, col, analyzer)...]
    or {name: col}."""
    out: List[FieldSpec] = []
    if isinstance(fields, dict):
        fields = list(fields.items())
    for f in fields:
        if isinstance(f, FieldSpec):
            out.append(f)
        elif len(f) == 2:
            out.append(FieldSpec(f[0], f[1]))
        else:
            out.append(FieldSpec(f[0], f[1], f[2]))
    seen = set()
    for fs in out:
        if not fs.name.replace("_", "").isalnum():
            raise ValueError(f"field name must be [A-Za-z0-9_]+: {fs.name!r}")
        if fs.name in seen:
            raise ValueError(f"duplicate field {fs.name!r}")
        seen.add(fs.name)
    return out


def fdl_col(field: str) -> str:
    """doc_meta column holding this field's per-doc length."""
    return f"fdl_{field}"


def field_stats_from_meta_cols(columns) -> List[str]:
    """Field names recoverable from a doc_meta schema."""
    return [c[len("fdl_"):] for c in columns if c.startswith("fdl_")]
