"""Term / keyword / meta-key extraction stages (SURVEY.md §2.2).

Reference analogues:

- ``ArticleTermVisitor`` (``am_combiner/features/terms.py:8-52``): pyate
  ``combo_basic`` term extraction, top-n=10, lowered.  pyate and its spaCy
  POS patterns are not available here, so the published ComboBasic score
  (Astrakhantsev, "ATR4S", 2016 — the formula pyate implements) runs over
  stopword-delimited token phrases instead of POS-matched noun phrases:
  ``score(t) = |t|·ln f(t) + α·e_t + β·e't`` with α=0.75 (superstring
  count) and β=0.1 (substring count), pyate's defaults.
- ``ArticleKeywordVisitor`` (``terms.py:55-101``): substring membership of a
  lowered keyword list in the lowered text — the keyword set broadcast once,
  fetched per worker.
- ``MetaKeyVisitor`` (``am_combiner/features/metadata_search.py:5-47``):
  lift one metadata key into a feature set.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from entity_resolution_ray.stages.textstats import EN_STOPWORDS

_TOKEN_RE = re.compile(r"[a-z0-9]+")
_STOPSET = set(EN_STOPWORDS)


def _candidate_phrases(text: str, max_len: int = 4) -> list[str]:
    """Stopword-delimited token runs → phrases of 1..max_len tokens."""
    toks = _TOKEN_RE.findall((text or "").lower())
    runs: list[list[str]] = []
    cur: list[str] = []
    for t in toks:
        if t in _STOPSET or len(t) < 3:
            if cur:
                runs.append(cur)
            cur = []
        else:
            cur.append(t)
    if cur:
        runs.append(cur)
    phrases = []
    for run in runs:
        for ln in range(1, min(max_len, len(run)) + 1):
            for s in range(len(run) - ln + 1):
                phrases.append(" ".join(run[s : s + ln]))
    return phrases


def combo_basic_terms(text: str, n: int = 10, alpha: float = 0.75,
                      beta: float = 0.1) -> list[str]:
    """Top-n terms by the ComboBasic score (deterministic; ties broken by
    term string ascending)."""
    phrases = _candidate_phrases(text)
    if not phrases:
        return []
    freq: dict[str, int] = {}
    for p in phrases:
        freq[p] = freq.get(p, 0) + 1
    terms = list(freq)
    supers = {t: 0 for t in terms}
    subs = {t: 0 for t in terms}
    for t in terms:
        for u in terms:
            if t is not u and t in u:
                supers[t] += 1
                subs[u] += 1
    scored = sorted(
        terms,
        key=lambda t: (
            -(len(t.split()) * np.log(freq[t] + 1e-12)
              + alpha * supers[t] + beta * subs[t]),
            t,
        ),
    )
    return scored[:n]


def article_terms(ds, text_col: str = "content", out_col: str = "terms",
                  n: int = 10):
    """Append top-n extracted terms per document (lowered)."""

    def fn(batch: pa.Table) -> pa.Table:
        out = [combo_basic_terms(t, n) for t in batch[text_col].to_pylist()]
        return batch.append_column(out_col, pa.array(out, pa.list_(pa.string())))

    return ds.map_batches(fn, batch_format="pyarrow")


def article_keywords(ds, keywords: list[str], text_col: str = "content",
                     out_col: str = "keywords"):
    """Substring membership of the keyword list in the lowered text; the set
    rides as a broadcast object fetched once per worker."""
    import ray

    ref = ray.put(sorted({str(k).strip().lower() for k in keywords}))

    def fn(batch: pa.Table) -> pa.Table:
        from entity_resolution_ray.stages.blocking import fetch_broadcast

        kws = fetch_broadcast(ref)
        out = []
        for t in batch[text_col].to_pylist():
            lowered = (t or "").lower()
            out.append([k for k in kws if k in lowered])
        return batch.append_column(out_col, pa.array(out, pa.list_(pa.string())))

    return ds.map_batches(fn, batch_format="pyarrow")


# public-knowledge occupation lexicon (reference ships occupations.csv)
DEFAULT_OCCUPATIONS = [
    "trader", "banker", "lawyer", "doctor", "engineer", "journalist",
    "politician", "minister", "director", "manager", "teacher", "professor",
    "consultant", "accountant", "architect", "economist", "diplomat",
    "scientist", "analyst", "broker", "investor", "executive", "officer",
    "chairman", "president", "senator", "judge", "prosecutor", "general",
    "colonel", "ambassador", "governor", "mayor", "farmer", "merchant",
]


def profession_column(ds, occupations: list[str] | None = None,
                      name_col: str = "entity_name", text_col: str = "content",
                      window: int = 12, out_col: str = "professions"):
    """Occupation extraction near the entity name.

    Reference ``ProfessionVisitor`` (``am_combiner/features/profession.py``)
    matches NSUBJ/APPOS dependency patterns against an occupation CSV; spaCy
    is unavailable here, so the documented stand-in is lexicon matching
    within a ±``window``-token neighborhood of any name occurrence — the
    same output column, a weaker pattern."""
    import ray

    occ = ray.put(frozenset((occupations or DEFAULT_OCCUPATIONS)))

    def fn(batch: pa.Table) -> pa.Table:
        from entity_resolution_ray.stages.blocking import fetch_broadcast

        lex = fetch_broadcast(occ)
        out = []
        for name, text in zip(batch[name_col].to_pylist(),
                              batch[text_col].to_pylist()):
            toks = _TOKEN_RE.findall((text or "").lower())
            name_toks = set(_TOKEN_RE.findall((name or "").lower()))
            hits: set[str] = set()
            for i, t in enumerate(toks):
                if t in name_toks:
                    lo, hi = max(0, i - window), min(len(toks), i + window + 1)
                    hits.update(w for w in toks[lo:hi] if w in lex)
            out.append(sorted(hits))
        return batch.append_column(out_col, pa.array(out, pa.list_(pa.string())))

    return ds.map_batches(fn, batch_format="pyarrow")


def graph_data(ds, feature_cols: list[str], id_col: str = "doc_id"):
    """Per-article viz graph as an edge-list table (doc → feature value),
    deduplicated — ``GraphDataVisitor`` (``am_combiner/features/
    graph_data.py:8-123``) emitted {nodes, links} dicts; the Dataset-native
    form is one (doc_id, node, feature) row per link."""

    def fn(batch: pa.Table) -> pa.Table:
        ids_out, nodes, feats = [], [], []
        ids = batch[id_col].to_pylist()
        for col in feature_cols:
            for d, vals in zip(ids, batch[col].to_pylist()):
                for v in dict.fromkeys(vals or []):  # per-doc dedup, ordered
                    ids_out.append(d)
                    nodes.append(str(v))
                    feats.append(col)
        return pa.table(
            {
                id_col: pa.array(ids_out, pa.string()),
                "node": pa.array(nodes, pa.string()),
                "feature": pa.array(feats, pa.string()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def meta_key_column(ds, key: str, out_col: str, meta_col: str = "meta"):
    """Lift one metadata key into a (possibly empty) single-value list
    column — ``MetaKeyVisitor`` over a ``map``/``struct`` metadata column."""

    def fn(batch: pa.Table) -> pa.Table:
        out = []
        for m in batch[meta_col].to_pylist():
            if m is None:
                out.append([])
                continue
            if isinstance(m, list):  # map<string,string> arrives as pairs
                m = dict(m)
            v = m.get(key)
            out.append([str(v)] if v is not None else [])
        return batch.append_column(out_col, pa.array(out, pa.list_(pa.string())))

    return ds.map_batches(fn, batch_format="pyarrow")
