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
