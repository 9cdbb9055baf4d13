"""Feature-extraction stage: deterministic regex/gazetteer tagger (actor pool).

Reference analogue: ``SpacyArticleVisitor`` + the cleaning visitors
(``am_combiner/features/common.py:65-298``).  The reference loads a spaCy
pipeline once per worker and extracts PERSON/ORG/GPE/LOC sets per article;
this engine's corpus is synthetic, so NER is replaced by a deterministic
regex + gazetteer tagger with the same output shape (per-kind value sets) —
dependency-light, but wired exactly like a model-holding stage would be:
state (compiled patterns, gazetteers) built once in ``__init__`` of a callable
class used with ``map_batches(FeatureTagger, concurrency=N)``.

Also derives blocking-key columns:

- ``name_tokens`` / ``name_key``: ascii-fold → lower → punct-split → len≥3 →
  sorted → '+'-join (reference ``features/common.py:282-292``),
- ``phonetic_key``: sorted unique Soundex codes (``features/common.py:295-298``),
- ``metaphone_key``: sorted unique simplified-Metaphone codes (north rule).

Field cleaning matches ``FieldCleaningVisitor`` (``features/common.py:139-174``):
entity-name tokens are removed from extracted person strings; values that
become empty are dropped.
"""

from __future__ import annotations

import re

import pyarrow as pa

from entity_resolution_ray import schema as S
from entity_resolution_ray.functions.phonetic import metaphone_keys, phonetic_keys
from entity_resolution_ray.functions.text import ascii_fold, name_keyword_tokens
from entity_resolution_ray.resources import GPE_GAZETTEER, LOC_GAZETTEER, ORG_SUFFIXES

MAX_CONTENT_LEN = 999_999  # reference truncates at this length


class FeatureTagger:
    """Callable-class stage: compile patterns once per actor, tag per batch."""

    def __init__(self):
        cap = r"[A-Z][a-zà-ÿ]+"
        self.org_re = re.compile(rf"\b({cap} (?:{'|'.join(ORG_SUFFIXES)}))\b")
        self.loc_re = re.compile(
            r"\b(" + "|".join(re.escape(x) for x in LOC_GAZETTEER) + r")\b"
        )
        self.gpe_re = re.compile(
            r"\b(" + "|".join(re.escape(x) for x in GPE_GAZETTEER) + r")\b"
        )
        self.person_re = re.compile(rf"\b({cap}) ({cap})\b")
        self.dob_re = re.compile(r"\bborn in (\d{4})\b")
        self.loc_set = set(LOC_GAZETTEER)
        self.org_suffixes = tuple(ORG_SUFFIXES)

    @staticmethod
    def _norm(value: str) -> str:
        return ascii_fold(value).lower()

    def _tag_one(self, content: str, entity_name: str) -> dict:
        content = content[:MAX_CONTENT_LEN]
        orgs = {self._norm(m) for m in self.org_re.findall(content)}
        locs = {self._norm(m) for m in self.loc_re.findall(content)}
        gpes = {self._norm(m) for m in self.gpe_re.findall(content)}
        name_toks = set(name_keyword_tokens(entity_name, min_len=1))
        persons = set()
        for first, last in self.person_re.findall(content):
            full = f"{first} {last}"
            if full in self.loc_set or last in self.org_suffixes:
                continue
            # FieldCleaning: strip entity-name tokens; drop if nothing remains
            kept = [
                t
                for t in (self._norm(first), self._norm(last))
                if t not in name_toks
            ]
            if kept:
                persons.add(" ".join(kept))
        dobs = sorted({int(y) for y in self.dob_re.findall(content)})
        return {
            "person_clean": sorted(persons),
            "org": sorted(orgs),
            "gpe": sorted(gpes),
            "loc": sorted(locs),
            "dob_years": dobs,
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        contents = batch[S.CONTENT].to_pylist()
        names = batch[S.ENTITY_NAME].to_pylist()
        cols = {
            "person_clean": [],
            "org": [],
            "gpe": [],
            "loc": [],
            "dob_years": [],
        }
        name_keys, phon_keys, meta_keys, name_tokens = [], [], [], []
        key_cache: dict[str, tuple] = {}
        for content, name in zip(contents, names):
            tagged = self._tag_one(content or "", name or "")
            for k, v in tagged.items():
                cols[k].append(v)
            keys = key_cache.get(name)
            if keys is None:
                toks = name_keyword_tokens(name or "")
                keys = (
                    toks,
                    "+".join(toks),
                    "+".join(phonetic_keys(toks)),
                    "+".join(metaphone_keys(toks)),
                )
                key_cache[name] = keys
            name_tokens.append(keys[0])
            name_keys.append(keys[1])
            phon_keys.append(keys[2])
            meta_keys.append(keys[3])
        out = batch
        out = out.append_column("name_tokens", pa.array(name_tokens, pa.list_(pa.string())))
        out = out.append_column(S.BLOCK_KEY, pa.array(name_keys, pa.string()))
        out = out.append_column("phonetic_key", pa.array(phon_keys, pa.string()))
        out = out.append_column("metaphone_key", pa.array(meta_keys, pa.string()))
        for k in ("person_clean", "org", "gpe", "loc"):
            out = out.append_column(k, pa.array(cols[k], pa.list_(pa.string())))
        out = out.append_column("dob_years", pa.array(cols["dob_years"], pa.list_(pa.int64())))
        return out


def extract_features(ds, concurrency: int | tuple = (1, 8), batch_size: int = 1024):
    """Run the tagger as an actor-pool map_batches stage."""
    return ds.map_batches(
        FeatureTagger,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class HeavyInitTagger(FeatureTagger):
    """FeatureTagger behind a deliberately expensive model load — the swap-in
    point for a REAL model-holding stage (reference: spaCy ``en_core_web_sm``
    loaded once per worker and batched through ``nlp.pipe``,
    ``am_combiner/features/common.py:65-136``; the pickled-sklearn
    vectorizers of ``features/vectorisation.py:18-66`` have the same shape).

    ``__init__`` allocates ``state_mb`` MiB and sleeps ``load_sec`` to stand
    in for deserializing a model artifact; with
    ``map_batches(HeavyInitTagger, concurrency=N)`` Ray constructs it exactly
    N times (once per actor) however many batches flow through — the
    amortization contract the engine's actor-pool seam
    (``ERConfig.use_actor_pools``) relies on.  ``counter_name`` (optional)
    names a Ray actor whose ``incr`` is called per construction, so a test
    can assert init-count == actor-count.
    """

    def __init__(self, state_mb: int = 64, load_sec: float = 0.5,
                 counter_name: str | None = None):
        import time

        import numpy as np

        super().__init__()
        if counter_name is not None:
            import ray

            ray.get(ray.get_actor(counter_name).incr.remote())
        time.sleep(load_sec)
        # the "model": page-touched heap state each batch reads through
        self._model = np.full((state_mb << 20) // 8, 1.0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # touch the model state so the allocation can't be optimized away
        assert float(self._model[:: 1 << 16].sum()) > 0
        return super().__call__(batch)


def add_domain_column(ds, url_col: str = S.DOC_ID, out_col: str = "domain"):
    """netloc of a URL-ish column (reference ``UrlDomainVisitor``,
    ``am_combiner/features/domain.py:6-26``)."""
    from entity_resolution_ray.functions.text import url_domain

    def fn(batch: pa.Table) -> pa.Table:
        domains = [url_domain(u or "") for u in batch[url_col].to_pylist()]
        return batch.append_column(out_col, pa.array(domains, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


def select_text_window(ds, neighbors: int = 1):
    """Selected-text span windows: keep the text spans that mention the
    entity name ± ``neighbors`` adjacent text spans, deduped, joined in offset
    order → ``selected_text`` column.  Reference ``ArticleSelectedTextVisitor``
    (``am_combiner/features/text_selector.py:6-80``) over sentences; here the
    sentence unit is the text-kind span.  Spans column is left untouched.
    """
    from entity_resolution_ray.functions.text import name_keyword_tokens, tokenize_words

    def fn(batch: pa.Table) -> pa.Table:
        spans_col = batch[S.SPANS].to_pylist()
        names = batch[S.ENTITY_NAME].to_pylist()
        out = []
        for spans, name in zip(spans_col, names):
            toks = set(name_keyword_tokens(name or "", min_len=1))
            texts = [s["text"] for s in spans if s["kind"] == S.SPAN_KIND_TEXT]
            hits = []
            for i, t in enumerate(texts):
                if toks and toks & set(tokenize_words(t)):
                    hits.append(i)
            keep: set[int] = set()
            for i in hits:
                for j in range(max(0, i - neighbors), min(len(texts), i + neighbors + 1)):
                    keep.add(j)
            out.append(" ".join(texts[i] for i in sorted(keep)))
        return batch.append_column("selected_text", pa.array(out, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")
