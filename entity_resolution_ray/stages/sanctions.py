"""Sanction-record feature extractors: nested-struct parsing (SURVEY.md §2.4).

The reference's second document type is a sanctions record with nested JSON
(``data.names[].name``, ``births[].min_date/max_date``,
``locations[].country_code``, ``passports[].passport``,
``display_fields[].title/value``) consumed by a family of extractors
(``am_combiner/features/common.py:336-666``).  Here the record is a typed
Arrow ``struct``/``list<struct>`` row and every extractor is a vectorized
``map_batches`` stage appending list columns:

- alias keyword tokens, sorted-'+'-joined keys, Soundex phonetic tokens, and
  pairwise token bigrams (``SanctionAliasExtractor``, :336-387)
- the primary-name subset of the same (``SanctionPrimariesExtractor``, :390-416)
- YOB range / known-year / exact-DOB sets from min/max-date conventions
  (``SanctionBirthExtractor``, :419-496)
- location country codes, dropping "International" (``CountryCodeVisitor``,
  :499-528)
- normalized passport ids (``SanctionPassportVisitor``, :531-588)
- patronymic "ben <name>" / "s/o <name>" → phonetic key
  (``FathersNamesFromAlias``, :633-666)
"""

from __future__ import annotations

import re
from itertools import combinations

import numpy as np
import pyarrow as pa

from entity_resolution_ray.functions.phonetic import soundex
from entity_resolution_ray.functions.text import name_keyword_tokens

SANCTION_SCHEMA = pa.schema(
    [
        pa.field("sanction_id", pa.string()),
        pa.field("type", pa.string()),
        pa.field(
            "names",
            pa.list_(
                pa.struct(
                    [pa.field("name", pa.string()), pa.field("is_primary", pa.bool_())]
                )
            ),
        ),
        pa.field(
            "births",
            pa.list_(
                pa.struct(
                    [pa.field("min_year", pa.int32()), pa.field("max_year", pa.int32())]
                )
            ),
        ),
        pa.field(
            "locations",
            pa.list_(pa.struct([pa.field("country_code", pa.string())])),
        ),
        pa.field("passports", pa.list_(pa.string())),
        pa.field(
            "display_fields",
            pa.list_(
                pa.struct(
                    [pa.field("title", pa.string()), pa.field("value", pa.string())]
                )
            ),
        ),
    ]
)

_PATRONYMIC_RE = re.compile(r"\b(?:ben|bin|s/o)\s+([a-z]+)", re.IGNORECASE)
_PASSPORT_CLEAN_RE = re.compile(r"[^A-Z0-9]")


def _alias_features(names: list[dict], primaries_only: bool) -> dict:
    keywords: set[str] = set()
    keys: set[str] = set()
    phonetics: set[str] = set()
    bigrams: set[str] = set()
    fathers: set[str] = set()
    for item in names or []:
        if primaries_only and not item.get("is_primary"):
            continue
        name = item.get("name") or ""
        toks = name_keyword_tokens(name)
        if not toks:
            continue
        keywords.update(toks)
        keys.add("+".join(toks))
        phonetics.update(soundex(t) for t in toks)
        for a, b in combinations(sorted(toks), 2):
            bigrams.add(f"{a}+{b}")
        for m in _PATRONYMIC_RE.findall(name):
            code = soundex(m)
            if code:
                fathers.add(code)
    return {
        "kw": sorted(keywords),
        "keys": sorted(keys),
        "ph": sorted(p for p in phonetics if p),
        "bi": sorted(bigrams),
        "fathers": sorted(fathers),
    }


def extract_sanction_features(batch: pa.Table) -> pa.Table:
    rows_names = batch["names"].to_pylist()
    rows_births = batch["births"].to_pylist()
    rows_locs = batch["locations"].to_pylist()
    rows_pass = batch["passports"].to_pylist()

    alias_kw, alias_keys, alias_ph, alias_bi, fathers = [], [], [], [], []
    prim_kw, prim_keys = [], []
    yob_ranges, yob_known = [], []
    countries, passports = [], []

    for names, births, locs, pss in zip(
        rows_names, rows_births, rows_locs, rows_pass
    ):
        a = _alias_features(names, primaries_only=False)
        p = _alias_features(names, primaries_only=True)
        alias_kw.append(a["kw"])
        alias_keys.append(a["keys"])
        alias_ph.append(a["ph"])
        alias_bi.append(a["bi"])
        fathers.append(a["fathers"])
        prim_kw.append(p["kw"])
        prim_keys.append(p["keys"])

        rng: set[int] = set()
        known: set[int] = set()
        for b in births or []:
            lo, hi = b.get("min_year"), b.get("max_year")
            if lo is None or hi is None or hi < lo:
                continue
            rng.update(range(int(lo), int(hi) + 1))
            if lo == hi:
                known.add(int(lo))
        yob_ranges.append(sorted(rng))
        yob_known.append(sorted(known))

        cc = sorted(
            {
                (loc.get("country_code") or "").upper()
                for loc in locs or []
                if (loc.get("country_code") or "").lower() != "international"
                and loc.get("country_code")
            }
        )
        countries.append(cc)

        norm = sorted(
            {
                _PASSPORT_CLEAN_RE.sub("", (p_ or "").upper())
                for p_ in pss or []
                if _PASSPORT_CLEAN_RE.sub("", (p_ or "").upper())
            }
        )
        passports.append(norm)

    ls = pa.list_(pa.string())
    li = pa.list_(pa.int64())
    out = batch
    for name, vals, typ in [
        ("alias_keywords", alias_kw, ls),
        ("alias_keys", alias_keys, ls),
        ("alias_phonetic", alias_ph, ls),
        ("alias_bigrams", alias_bi, ls),
        ("fathers_phonetic", fathers, ls),
        ("primary_keywords", prim_kw, ls),
        ("primary_keys", prim_keys, ls),
        ("yob_range", yob_ranges, li),
        ("yob_known", yob_known, li),
        ("country_codes", countries, ls),
        ("passport_ids", passports, ls),
    ]:
        out = out.append_column(name, pa.array(vals, typ))
    return out


def sanction_features(ds):
    return ds.map_batches(extract_sanction_features, batch_format="pyarrow")


def synth_sanctions(n: int = 200, seed: int = 9) -> pa.Table:
    """Deterministic synthetic sanctions table (nested structs) for tests."""
    rng = np.random.default_rng(seed)
    firsts = ["ahmed", "maria", "ivan", "chen", "fatima", "jose", "olga", "omar"]
    lasts = ["rahman", "silva", "petrov", "wang", "hassan", "garcia", "volkov"]
    ccs = ["FR", "DE", "BR", "RU", "CN", "EG", "International"]
    rows = []
    for i in range(n):
        f = firsts[int(rng.integers(len(firsts)))]
        l = lasts[int(rng.integers(len(lasts)))]
        names = [{"name": f"{f.title()} {l.title()}", "is_primary": True}]
        if rng.random() < 0.5:
            names.append({"name": f"{f.title()} ben {lasts[int(rng.integers(len(lasts)))].title()}",
                          "is_primary": False})
        lo = 1940 + int(rng.integers(60))
        hi = lo + (0 if rng.random() < 0.6 else int(rng.integers(1, 6)))
        rows.append(
            {
                "sanction_id": f"s{i:05d}",
                "type": "person" if rng.random() < 0.8 else "organisation",
                "names": names,
                "births": [{"min_year": lo, "max_year": hi}],
                "locations": [{"country_code": ccs[int(rng.integers(len(ccs)))]}],
                "passports": [f"p-{int(rng.integers(10**8)):08d}"] if rng.random() < 0.4 else [],
                "display_fields": [{"title": "Occupation", "value": "trader"}],
            }
        )
    return pa.Table.from_pylist(rows, schema=SANCTION_SCHEMA)
