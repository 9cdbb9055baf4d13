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
        pa.field(
            "nationalities",
            pa.list_(pa.struct([pa.field("country_code", pa.string())])),
        ),
        pa.field(
            "aml_types",
            pa.list_(pa.struct([pa.field("aml_type", pa.string())])),
        ),
        pa.field(
            "addresses",
            pa.list_(
                pa.struct(
                    [
                        pa.field("original_address", pa.string()),
                        pa.field("country", pa.string()),
                    ]
                )
            ),
        ),
        pa.field("occupations", pa.list_(pa.string())),
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


# --- organisation / term / summary extractors ------------------------------
_SPLIT_RE = re.compile(r"(,|/|\)|\(|\.|-|;|`|')")
_ORG_ALIAS_STOPWORDS = {"ltd", "llc", "lcc", "inc", "corp", "corporation", "company"}
_EXCEPTION_CODE = "1001"

_ADDRESS_STOPWORDS = {
    "city", "country", "street", "road", "avenue", "town", "junction",
    "alley", "business", "village", "box", "mailbox", "post", "square",
    "floor", "building", "former", "center", "centre", "central", "park",
    "branch", "house", "area", "apartment", "flat", "lane", "coast",
    "suite", "region", "district", "company", "registration", "federation",
    "republic", "kingdom", "democratic", "highway", "room", "office",
    "block", "number", "industrial", "united", "island", "islands",
    "isles", "code",
}

# JsonSummarizer display-field whitelist (``vectorisation.py:253-324``);
# trimmed to the titles the synthetic corpus can carry — extend freely
JSON_SUMMARY_TITLES = {
    "Amended On", "Designation Act", "Function", "Other Information",
    "Program", "Related Url", "Designation Date", "Issuing Authority",
    "Listing Id", "Title", "Listing Origin", "Reason", "Sanction Type",
    "Additional", "Other Info", "Citizenship", "List Id", "Address",
    "Identification Number", "List Name", "Enforcement Agency",
    "Legal Basis", "Position", "Regime", "Removal Date", "Remark", "Role",
    "Registration Number", "Zip Code", "Height", "National Id",
    "Description", "Comments", "Source", "Birthplace", "Programme",
}


def _verify_org_code(tok: str) -> str | None:
    """Registration-number token rule (``organisation_visitors.py:31-37``)."""
    if len(tok) >= 5 and tok[2:].isnumeric() and not tok.endswith(_EXCEPTION_CODE):
        return tok
    return None


def _verify_year(tok: str) -> int | None:
    if len(tok) == 4 and tok.isnumeric():
        return int(tok)
    return None


def org_alias_keyword_tokens(name: str) -> list[str]:
    """Org alias → '+'-joined sorted token keys with bracket expansion and
    a.k.a. splitting (``OrganisationAliasVisitor._convert_to_keyword_tokens``,
    ``organisation_visitors.py:87-120``)."""
    from entity_resolution_ray.functions.text import ascii_fold

    out: list[str] = []
    name = ascii_fold(name).lower()
    name = re.sub(r"({|\[)", "(", name)
    name = re.sub(r"(}|])", ")", name)
    if "(" in name and ")" in name.split("(", 1)[1]:
        str_inx = name.index("(")
        end_inx = str_inx + name.split("(", 1)[1].index(")") + 2
        out += org_alias_keyword_tokens(name[:str_inx] + name[end_inx:])
    if "a.k.a." in name:
        inx = name.index("a.k.a.")
        out += org_alias_keyword_tokens(name[:inx])
        out += org_alias_keyword_tokens(name[inx + 6:])
    name = re.sub(r"&", " and ", name)
    toks = [
        t for t in _SPLIT_RE.sub(" ", name).split(" ")
        if t.isnumeric() or (len(t) > 2 and t not in _ORG_ALIAS_STOPWORDS)
    ]
    if toks:
        out.append("+".join(sorted(toks)))
    return out


def _address_tokens(texts: list[str]) -> list[str]:
    toks: set[str] = set()
    for address in texts:
        for t in _SPLIT_RE.sub(" ", address or "").split(" "):
            tl = t.lower()
            if (t.isnumeric() or len(t) > 3) and tl not in _ADDRESS_STOPWORDS:
                toks.add(tl)
    return sorted(toks)


def extract_org_features(batch: pa.Table) -> pa.Table:
    """Organisation identifiers / alias keys / address features + nationality
    and aml-type sets + display-field summary + term lift.

    Reference: ``OrganisationIdentifiersVisitor`` / ``OrganisationAliasVisitor``
    / ``AddressVisitor`` (``organisation_visitors.py:25-277``, translation
    excluded — network), ``NationalityVisitor`` / ``AmlTypeVisitor``
    (``common.py:591-630``), ``JsonSummarizer`` (``vectorisation.py:247-339``),
    ``SanctionTermVisitor`` with ``bypass_translation`` (``sanction_term.py:14-58``).
    """
    from entity_resolution_ray.stages.geography import GeoResolver

    resolver = GeoResolver()
    rows_names = batch["names"].to_pylist()
    rows_disp = batch["display_fields"].to_pylist()
    rows_nat = (
        batch["nationalities"].to_pylist()
        if "nationalities" in batch.column_names else [None] * len(batch)
    )
    rows_aml = (
        batch["aml_types"].to_pylist()
        if "aml_types" in batch.column_names else [None] * len(batch)
    )
    rows_addr = (
        batch["addresses"].to_pylist()
        if "addresses" in batch.column_names else [None] * len(batch)
    )
    rows_occ = (
        batch["occupations"].to_pylist()
        if "occupations" in batch.column_names else [None] * len(batch)
    )

    org_ids, desig_years, org_alias_keys = [], [], []
    nat_codes, amls = [], []
    addr_tokens, addr_countries = [], []
    full_texts, sanction_texts = [], []

    for names, disp, nats, aml, addrs, occs in zip(
        rows_names, rows_disp, rows_nat, rows_aml, rows_addr, rows_occ
    ):
        ids: set[str] = set()
        years: set[int] = set()
        for item in disp or []:
            title = item.get("title") or ""
            value = item.get("value") or ""
            toks = _SPLIT_RE.sub(" ", value).split(" ")
            if title == "Registration Number":
                ids.update(t for t in (_verify_org_code(tk) for tk in toks) if t)
            elif title == "Designation Date":
                years.update(y for y in (_verify_year(tk) for tk in toks) if y)
        org_ids.append(sorted(ids))
        desig_years.append(sorted(years))

        keys: list[str] = []
        for item in names or []:
            keys += org_alias_keyword_tokens(item.get("name") or "")
        org_alias_keys.append(sorted(set(keys)))

        nat_codes.append(
            sorted(
                {
                    (n.get("country_code") or "").upper()
                    for n in nats or [] if n.get("country_code")
                }
            )
        )
        amls.append(
            sorted({a.get("aml_type") for a in aml or [] if a.get("aml_type")})
        )

        texts = [a.get("original_address") for a in addrs or [] if a.get("original_address")]
        texts += [
            item.get("value") for item in disp or []
            if (item.get("title") or "").lower() == "address" and item.get("value")
        ]
        addr_tokens.append(_address_tokens(texts))
        countries: set[str] = set()
        for a in addrs or []:
            c = a.get("country")
            if c:
                res = resolver.resolve(c)
                if res:
                    countries.add(res)
        for t in texts:
            for part in re.sub(r"(,|\.|:)", ";", t).split(";"):
                res = resolver.resolve(part.strip())
                if res:
                    countries.add(res)
        addr_countries.append(sorted(countries))

        # JsonSummarizer: whitelist-title values joined with "."
        full_texts.append(
            ".".join(
                item.get("value") or "" for item in disp or []
                if item.get("title") in JSON_SUMMARY_TITLES
            )
        )
        # FullSanctionTextVectoriser text: every display value + occupations
        parts = [f"{item.get('value') or ''}." for item in disp or []]
        parts += [f"{o}." for o in occs or []]
        sanction_texts.append(" ".join(parts))

    ls = pa.list_(pa.string())
    out = batch
    for name, vals, typ in [
        ("org_ids", org_ids, ls),
        ("designation_years", desig_years, pa.list_(pa.int64())),
        ("org_alias_keys", org_alias_keys, ls),
        ("nationality_codes", nat_codes, ls),
        ("aml_type_set", amls, ls),
        ("address_tokens", addr_tokens, ls),
        ("address_countries", addr_countries, ls),
        ("full_text_summary", full_texts, pa.string()),
        ("sanction_text", sanction_texts, pa.string()),
    ]:
        out = out.append_column(name, pa.array(vals, typ))
    return out


def org_features(ds):
    return ds.map_batches(extract_org_features, batch_format="pyarrow")


def sanction_terms(ds, titles: list[str]):
    """SanctionTermVisitor (bypass_translation): lift display fields whose
    normalized title (``UPPER_WITH_UNDERSCORES``) is requested into one list
    column per title (``sanction_term.py:14-58``; GoogleTranslator excluded —
    no network in this engine)."""
    wanted = {t.upper().replace(" ", "_"): t for t in titles}

    def fn(batch: pa.Table) -> pa.Table:
        per_title: dict[str, list] = {t: [] for t in wanted}
        for disp in batch["display_fields"].to_pylist():
            row: dict[str, list] = {t: [] for t in wanted}
            for item in disp or []:
                norm = (item.get("title") or "").replace(" ", "_").upper()
                if norm in row and item.get("value"):
                    row[norm].append(item["value"][:2000])
            for t in wanted:
                per_title[t].append(sorted(set(row[t])))
        out = batch
        for t in wanted:
            out = out.append_column(
                f"term_{t.lower()}", pa.array(per_title[t], pa.list_(pa.string()))
            )
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def sanction_term_tagger(ds, source_cols: list[str],
                         prefix: str = "term_tagged_"):
    """``SanctionTermSpacyVisitor`` (``sanction_term.py:61-81``): run the NER
    tagger over the ", "-joined values of each source feature column and
    lift the tags into ``{prefix}{person|org|gpe|loc}`` columns.  The spaCy
    pipeline becomes the deterministic regex/gazetteer tagger this engine
    uses throughout (held once per worker — actor-``__init__`` pattern)."""

    def fn(batch: pa.Table) -> pa.Table:
        from entity_resolution_ray.pipelines.er import _worker_singleton
        from entity_resolution_ray.stages.features import FeatureTagger

        tagger = _worker_singleton(FeatureTagger)
        per_kind: dict[str, list] = {k: [] for k in ("person", "org", "gpe", "loc")}
        cols = {c: batch[c].to_pylist() for c in source_cols}
        for i in range(len(batch)):
            joined = ", ".join(
                str(v) for c in source_cols for v in (cols[c][i] or [])
            )
            tags = tagger._tag_one(joined, "")
            per_kind["person"].append(tags["person_clean"])
            per_kind["org"].append(tags["org"])
            per_kind["gpe"].append(tags["gpe"])
            per_kind["loc"].append(tags["loc"])
        out = batch
        for k, vals in per_kind.items():
            out = out.append_column(
                f"{prefix}{k}", pa.array(vals, pa.list_(pa.string()))
            )
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def sanction_text_vectors(ds, dim: int = 1 << 18):
    """FullSanctionTextVectoriser analogue: hashed TF over the display-field
    + occupations text (``vectorisation.py:69-128``; the pickled-sklearn
    artifact becomes the deterministic hashing vectorizer, fitted nowhere,
    loaded once per worker)."""

    def fn(batch: pa.Table) -> pa.Table:
        from entity_resolution_ray.functions.vectorize import HashedVectorizer
        from entity_resolution_ray.pipelines.er import _worker_singleton

        vec = _worker_singleton(HashedVectorizer, dim=dim)
        idx_rows, cnt_rows = vec.transform_sparse(batch["sanction_text"].to_pylist())
        return batch.append_column(
            "sanction_tf_idx",
            pa.array([r.tolist() for r in idx_rows], pa.list_(pa.int64())),
        ).append_column(
            "sanction_tf_cnt",
            pa.array([r.tolist() for r in cnt_rows], pa.list_(pa.float32())),
        )

    return ds.map_batches(fn, batch_format="pyarrow")


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
        is_org = rng.random() >= 0.8
        disp = [{"title": "Occupation", "value": "trader"}]
        if is_org:
            disp.append(
                {"title": "Registration Number",
                 "value": f"RN{10000 + int(rng.integers(90000))}"}
            )
            disp.append(
                {"title": "Designation Date",
                 "value": f"{1990 + int(rng.integers(30))}-01-01"}
            )
        disp.append({"title": "Reason", "value": "listed by authority"})
        disp.append({"title": "Program", "value": f"program-{int(rng.integers(5))}"})
        rows.append(
            {
                "sanction_id": f"s{i:05d}",
                "type": "organisation" if is_org else "person",
                "names": names,
                "births": [{"min_year": lo, "max_year": hi}],
                "locations": [{"country_code": ccs[int(rng.integers(len(ccs)))]}],
                "passports": [f"p-{int(rng.integers(10**8)):08d}"] if rng.random() < 0.4 else [],
                "display_fields": disp,
                "nationalities": [{"country_code": ccs[int(rng.integers(len(ccs) - 1))]}],
                "aml_types": [{"aml_type": "sanction" if rng.random() < 0.7 else "pep"}],
                "addresses": [
                    {"original_address": f"{int(rng.integers(200))} Harbor Street, Lisbon",
                     "country": "Portugal"}
                ] if rng.random() < 0.5 else [],
                "occupations": ["trader"] if not is_org else [],
            }
        )
    return pa.Table.from_pylist(rows, schema=SANCTION_SCHEMA)


def synth_overlay_profiles(sanctions: pa.Table, seed: int = 13,
                           group_size: int = 3,
                           coverage: float = 0.7) -> pa.Table:
    """Deterministic synthetic manually-unified profiles over a sanctions
    table: consecutive runs of ``group_size`` sanction ids unify under one
    profile; ~``coverage`` of the groups actually have an overlay (the rest
    stay un-unified, like mentions outside any manual override)."""
    rng = np.random.default_rng(seed)
    ids = sanctions.column("sanction_id").to_pylist()
    rows = []
    for g in range(0, len(ids), group_size):
        if rng.random() >= coverage:
            continue
        rows.append(
            {"profile_id": f"pp{g // group_size:05d}",
             "source_entity_ids": ids[g:g + group_size]}
        )
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [pa.field("profile_id", pa.string()),
             pa.field("source_entity_ids", pa.list_(pa.string()))]
        ),
    )


def manual_overlay_ground_truth(mentions_ds, profiles_ds,
                                test_prop: float = 0.2,
                                valid_prop: float = 0.2,
                                entity_types: list[str] | None = None,
                                id_col: str = "sanction_id",
                                type_col: str = "type",
                                seed: int = 0):
    """``ManualOverlayUnifyGroundTruth`` assembly (reference
    ``am_combiner/utils/sanction_data.py:22-184``):

    - overlay profiles ``(profile_id, source_entity_ids)`` exploded to an
      id → profile mapping (``_enrich_sm_data``'s sm_to_profile dict),
    - mentions left-joined to their profile; ``ground_truth`` = dense code of
      ``profile_id`` in sorted order, unmatched → -1 (the reference's
      sort + ``astype("category").cat.codes``),
    - entity type (null → ``"undefined"``), optional ``entity_types`` filter,
      ``blocking_field`` = type (``sanction_data.py:142-151``),
    - deterministic per-PROFILE train/test/valid split with the engine's
      stable-hash protocol (the reference's seeded sklearn split,
      ``sanction_data.py:109-125``; hash split so reruns and workers agree
      without shipping RNG state).

    The profile table is manual-override-sized (human-curated, bounded), so
    its explode + the code map are broadcast; mentions stream through one
    ``map_batches``.  Returns (id, profile_id, ground_truth, type,
    blocking_field, split).
    """
    import pandas as pd

    import ray

    from entity_resolution_ray.utils.hashing import stable_hash64

    prof_df = profiles_ds.to_pandas() if hasattr(profiles_ds, "to_pandas") else profiles_ds
    sm_to_profile: dict[str, str] = {}
    for p, sms in zip(prof_df["profile_id"], prof_df["source_entity_ids"]):
        for sm in sms:
            sm_to_profile[sm] = p
    codes = {p: i for i, p in enumerate(sorted(set(sm_to_profile.values())))}

    def split_of(p: str | None) -> str:
        if p is None:
            return "train"  # profile-less mentions never land in a holdout
        r = stable_hash64(f"{seed}:{p}") % 10_000
        if r < test_prop * 10_000:
            return "test"
        if r < (test_prop + valid_prop) * 10_000:
            return "valid"
        return "train"

    splits = {p: split_of(p) for p in codes}
    ref = ray.put((sm_to_profile, codes, splits))

    def assemble(batch: pd.DataFrame) -> pd.DataFrame:
        from entity_resolution_ray.stages.blocking import fetch_broadcast

        s2p, code_map, split_map = fetch_broadcast(ref)
        ids = batch[id_col].to_numpy()
        profs = np.array([s2p.get(i) for i in ids], dtype=object)
        gt = np.array([code_map.get(p, -1) if p is not None else -1 for p in profs],
                      dtype=np.int64)
        typ = np.array(
            [t if t is not None else "undefined" for t in batch[type_col]],
            dtype=object,
        )
        out = pd.DataFrame(
            {id_col: ids, "profile_id": profs, "ground_truth": gt,
             "type": typ, "blocking_field": typ,
             "split": np.array([split_map.get(p, "train") for p in profs],
                               dtype=object)}
        )
        if entity_types:
            out = out[out["type"].isin(entity_types)].reset_index(drop=True)
        return out

    return mentions_ds.map_batches(assemble, batch_format="pandas")
