"""Geography resolution + country-based skew blocking (SURVEY.md §2.2/§2.10).

Reference analogues:

- ``GraphBasedGeoResolver`` / ``ArticleGeoVisitor``
  (``am_combiner/features/geography.py:273-422``): a DiGraph of country
  names / aliases / ISO codes / capitals built from CSV resources; a GPE
  string resolves by DFS to the first reachable node with ``final=True``
  (the canonical country name); unresolved strings pass through unchanged
  into ``GPE_CLEAN``.  Here the graph is FLATTENED at build time into an
  ``alias → canonical`` dict (every graph path of the reference ends at the
  country node, so the dict is the DFS's fixed point) and held once per
  worker — the actor-``__init__`` pattern for lookup state.

- ``CountryBlocker`` (``am_combiner/blockers/country.py:19-126``): derive
  CC blocks; blocks larger than ``min_split_size`` split by country code —
  single-country records go to their country, ambiguous records to the
  country with **max mean edge connectivity** (#edges into that country's
  members / that country's member count, ``country.py:34-66``), countryless
  unconnected records to the null country "00".  Block key becomes
  ``{block_id}+{country}`` for split blocks.

The lexicon below is compact public knowledge (ISO codes, well-known
aliases/endonyms, capitals) covering the fixture gazetteer; a production
deployment would load the full public datasets the same way.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from entity_resolution_ray import schema as S

NULL_COUNTRY = "00"

# canonical name → (iso2 code, [aliases/endonyms], capital)
_COUNTRY_LEXICON: dict[str, tuple[str, list[str], str]] = {
    "france": ("fr", ["french republic", "republique francaise"], "paris"),
    "germany": ("de", ["deutschland", "federal republic of germany"], "berlin"),
    "brazil": ("br", ["brasil"], "brasilia"),
    "japan": ("jp", ["nippon", "nihon"], "tokyo"),
    "canada": ("ca", [], "ottawa"),
    "kenya": ("ke", [], "nairobi"),
    "india": ("in", ["bharat"], "new delhi"),
    "norway": ("no", ["norge"], "oslo"),
    "chile": ("cl", [], "santiago"),
    "egypt": ("eg", ["misr"], "cairo"),
    "peru": ("pe", [], "lima"),
    "spain": ("es", ["espana"], "madrid"),
    "italy": ("it", ["italia"], "rome"),
    "poland": ("pl", ["polska"], "warsaw"),
    "greece": ("gr", ["hellas"], "athens"),
    "turkey": ("tr", ["turkiye"], "ankara"),
    "vietnam": ("vn", ["viet nam"], "hanoi"),
    "portugal": ("pt", [], "lisbon"),
    "austria": ("at", ["osterreich"], "vienna"),
    "belgium": ("be", ["belgique"], "brussels"),
    "denmark": ("dk", ["danmark"], "copenhagen"),
    "finland": ("fi", ["suomi"], "helsinki"),
    "hungary": ("hu", ["magyarorszag"], "budapest"),
    "ireland": ("ie", ["eire"], "dublin"),
    "jordan": ("jo", [], "amman"),
    "latvia": ("lv", [], "riga"),
    "morocco": ("ma", ["maroc"], "rabat"),
    "nepal": ("np", [], "kathmandu"),
    "oman": ("om", [], "muscat"),
    "panama": ("pa", [], "panama city"),
    "qatar": ("qa", [], "doha"),
    "romania": ("ro", [], "bucharest"),
    "senegal": ("sn", [], "dakar"),
    "thailand": ("th", ["siam"], "bangkok"),
    "uganda": ("ug", [], "kampala"),
    "uruguay": ("uy", [], "montevideo"),
    "zambia": ("zm", [], "lusaka"),
    "iceland": ("is", ["island"], "reykjavik"),
    "estonia": ("ee", ["eesti"], "tallinn"),
    "bolivia": ("bo", [], "la paz"),
    "united states": ("us", ["usa", "united states of america", "america"],
                      "washington"),
    "united kingdom": ("gb", ["uk", "great britain", "britain", "england"],
                       "london"),
    "china": ("cn", ["peoples republic of china", "prc"], "beijing"),
    "russia": ("ru", ["russian federation"], "moscow"),
    "netherlands": ("nl", ["holland"], "amsterdam"),
    "switzerland": ("ch", ["schweiz", "suisse"], "bern"),
    "sweden": ("se", ["sverige"], "stockholm"),
    "mexico": ("mx", [], "mexico city"),
    "australia": ("au", [], "canberra"),
    "south korea": ("kr", ["republic of korea", "korea"], "seoul"),
}


def build_geo_lookup() -> dict[str, str]:
    """Flatten the name/alias/code/capital graph to ``alias → canonical``.

    Mirrors the reference's resolver graph reachability: every alias, code
    and capital node has an edge to its country node, whose ``final=True``
    makes it the DFS resolution (``geography.py:303-341``)."""
    lookup: dict[str, str] = {}
    for canonical, (code, aliases, capital) in _COUNTRY_LEXICON.items():
        lookup[canonical] = canonical
        lookup[code] = canonical
        for a in aliases:
            lookup.setdefault(a, canonical)
        if capital:
            lookup.setdefault(capital, canonical)
    return lookup


def country_code(canonical: str) -> str:
    entry = _COUNTRY_LEXICON.get(canonical)
    return entry[0] if entry else NULL_COUNTRY


class GeoResolver:
    """Worker-held flattened resolver (actor-``__init__`` lookup state)."""

    def __init__(self, extra_aliases: dict[str, str] | None = None):
        self.lookup = build_geo_lookup()
        if extra_aliases:
            self.lookup.update({k.lower(): v for k, v in extra_aliases.items()})

    def resolve(self, geo_name: str) -> str | None:
        return self.lookup.get(str(geo_name).strip().lower())


def geo_resolve_column(ds, src_col: str = "gpe", dst_col: str = "gpe_clean",
                       code_col: str | None = "country_codes"):
    """ArticleGeoVisitor semantics: each GPE string resolves to its canonical
    country or passes through unchanged; optional ISO-code column.

    Stateless-task stage with a per-worker-process resolver singleton.
    """

    def fn(batch: pa.Table) -> pa.Table:
        from entity_resolution_ray.pipelines.er import _worker_singleton

        resolver = _worker_singleton(GeoResolver)
        cleaned, codes = [], []
        for vals in batch[src_col].to_pylist():
            new_state: list[str] = []
            code_set: list[str] = []
            for v in vals or []:
                res = resolver.resolve(v)
                if res is None:
                    new_state.append(str(v).strip())
                else:
                    new_state.append(res)
                    code_set.append(country_code(res))
            cleaned.append(sorted(set(new_state)))
            codes.append(sorted(set(code_set)))
        out = batch.append_column(
            dst_col, pa.array(cleaned, pa.list_(pa.string()))
        )
        if code_col:
            out = out.append_column(
                code_col, pa.array(codes, pa.list_(pa.string()))
            )
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def _best_country(i: int, nbrs_of: dict[int, set], ids_by_country: dict[str, set],
                  options: list[str] | None, countries: list) -> str:
    """Reference ``_calculate_best_country`` (``country.py:34-66``)."""
    connected = nbrs_of.get(i, set())
    if options is None:
        opt_sets = [countries[j] for j in connected]
        options = sorted(set().union(*opt_sets)) if opt_sets else []
    if not options:
        return NULL_COUNTRY
    mean_conn = []
    for cc in options:
        members = ids_by_country.get(cc, set())
        if not members:
            mean_conn.append(0.0)
        else:
            mean_conn.append(len(connected & members) / len(members))
    return options[int(np.argmax(mean_conn))]


def split_block_by_country(group: pd.DataFrame) -> pd.DataFrame:
    """One oversized block (docs cogrouped with its edges) → per-doc country.

    Expects doc rows (doc_id, countries:list, __is_edge=0) and edge rows
    (src, dst, __is_edge=1); returns (doc_id, country).
    """
    is_edge = group["__is_edge"].to_numpy() == 1
    docs = group.loc[~is_edge]
    edges = group.loc[is_edge]
    ids = docs[S.DOC_ID].to_numpy()
    index = {d: i for i, d in enumerate(ids)}
    countries = [
        set(c) if c is not None and len(c) else set() for c in docs["countries"]
    ]

    nbrs_of: dict[int, set] = {}
    for s, d in zip(edges["src"], edges["dst"]):
        a, b = index.get(s), index.get(d)
        if a is None or b is None:
            continue
        nbrs_of.setdefault(a, set()).add(b)
        nbrs_of.setdefault(b, set()).add(a)

    ids_by_country: dict[str, set] = {}
    for i, cc in enumerate(countries):
        if len(cc) == 1:
            ids_by_country.setdefault(next(iter(cc)), set()).add(i)

    out = []
    for i in range(len(ids)):
        cc = countries[i]
        if len(cc) == 1:
            country = next(iter(cc))
        elif len(cc) > 1:
            country = _best_country(i, nbrs_of, ids_by_country, sorted(cc), countries)
        else:
            country = _best_country(i, nbrs_of, ids_by_country, None, countries)
        out.append(country)
    return pd.DataFrame({S.DOC_ID: ids, "country": out})


def country_blocker(featured_ds, key_cols: list[str],
                    country_col: str = "country_codes",
                    min_split_size: int = 1000, cap: int = 500,
                    num_buckets: int = 64):
    """Reference CountryBlocker, Ray-Data-first.

    1. derive CC blocks over shared ``key_cols`` values,
    2. size census → blocks > ``min_split_size``,
    3. oversized blocks: docs cogrouped with the block's candidate edges in
       one shuffle keyed by block id; per-block country assignment
       (single-country direct / ambiguous → max mean edge connectivity),
    4. final key: ``block_id+country`` for split blocks, ``block_id`` else.

    Returns a Dataset (doc_id, block_id, block_key).
    """
    from entity_resolution_ray.stages.aggregate import grouped_aggregate
    from entity_resolution_ray.stages.blockers import explode_keys
    from entity_resolution_ray.stages.blocking import candidate_pairs_from_keys
    from entity_resolution_ray.stages.clustering import (
        attach_labels,
        connected_components_labelprop,
    )

    exploded = explode_keys(featured_ds, key_cols)
    pairs = candidate_pairs_from_keys(exploded, "key", cap=cap).materialize()
    labels = connected_components_labelprop(pairs)
    narrow = featured_ds.select_columns([S.DOC_ID, country_col])
    labeled = attach_labels(narrow, labels, out_col="block_id").materialize()

    sizes = grouped_aggregate(labeled, "block_id", {"n": (S.DOC_ID, "size")})
    big = sizes.map_batches(
        lambda b: b[b["n"] > min_split_size][["block_id"]], batch_format="pandas"
    ).materialize()
    if big.count() == 0:
        return labeled.map_batches(
            lambda t: pa.table(
                {
                    S.DOC_ID: t[S.DOC_ID],
                    "block_id": t["block_id"],
                    "block_key": t["block_id"],
                }
            ),
            batch_format="pyarrow",
        )
    big_ids = frozenset(big.to_pandas()["block_id"])  # bounded: #oversized blocks

    # edges of oversized blocks: attach block id to edges via src (endpoints
    # share a block by construction), keep edges of big blocks
    edge_block = attach_labels(
        pairs.map_batches(
            lambda t: pa.table({S.DOC_ID: t["src"], "dst": t["dst"]}),
            batch_format="pyarrow",
        ),
        labels,
        out_col="block_id",
    )

    def tag_docs(batch: pa.Table) -> pa.Table:
        mask = pa.array([b in big_ids for b in batch["block_id"].to_pylist()])
        keep = batch.filter(mask)
        n = len(keep)
        return pa.table(
            {
                S.DOC_ID: keep[S.DOC_ID],
                "countries": keep[country_col],
                "src": pa.nulls(n, pa.string()),
                "dst": pa.nulls(n, pa.string()),
                "block_id": keep["block_id"],
                "__is_edge": pa.array(np.zeros(n, np.int8)),
            }
        )

    def tag_edges(batch: pa.Table) -> pa.Table:
        mask = pa.array([b in big_ids for b in batch["block_id"].to_pylist()])
        keep = batch.filter(mask)
        n = len(keep)
        return pa.table(
            {
                S.DOC_ID: pa.nulls(n, pa.string()),
                "countries": pa.nulls(n, pa.list_(pa.string())),
                "src": keep[S.DOC_ID],
                "dst": keep["dst"],
                "block_id": keep["block_id"],
                "__is_edge": pa.array(np.ones(n, np.int8)),
            }
        )

    cogrouped = labeled.map_batches(tag_docs, batch_format="pyarrow").union(
        edge_block.map_batches(tag_edges, batch_format="pyarrow")
    )
    countries = cogrouped.groupby("block_id").map_groups(
        split_block_by_country, batch_format="pandas"
    ).materialize()

    # stitch: big-block docs get block_id+country, everyone else block_id —
    # a partitioned left join (the country table is proportional to the
    # oversized blocks' membership, so no broadcast)
    from entity_resolution_ray.stages.joins import hash_join

    joined = hash_join(
        labeled.select_columns([S.DOC_ID, "block_id"]), countries, on=S.DOC_ID,
        how="left",
    )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        has_c = batch["country"].notna()
        keys = batch["block_id"].astype(str)
        keys = np.where(has_c, keys + "+" + batch["country"].astype(str), keys)
        return pd.DataFrame(
            {
                S.DOC_ID: batch[S.DOC_ID],
                "block_id": batch["block_id"],
                "block_key": keys,
            }
        )

    return joined.map_batches(finish, batch_format="pandas")
