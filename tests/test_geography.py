"""Geography resolver + CountryBlocker + reference-semantics cutoff blocker.

Mirrors the reference tests:
- ``test/blockers/test_country.py`` — best-country assignment cases,
- ``am_combiner/features/geography.py`` resolver behavior (alias / code /
  capital → canonical country; unknown passthrough),
- ``am_combiner/blockers/common.py:100-201`` cutoff semantics (clusters ≥
  cutoff freeze as blocks; keyless records fall through to the final pass).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from entity_resolution_ray import schema as S
from entity_resolution_ray.stages.geography import (
    GeoResolver,
    NULL_COUNTRY,
    _best_country,
    country_blocker,
    geo_resolve_column,
    split_block_by_country,
)


def test_resolver_aliases_codes_capitals():
    r = GeoResolver()
    assert r.resolve("Deutschland") == "germany"
    assert r.resolve("  FRANCE ") == "france"
    assert r.resolve("jp") == "japan"
    assert r.resolve("Paris") == "france"
    assert r.resolve("Atlantis") is None


def test_best_country_reference_cases():
    # reference test/blockers/test_country.py matrix: node 0 → {3, 4, 7}
    nbrs_of = {0: {3, 4, 7}}
    ids_by_country = {"UK": {1, 2}, "GR": {3, 4, 5}, "AL": {7, 8}}
    countries = [set() for _ in range(9)]
    for cc, idxs in ids_by_country.items():
        for i in idxs:
            countries[i] = {cc}
    assert _best_country(0, nbrs_of, ids_by_country, ["AL", "UK"], countries) == "AL"
    assert _best_country(0, nbrs_of, ids_by_country, None, countries) == "GR"
    # unconnected & countryless → null country
    assert _best_country(6, nbrs_of, ids_by_country, None, countries) == NULL_COUNTRY


def test_split_block_by_country_group():
    group = pd.DataFrame(
        {
            S.DOC_ID: ["a", "b", "c", "d", None, None],
            "countries": [["fr"], ["fr"], ["de"], [], None, None],
            "src": [None, None, None, None, "a", "b"],
            "dst": [None, None, None, None, "b", "d"],
            "block_id": ["x"] * 6,
            "__is_edge": np.array([0, 0, 0, 0, 1, 1], dtype=np.int8),
        }
    )
    out = split_block_by_country(group).set_index(S.DOC_ID)["country"]
    assert out["a"] == "fr" and out["b"] == "fr"
    assert out["c"] == "de"
    # d is countryless but connected to b (fr) → fr wins by connectivity
    assert out["d"] == "fr"


def test_geo_resolve_column_and_country_blocker(ray_session):
    docs = pd.DataFrame(
        {
            S.DOC_ID: [f"d{i}" for i in range(8)],
            "gpe": [["France"], ["Paris"], ["Deutschland"], ["Germany"],
                    ["Atlantis"], ["Japan"], ["jp"], []],
            "phonetic_key": ["K1"] * 4 + ["K2"] * 4,
        }
    )
    ds = rd.from_pandas(docs)
    resolved = geo_resolve_column(ds).to_pandas().set_index(S.DOC_ID)
    assert resolved.loc["d0", "gpe_clean"] == ["france"]
    assert resolved.loc["d1", "gpe_clean"] == ["france"]
    assert resolved.loc["d4", "gpe_clean"] == ["Atlantis"]
    assert resolved.loc["d5", "country_codes"] == ["jp"]

    # country blocker with a tiny split size: the K1 block (4 docs) splits
    # by country (fr / de), K2 splits too (jp vs null)
    feat = rd.from_pandas(resolved.reset_index())
    feat = geo_resolve_column(rd.from_pandas(docs))
    out = country_blocker(
        feat, ["phonetic_key"], min_split_size=3
    ).to_pandas().set_index(S.DOC_ID)
    assert out.loc["d0", "block_key"] == out.loc["d1", "block_key"]  # both fr
    assert out.loc["d2", "block_key"] == out.loc["d3", "block_key"]  # both de
    assert out.loc["d0", "block_key"] != out.loc["d2", "block_key"]
    assert out.loc["d0", "block_id"] == out.loc["d2", "block_id"]  # same CC block
    assert out.loc["d5", "block_key"] == out.loc["d6", "block_key"]  # both jp


def test_cutoff_blocker_reference_semantics(ray_session):
    # 6 docs sharing key A (≥ cutoff → frozen in pass 1), 2 docs sharing key
    # B (< cutoff → fall through, frozen only in the final pass), 1 keyless
    # doc (singleton at the end)
    docs = pd.DataFrame(
        {
            S.DOC_ID: [f"d{i}" for i in range(9)],
            "k1": ["A"] * 6 + ["B"] * 2 + [""],
            "k2": [""] * 9,
        }
    )
    from entity_resolution_ray.stages.blockers import cutoff_blocker

    out = cutoff_blocker(
        rd.from_pandas(docs), ["k1", "k2"], cluster_cutoff=5
    ).to_pandas().set_index(S.DOC_ID)
    assert len(out) == 9
    a_ids = {out.loc[f"d{i}", "block_id"] for i in range(6)}
    assert len(a_ids) == 1  # the big A cluster froze as one block
    assert out.loc["d0", "derived_by"] == "k1@th1"
    b_ids = {out.loc["d6", "block_id"], out.loc["d7", "block_id"]}
    assert len(b_ids) == 1  # B pair still shares a block (final pass)
    # final pass freezes leftovers: keyless doc is its own singleton block
    assert out.loc["d8", "block_id"] not in a_ids | b_ids
    # blocks are disjoint between A and B
    assert not (a_ids & b_ids)
