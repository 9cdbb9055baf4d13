"""Organisation / term / summary sanction extractors.

Mirrors ``test/features/test_organisation_visitors.py`` expectations
(registration-code rule, year rule, alias keyword connectivity incl.
bracket expansion and a.k.a. splitting) plus the JsonSummarizer whitelist
and SanctionTermVisitor title lift.
"""

import pyarrow as pa
import pytest
import ray.data as rd

from entity_resolution_ray.stages.sanctions import (
    SANCTION_SCHEMA,
    _verify_org_code,
    _verify_year,
    org_alias_keyword_tokens,
    org_features,
    sanction_terms,
    sanction_text_vectors,
    synth_sanctions,
)


@pytest.mark.parametrize(
    ["tok", "want"],
    [("7610076500", "7610076500"), ("IR12751", "IR12751"),
     ("VALUABLE", None), ("52", None)],
)
def test_verify_org_code(tok, want):
    assert _verify_org_code(tok) == want


@pytest.mark.parametrize(["tok", "want"], [("1998", 1998), ("june", None)])
def test_verify_year(tok, want):
    assert _verify_year(tok) == want


@pytest.mark.parametrize(
    ["a", "b", "connected"],
    [
        ("Central Bank of Syria", "CENTRAL BANK SYRIA (CBS)", True),
        ("Central Bank of Syria CBS", "CENTRAL BANK SYRIA (CBS)", True),
        ("Institute of Nuclear Research", "[Iran] Institute of Nuclear Research", True),
        ("Korean Workers Party a.k.a. Propaganda And Agitation Department",
         "Propaganda And Agitation Department", True),
        ("Korean Workers Party a.k.a. Propaganda And Agitation Department",
         "Korean Workers Party", True),
        ("Huawei Software Technologies Co., Ltd.", "Huawei Software Technologies", True),
        ("Ltd Kingly Won International Co.", "Kingly Won International Company", True),
        ("AA ENERGY FZC", "FZC", False),
        ("Korea Haegumgang Trading Corp.", "Korea Haegumgang Trading Corporation", True),
    ],
)
def test_org_alias_keyword_connectivity(a, b, connected):
    ka = set(org_alias_keyword_tokens(a))
    kb = set(org_alias_keyword_tokens(b))
    assert bool(ka & kb) == connected, (ka, kb)


def test_org_features_columns(ray_session):
    table = synth_sanctions(60)
    out = org_features(rd.from_arrow(table)).to_pandas().set_index("sanction_id")
    orgs = out[out["type"] == "organisation"]
    assert len(orgs) > 0
    # every synthetic organisation carries a valid registration id + year
    assert all(len(v) == 1 and v[0].startswith("RN") for v in orgs["org_ids"])
    assert all(len(v) == 1 and 1990 <= v[0] <= 2019 for v in orgs["designation_years"])
    # persons have no registration ids
    assert all(len(v) == 0 for v in out[out["type"] == "person"]["org_ids"])
    # nationalities and aml types lifted
    assert all(len(v) == 1 for v in out["nationality_codes"])
    assert set(x for v in out["aml_type_set"] for x in v) <= {"sanction", "pep"}
    # addresses: tokens exclude stopwords ('street' dropped), country resolves
    with_addr = out[out["address_tokens"].map(len) > 0]
    assert len(with_addr) > 0
    assert all("street" not in v for v in with_addr["address_tokens"])
    assert all(v == ["portugal"] for v in with_addr["address_countries"])
    # JsonSummarizer: whitelist keeps Reason/Program, drops Occupation
    assert all("listed by authority" in t for t in out["full_text_summary"])
    assert all("trader" not in t for t in out["full_text_summary"])
    # FullSanctionText: ALL display values (incl. occupation) joined
    assert all("trader." in t for t in out["sanction_text"])


def test_sanction_terms_and_vectors(ray_session):
    table = synth_sanctions(30)
    ds = sanction_terms(rd.from_arrow(table), ["Program", "Reason"])
    df = ds.to_pandas()
    assert all(len(v) == 1 and v[0].startswith("program-") for v in df["term_program"])
    assert all(v == ["listed by authority"] for v in df["term_reason"])

    vec = sanction_text_vectors(org_features(rd.from_arrow(table))).to_pandas()
    assert all(len(i) > 0 for i in vec["sanction_tf_idx"])
    # identical sanction_texts hash identically (deterministic vectorizer)
    a, b = vec.iloc[0], vec.iloc[1]
    if a["sanction_text"] == b["sanction_text"]:
        assert list(a["sanction_tf_idx"]) == list(b["sanction_tf_idx"])


def test_sanction_term_tagger(ray_session):
    import pandas as pd

    from entity_resolution_ray.stages.sanctions import sanction_term_tagger

    ds = rd.from_pandas(
        pd.DataFrame(
            {
                "sanction_id": ["s1"],
                "term_reason": [["Maria Silva met in France near the Nile River"]],
            }
        )
    )
    out = sanction_term_tagger(ds, ["term_reason"]).to_pandas().iloc[0]
    assert "maria silva" in out["term_tagged_person"]
    assert out["term_tagged_gpe"] == ["france"]
    assert out["term_tagged_loc"] == ["nile river"]
