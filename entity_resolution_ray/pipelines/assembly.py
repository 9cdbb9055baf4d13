"""YAML-driven pipeline assembly (SURVEY.md §2.14).

Reference analogue: ``get_cache_from_yaml`` (``am_combiner/utils/
parametrization.py:33-95``) — a YAML section of ``name → {class, attrs}``
entries instantiated through a class mapping with per-attr coercion
callbacks; the same shape drives the reference's combiner/visitor/blocker
registries (``combiners_config.yaml:170-658``).

Here the registries map names to STAGE FACTORIES — callables
``(Dataset, **attrs) → Dataset`` (feature stages) or per-block combiner
group functions — so a YAML file assembles a full Ray Data pipeline:

```yaml
pipeline:
  - resolve_geo:
      stage: geo_resolve_column
      attrs: {src_col: gpe}
  - terms:
      stage: article_terms
      attrs: {n: 5}
combiners:
  - my_cc:
      stage: connected_components
      attrs: {th: 1.0}
```
"""

from __future__ import annotations

from collections.abc import Callable

import yaml


def _stage_registry() -> dict[str, Callable]:
    from entity_resolution_ray.stages.dedup import (
        exact_dedup,
        jaccard_neardup_pairs,
        simhash_neardup_pairs,
    )
    from entity_resolution_ray.stages.geography import (
        country_blocker,
        geo_resolve_column,
    )
    from entity_resolution_ray.stages.sanctions import (
        org_features,
        sanction_features,
        sanction_terms,
        sanction_text_vectors,
    )
    from entity_resolution_ray.stages.terms import (
        article_keywords,
        article_terms,
        meta_key_column,
    )
    from entity_resolution_ray.stages.normalize import (
        filter_content_length,
        filter_name_in_content,
        max_names_filter,
        normalize,
        normalize_url_column,
    )
    from entity_resolution_ray.stages.terms import graph_data, profession_column
    from entity_resolution_ray.stages.textstats import text_stats

    return {
        "normalize": normalize,
        "normalize_url_column": normalize_url_column,
        "filter_name_in_content": filter_name_in_content,
        "filter_content_length": filter_content_length,
        "max_names_filter": max_names_filter,
        "profession_column": profession_column,
        "graph_data": graph_data,
        "geo_resolve_column": geo_resolve_column,
        "country_blocker": country_blocker,
        "article_terms": article_terms,
        "article_keywords": article_keywords,
        "meta_key_column": meta_key_column,
        "text_stats": text_stats,
        "exact_dedup": exact_dedup,
        "jaccard_neardup_pairs": jaccard_neardup_pairs,
        "simhash_neardup_pairs": simhash_neardup_pairs,
        "sanction_features": sanction_features,
        "org_features": org_features,
        "sanction_terms": sanction_terms,
        "sanction_text_vectors": sanction_text_vectors,
    }


def load_section(yaml_path: str, section: str, registry: dict[str, Callable],
                 attrs_callbacks: dict[str, Callable] | None = None,
                 restrict: set[str] | None = None) -> dict[str, Callable]:
    """name → ready-to-call stage (attrs bound), reference load semantics:
    unknown stage names raise; per-attr coercion callbacks run first."""
    attrs_callbacks = attrs_callbacks or {}
    out: dict[str, Callable] = {}
    with open(yaml_path) as f:
        config = yaml.safe_load(f)
    for entry in config.get(section, []):
        (name, spec), = entry.items()
        if restrict and name not in restrict:
            continue
        ref = spec["stage"]
        fn = registry.get(ref)
        if fn is None:
            raise KeyError(f"stage {ref!r} not in the registry for {section!r}")
        attrs = dict(spec.get("attrs") or {})
        for k, cb in attrs_callbacks.items():
            if k in attrs:
                attrs[k] = cb(attrs[k])
        out[name] = (lambda f_, a_: lambda ds, **kw: f_(ds, **{**a_, **kw}))(fn, attrs)
    return out


def assemble_pipeline(yaml_path: str, section: str = "pipeline",
                      attrs_callbacks: dict[str, Callable] | None = None):
    """YAML section → one composed ``Dataset → Dataset`` callable (stages
    applied in file order)."""
    stages = load_section(yaml_path, section, _stage_registry(), attrs_callbacks)

    def run(ds):
        for stage in stages.values():
            ds = stage(ds)
        return ds

    run.stages = stages
    return run


def load_combiners(yaml_path: str, section: str = "combiners",
                   restrict: set[str] | None = None) -> dict[str, Callable]:
    """YAML section → name → per-block combiner group function with attrs
    bound (use with ``stages.combiners.run_combiner``)."""
    from entity_resolution_ray.stages.combiners import COMBINERS

    registry = {}
    for cname, fn in COMBINERS.items():
        registry[cname] = (
            lambda f_: lambda group, **kw: f_(group, **kw)
        )(fn)
    loaded = load_section(yaml_path, section, registry, restrict=restrict)
    # rebind: combiner callables take (group, **attrs), not (ds, **attrs) —
    # load_section bound attrs already, so these are group functions
    return loaded
