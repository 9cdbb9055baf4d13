"""Shipped lookup resources for the feature tagger.

The reference ships gazetteer resource files (CSV/TSV/JSON) consumed by its
graph-based geo resolver (``am_combiner/features/geography.py:45-270``); the
analogous resources here are in-code lists shared by the fixture generator and
the tagger stage.
"""

from entity_resolution_ray.fixtures.generator import (  # noqa: F401
    GPE_GAZETTEER,
    LOC_GAZETTEER,
    ORG_SUFFIXES,
)

STOPWORDS = {
    "the", "and", "of", "a", "to", "in", "for", "on", "with", "at", "by",
    "an", "is", "was", "are", "were", "be", "been", "from", "that", "this",
    "it", "as", "or", "but", "not", "he", "she", "they", "we", "his", "her",
    "their", "our", "its", "about", "after", "last", "year", "according",
    "says", "said",
}
