"""Arrow schemas and column-name constants for the engine's tables.

The primary input matches BASELINE.json's ``input_hint``:
``(doc_id: string, spans: list<struct<kind, text, media_ref, offset>>)``.
The reference's analogous input contract is the 4-column mention frame
(``am_combiner/combiners/common.py:15-33``: unique_id, blocking_field,
content, ground_truth); here ``entity_name``/``content`` are *derived* from
the span sequence and ``ground_truth`` lives in a side table.
"""

from __future__ import annotations

import pyarrow as pa

# --- column names ---------------------------------------------------------
DOC_ID = "doc_id"
SPANS = "spans"
ENTITY_NAME = "entity_name"
CONTENT = "content"
BLOCK_KEY = "block_key"
CLUSTER_ID = "cluster_id"
GROUND_TRUTH = "ground_truth"
BLOCKING_FIELD = "blocking_field"

SPAN_KIND_NAME = "name"
SPAN_KIND_TEXT = "text"
SPAN_KIND_MEDIA = "media"

SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
    ]
)

DOCUMENTS_SCHEMA = pa.schema(
    [
        pa.field(DOC_ID, pa.string()),
        pa.field(SPANS, pa.list_(SPAN_STRUCT)),
    ]
)

GROUND_TRUTH_SCHEMA = pa.schema(
    [
        pa.field(DOC_ID, pa.string()),
        pa.field(BLOCKING_FIELD, pa.string()),
        pa.field(GROUND_TRUTH, pa.int64()),
        pa.field("cluster_id_global", pa.int64()),
        pa.field("dob_year", pa.int64()),
    ]
)

LABELED_PAIRS_SCHEMA = pa.schema(
    [
        pa.field(BLOCKING_FIELD, pa.string()),
        pa.field("doc_a", pa.string()),
        pa.field("doc_b", pa.string()),
        pa.field("is_match", pa.bool_()),
    ]
)


def span_tuples(spans_cell) -> list[tuple]:
    """One row's spans as a list of (kind, text, media_ref, order) tuples.

    This is the per-row invariant the engine must preserve end-to-end
    (BASELINE.json: span-sequence equality)."""
    return [
        (s["kind"], s["text"], s["media_ref"], i) for i, s in enumerate(spans_cell)
    ]
