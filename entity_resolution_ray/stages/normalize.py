"""Normalize stage: derive ``entity_name`` / ``content`` / ``media_refs`` from spans.

Reference analogue: the 4-column input contract and content handling of
``am_combiner/combiners/common.py:59-92`` — here the name and text arrive as an
interleaved span sequence (BASELINE.json input_hint) instead of flat columns.

Invariant: the ``spans`` column passes through untouched — derived columns are
appended, never reordered.  Works zero-copy on Arrow: the span list is
flattened once (``list_flatten`` + ``list_parent_indices``) and re-grouped with
numpy ``reduceat`` boundaries, never with per-row Python span loops.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from entity_resolution_ray import schema as S


def derive_from_spans(batch: pa.Table) -> pa.Table:
    """Append entity_name, content, media_refs columns derived from ``spans``."""
    spans = batch[S.SPANS]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    n = len(batch)

    parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(spans)
    kinds = pc.struct_field(flat, "kind").to_numpy(zero_copy_only=False)
    texts = pc.struct_field(flat, "text").to_numpy(zero_copy_only=False)
    offsets = pc.struct_field(flat, "offset").to_numpy(zero_copy_only=False)
    media = pc.struct_field(flat, "media_ref").to_numpy(zero_copy_only=False)

    # stable sort spans by (row, offset) so content order == offset order even
    # if the stored list order ever differs
    order = np.lexsort((offsets, parent))
    parent_s, kinds_s, texts_s, media_s = (
        parent[order], kinds[order], texts[order], media[order],
    )

    entity_name = np.full(n, "", dtype=object)
    content = np.full(n, "", dtype=object)
    media_refs: list[list[str]] = [[] for _ in range(n)]

    is_name = kinds_s == S.SPAN_KIND_NAME
    # first name-span per row wins
    name_rows = parent_s[is_name]
    name_texts = texts_s[is_name]
    # np.unique returns first occurrence index with return_index on sorted input
    uniq_rows, first_idx = np.unique(name_rows, return_index=True)
    entity_name[uniq_rows] = name_texts[first_idx]

    is_text = kinds_s == S.SPAN_KIND_TEXT
    text_rows = parent_s[is_text]
    text_vals = texts_s[is_text]
    if len(text_rows):
        boundaries = np.flatnonzero(np.diff(text_rows)) + 1
        starts = np.concatenate(([0], boundaries))
        row_of_group = text_rows[starts]
        ends = np.concatenate((boundaries, [len(text_rows)]))
        for r, s, e in zip(row_of_group, starts, ends):
            content[r] = " ".join(text_vals[s:e])

    is_media = kinds_s == S.SPAN_KIND_MEDIA
    for r, ref in zip(parent_s[is_media], media_s[is_media]):
        media_refs[r].append(ref)

    return (
        batch.append_column(S.ENTITY_NAME, pa.array(entity_name, pa.string()))
        .append_column(S.CONTENT, pa.array(content, pa.string()))
        .append_column("media_refs", pa.array(media_refs, pa.list_(pa.string())))
    )


def normalize(ds):
    """documents Dataset → + entity_name/content/media_refs (spans preserved)."""
    return ds.map_batches(derive_from_spans, batch_format="pyarrow")
