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


# --- input preprocessing (reference ``preprocess_input_dataframe``) ---------
def normalize_url_column(ds, col: str = "doc_id"):
    """Rewrite every URL's scheme to ``http`` (``am_combiner/utils/
    random_data.py:57-59``) — http/https duplicates of a page collapse."""
    from urllib.parse import urlparse

    def fn(batch: pa.Table) -> pa.Table:
        vals = [
            urlparse(u)._replace(scheme="http").geturl() if "://" in (u or "")
            else (u or "")
            for u in batch[col].to_pylist()
        ]
        i = batch.column_names.index(col)
        return batch.set_column(i, col, pa.array(vals, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


def dedup_keep_min(ds, key_col: str, order_col: str, num_buckets: int = 64):
    """One row per key, keeping the min ``order_col`` row — the distributed
    form of ``drop_duplicates(keep='first')`` with a deterministic order
    (the reference relies on input order; a Dataset has none)."""
    import pandas as pd

    from entity_resolution_ray.stages.blocking import _add_bucket

    bucketed = ds.map_batches(
        lambda b: _add_bucket(b, [key_col], num_buckets), batch_format="pandas"
    )

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, order_col], kind="mergesort")
        return g.drop_duplicates(key_col).drop(columns="__bucket")

    return bucketed.groupby("__bucket").map_groups(per_bucket, batch_format="pandas")


def filter_name_in_content(ds, name_col: str = S.ENTITY_NAME,
                           content_col: str = S.CONTENT):
    """Keep docs whose entity name appears in the text (reference
    ``has_entity_mask``, ``utils/random_data.py:61-65``)."""

    def fn(batch: pa.Table) -> pa.Table:
        names = batch[name_col].to_pylist()
        texts = batch[content_col].to_pylist()
        mask = pa.array(
            [bool(n) and (n in (t or "")) for n, t in zip(names, texts)]
        )
        return batch.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow")


def filter_content_length(ds, min_len: int | None = None,
                          max_len: int | None = 50_000,
                          content_col: str = S.CONTENT):
    """Reference content-length post-filters (``utils/data.py:196-205``;
    default max 50 000 chars, ``__main__.py:92-99``)."""

    def fn(batch: pa.Table) -> pa.Table:
        lens = pc.utf8_length(batch[content_col])
        mask = pc.is_valid(lens)
        if min_len is not None:
            mask = pc.and_(mask, pc.greater_equal(lens, min_len))
        if max_len is not None:
            mask = pc.and_(mask, pc.less_equal(lens, max_len))
        return batch.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow")


def unpivot_annotation_pairs(pairs_ds,
                             name_col: str = "entity_name",
                             url1_col: str = "first_url",
                             url2_col: str = "second_url",
                             text1_col: str = "first_text",
                             text2_col: str = "second_text",
                             answer_col: str = "answer",
                             positive: str = "Yes"):
    """AnnotationsProvider unpivot (``am_combiner/utils/data.py:396-546``):
    one pair row → two mention rows (url, content, entity_name), plus a
    labeled-pairs side table (doc_a, doc_b, is_match) from the Yes/No
    answers.  Returns (mentions_ds, labeled_pairs_ds); mention rows
    deduplicate downstream with ``dedup_keep_min``."""

    def mentions(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.concat_arrays(
                    [batch[url1_col].combine_chunks(), batch[url2_col].combine_chunks()]
                ),
                S.CONTENT: pa.concat_arrays(
                    [batch[text1_col].combine_chunks(), batch[text2_col].combine_chunks()]
                ),
                S.ENTITY_NAME: pa.concat_arrays(
                    [batch[name_col].combine_chunks()] * 2
                ),
            }
        )

    def labeled(batch: pa.Table) -> pa.Table:
        a = batch[url1_col].to_pylist()
        b = batch[url2_col].to_pylist()
        ans = batch[answer_col].to_pylist()
        doc_a = [min(x, y) for x, y in zip(a, b)]
        doc_b = [max(x, y) for x, y in zip(a, b)]
        return pa.table(
            {
                "doc_a": pa.array(doc_a, pa.string()),
                "doc_b": pa.array(doc_b, pa.string()),
                "is_match": pa.array([x == positive for x in ans]),
            }
        )

    return (
        pairs_ds.map_batches(mentions, batch_format="pyarrow"),
        pairs_ds.map_batches(labeled, batch_format="pyarrow"),
    )


def max_names_filter(ds, max_names: int, name_col: str = S.ENTITY_NAME):
    """Truncate to the first ``max_names`` distinct names (``utils/
    data.py:191-195``).  The reference takes input order; here the ordering
    is the deterministic sorted order of the name strings, and the bounded
    name set (≤ max_names rows) broadcasts for the membership filter."""
    import ray

    from entity_resolution_ray.stages.aggregate import grouped_aggregate

    names = grouped_aggregate(
        ds.select_columns([name_col]), name_col, {"n": (name_col, "size")}
    )
    keep = (
        names.sort(name_col).limit(max_names).to_pandas()[name_col].tolist()
    )
    ref = ray.put(frozenset(keep))

    def fn(batch: pa.Table) -> pa.Table:
        from entity_resolution_ray.stages.blocking import fetch_broadcast

        k = fetch_broadcast(ref)
        mask = pa.array([n in k for n in batch[name_col].to_pylist()])
        return batch.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow")


MENTIONS_CSV_COLUMNS = ("blocking_field", "content", "unique_id",
                        "ground_truth")


def read_mentions_csv(csv_path: str, ignore_missing_cols: bool = False):
    """CSV combiner-input source with the reference's 4-column contract
    (``am_combiner/combiners/common.py:59-92`` / ``CSVDataProvider``,
    ``utils/data.py:358-393``): the required columns are
    ``{blocking_field, content, unique_id, ground_truth}``; rows with
    null/empty ``content`` are dropped; duplicates on
    ``(blocking_field, unique_id)`` collapse to one row.  The reference
    keeps first-in-file order for duplicates; a Dataset has no input
    order, so the deterministic lexicographically-min ``content`` row
    stands in (identical result whenever duplicates carry identical
    content).  Empty CSV fields read as null (``strings_can_be_null``),
    matching pandas' NaN-on-empty, and quoted embedded newlines are
    honoured — the reader streams file fragments as Arrow blocks, so a
    100-TB mention dump shards across the cluster like any parquet read.
    """
    import pyarrow.csv as pacsv
    import ray.data

    ds = ray.data.read_csv(
        csv_path,
        parse_options=pacsv.ParseOptions(newlines_in_values=True),
        convert_options=pacsv.ConvertOptions(
            column_types={"blocking_field": pa.string(),
                          "content": pa.string(),
                          "unique_id": pa.string()},
            strings_can_be_null=True,
        ),
    )
    if not ignore_missing_cols:
        have = set(ds.schema().names)
        for c in MENTIONS_CSV_COLUMNS:
            if c not in have:
                raise ValueError(
                    f'Required column "{c}" is not found in {csv_path}')

    def drop_null_content(batch: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(batch["content"]),
                     pc.not_equal(batch["content"], ""))
        return batch.filter(pc.fill_null(ok, False))

    def add_key(batch: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            batch["blocking_field"], batch["unique_id"], "\x1f")
        return batch.append_column("__key", key)

    ds = ds.map_batches(drop_null_content, batch_format="pyarrow") \
           .map_batches(add_key, batch_format="pyarrow")
    return dedup_keep_min(ds, "__key", "content").drop_columns(["__key"])
