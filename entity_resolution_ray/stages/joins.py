"""Join operators: broadcast map-join and partitioned hash join.

The reference's joins are pandas merges in driver memory (validation merge
``am_combiner/__main__.py:566-571``, annotation-pair overlays, feature-cache
lookups — SURVEY.md §2.5).  At scale there are two shapes:

- ``broadcast_join`` — small side ``ray.put`` once, fetched once per worker,
  pandas-merged per batch inside ``map_batches`` (no shuffle),
- ``hash_join`` — both sides large: explicit partitioned hash join; both sides
  get ``bucket = stable_hash(key) % B``, are unioned with a side tag, grouped
  by bucket, and merged with a vectorized pandas merge inside each bucket
  group.  B is the skew knob; hot keys can be salted into sub-buckets by
  raising B.  (Ray's own ``Dataset.join`` exists in recent releases; this
  explicit form keeps the partitioning visible and version-independent.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray

from entity_resolution_ray.stages.blocking import fetch_broadcast


def _bucket_col(df: pd.DataFrame, on: list[str], num_buckets: int) -> np.ndarray:
    """Vectorized deterministic bucket ids (pandas siphash with its fixed
    default key — stable across processes, which is all a within-job
    partitioning needs)."""
    h = pd.util.hash_pandas_object(df[on[0]], index=False).to_numpy()
    for c in on[1:]:
        h = h * np.uint64(31) + pd.util.hash_pandas_object(
            df[c], index=False
        ).to_numpy()
    return (h % np.uint64(num_buckets)).astype(np.int64)


def broadcast_join(big_ds, small_df: pd.DataFrame, on, how: str = "left",
                   batch_size: int = 4096):
    """Join a Dataset with a small pandas frame (broadcast, no shuffle).

    SQL NULL semantics: null-keyed small-side rows are dropped up front — a
    null key can never match (pandas merge would pair NaN with NaN); big-side
    null rows then fall out of inner joins and survive unmatched in left
    joins, exactly as SQL."""
    on = [on] if isinstance(on, str) else list(on)
    ref = ray.put(small_df.dropna(subset=on))

    def _merge(batch: pd.DataFrame) -> pd.DataFrame:
        small = fetch_broadcast(ref)
        return batch.merge(small, on=on, how=how)

    return big_ds.map_batches(_merge, batch_format="pandas", batch_size=batch_size)


def size_gated_join(big_ds, small_ds, on, how: str = "inner",
                    broadcast_cap: int = 1_000_000, num_buckets: int = 64):
    """Broadcast when the small side is provably small, partitioned hash join
    otherwise — the same size dispatch as ``assign_clusters``'s label attach.

    ``small_ds.count()`` on a parquet read is metadata-only (no scan);
    data-proportional sides (e.g. TPC-H customer at 100×) cross the cap and
    take the shuffle path instead of a multi-GB driver materialization."""
    if small_ds.count() <= broadcast_cap:
        return broadcast_join(big_ds, small_ds.to_pandas(), on=on, how=how)
    return hash_join(big_ds, small_ds, on=on, how=how, num_buckets=num_buckets)


def attach_embeddings(ds, emb_ds, id_col: str = "doc_id",
                      emb_id_col: str | None = None,
                      how: str = "inner", broadcast_cap: int = 2_000_000,
                      num_buckets: int = 64):
    """Join records against a precomputed embedding table by id — the
    ``Neo4jEmbeddingVisitor`` analogue (reference ``am_combiner/features/
    remote.py:8-35``: node2vec vectors downloaded once into a driver dict,
    then attached per record by ``sanction_id``).

    The driver-dict shape is the broadcast fast path (embedding table under
    ``broadcast_cap`` rows → ``ray.put`` once, merged per batch); a
    data-proportional embedding table takes the partitioned ``hash_join``
    instead.  ``how="inner"`` mirrors the reference's hard KeyError on a
    missing id (records without an embedding drop); pass ``how="left"`` to
    keep them with nulls."""
    import pyarrow as pa

    if emb_id_col and emb_id_col != id_col:
        def rename(batch: pa.Table) -> pa.Table:
            names = [id_col if n == emb_id_col else n for n in batch.column_names]
            return batch.rename_columns(names)

        emb_ds = emb_ds.map_batches(rename, batch_format="pyarrow")
    return size_gated_join(ds, emb_ds, on=id_col, how=how,
                           broadcast_cap=broadcast_cap, num_buckets=num_buckets)


def _arrow_schema(ds):
    """True Arrow schema of a Dataset without a full execution (metadata
    first; one-row sample only for pandas-backed datasets)."""
    import pyarrow as pa

    s = ds.schema()
    if s is None:
        # zero-row dataset whose limit-1 schema probe found nothing: the
        # blocks themselves still carry a schema (an empty parquet read or
        # an empty map_batches output emits schema-bearing empty blocks) —
        # materialize and read it from there so empty partitions join
        # instead of crashing (routine at scale: a filter can empty a shard)
        s = ds.materialize().schema()
        if s is None:
            raise ValueError(
                "cannot infer join schema: dataset has no blocks at all")
    s = s.base_schema
    if isinstance(s, pa.Schema):
        return s
    # pandas-backed dataset: sample one arrow batch for true types
    it = iter(ds.iter_batches(batch_size=1, batch_format="pyarrow"))
    batch = next(it, None)
    if batch is not None:
        return batch.schema
    # empty pandas-backed dataset: best-effort conversion of the pandas
    # block schema (names with inferred arrow types)
    import pandas as pd

    empty = pd.DataFrame({n: pd.Series(dtype=t) for n, t in
                          zip(s.names, s.types)})
    return pa.Schema.from_pandas(empty, preserve_index=False)


def hash_join(left_ds, right_ds, on, how: str = "inner", num_buckets: int = 64):
    """Partitioned hash join of two Datasets on equal-named key columns.

    Both sides are padded to one shared Arrow schema with *typed* nulls (the
    padding stays on the Arrow side — pandas would coerce nullable int64 to
    float64 and corrupt 64-bit ids), unioned with a side tag, grouped by
    bucket, and pandas-merged per bucket after splitting sides again.
    """
    import pyarrow as pa

    on = [on] if isinstance(on, str) else list(on)

    l_schema = _arrow_schema(left_ds)
    r_schema = _arrow_schema(right_ds)
    l_cols = list(l_schema.names)
    r_cols = list(r_schema.names)
    shared = [c for c in r_cols if c in l_cols and c not in on]
    if shared:
        raise ValueError(f"non-key columns appear on both sides: {shared}")

    all_fields = [(n, l_schema.field(n).type) for n in l_cols] + [
        (n, r_schema.field(n).type) for n in r_cols if n not in on
    ]

    def _tag(side: str, own_cols: list[str]):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            # SQL NULL semantics: a null key never matches anything (pandas
            # merge would pair NaN with NaN, and a nulled int64 key crashes
            # the dtype-restore cast).  Null-keyed rows DROP for sides whose
            # rows can only appear via a match, and ride a reserved
            # right-free bucket for sides that must survive unmatched.
            null_mask = pc.is_null(batch[on[0]])
            for c in on[1:]:
                null_mask = pc.or_(null_mask, pc.is_null(batch[c]))
            keep_unmatched = (side == "l" and how in ("left", "outer")) or (
                side == "r" and how in ("right", "outer"))
            nulls = batch.filter(null_mask) if keep_unmatched else None
            batch = batch.filter(pc.invert(null_mask))

            def shape(b: pa.Table, bucket) -> pa.Table:
                n = len(b)
                key_df = pd.DataFrame({c: b[c].to_pandas() for c in on})
                cols = {}
                for name, typ in all_fields:
                    cols[name] = (
                        b[name] if name in own_cols else pa.nulls(n, typ)
                    )
                cols["__bucket"] = pa.array(
                    np.full(n, bucket, np.int64) if bucket is not None
                    else _bucket_col(key_df, on, num_buckets))
                cols["__side"] = pa.array([side] * n, pa.string())
                return pa.table(cols)

            out = shape(batch, None)
            if nulls is not None and len(nulls):
                # -1 for left nulls, -2 for right nulls: buckets the other
                # side never lands in, so the per-bucket merge emits them
                # unmatched with typed-null padding
                out = pa.concat_tables(
                    [out, shape(nulls, -1 if side == "l" else -2)])
            return out

        return fn

    tagged = left_ds.map_batches(_tag("l", l_cols), batch_format="pyarrow").union(
        right_ds.map_batches(_tag("r", r_cols), batch_format="pyarrow")
    )

    out_names = [n for n, _ in all_fields]
    out_schema = pa.schema([pa.field(n, t) for n, t in all_fields])

    def _merge_bucket(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if len(group) and group["__bucket"][0].as_py() < 0:
            # reserved null-key bucket: one side's unmatched rows, already
            # padded with typed nulls — pass through, no merge (and no
            # pandas pass that would NaN-ify the nulled int64 key)
            return group.select(out_names).cast(out_schema)
        side = pc.equal(group["__side"], "l")
        lhs = group.filter(side).select(l_cols).to_pandas()
        rhs = group.filter(pc.invert(side)).select(r_cols).to_pandas()
        # key dtypes can drift (object/float) when a block rode through a
        # pandas pass upstream; a merge between drifted and clean dtypes
        # silently matches nothing — normalize both sides to the left
        # schema's dtype before merging
        for k in on:
            target = l_schema.field(k).type.to_pandas_dtype()
            if lhs[k].dtype != target:
                lhs[k] = lhs[k].astype(target)
            if rhs[k].dtype != target:
                rhs[k] = rhs[k].astype(target)
        merged = lhs.merge(rhs, on=on, how=how)
        if len(merged) == 0:
            # pin the schema on empty buckets: column-less pandas frames
            # poison downstream unions/sorts
            return out_schema.empty_table()
        try:
            # hand Ray an arrow block with the declared types so every
            # bucket's output concatenates cleanly
            return pa.Table.from_pandas(
                merged[out_names], schema=out_schema, preserve_index=False
            )
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            # outer joins introduce nulls pandas can't hold in the declared
            # dtype (e.g. int64 + NaN): fall back to the pandas block
            return pa.Table.from_pandas(merged[out_names], preserve_index=False)

    return tagged.groupby("__bucket").map_groups(_merge_bucket, batch_format="pyarrow")


def key_filter_join(left_ds, right_ds, on, how: str = "semi",
                    num_buckets: int = 64):
    """Semi / anti join: keep (``semi``) or drop (``anti``) left rows whose
    key combination exists on the right.

    The right side contributes only its KEY columns (deduplicated per batch
    before the shuffle), so the exchange moves the left rows plus at most
    one key row per (distinct right key, block) — never the right payload.
    """
    import pyarrow as pa

    if how not in ("semi", "anti"):
        raise ValueError(f"how must be 'semi' or 'anti', got {how!r}")
    on = [on] if isinstance(on, str) else list(on)

    l_schema = _arrow_schema(left_ds)
    l_cols = list(l_schema.names)
    out_schema = pa.schema([pa.field(n, l_schema.field(n).type) for n in l_cols])

    def tag_left(batch: pa.Table) -> pa.Table:
        key_df = pd.DataFrame({c: batch[c].to_pandas() for c in on})
        return batch.append_column(
            "__bucket", pa.array(_bucket_col(key_df, on, num_buckets))
        ).append_column("__side", pa.array(np.zeros(len(batch), np.int8)))

    def tag_right(batch: pa.Table) -> pa.Table:
        # SQL EXISTS semantics: a NULL key never matches anything — drop
        # null-keyed right rows so pandas' NaN==NaN merge can't pair them
        keys = batch.select(on).to_pandas().dropna(subset=on).drop_duplicates()
        n = len(keys)
        cols = {}
        for name in l_cols:
            if name in on:
                cols[name] = pa.Array.from_pandas(
                    keys[name], type=l_schema.field(name).type
                )
            else:
                cols[name] = pa.nulls(n, l_schema.field(name).type)
        cols["__bucket"] = pa.array(_bucket_col(keys, on, num_buckets))
        cols["__side"] = pa.array(np.ones(n, np.int8))
        return pa.table(cols)

    tagged = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.select_columns(on).map_batches(tag_right, batch_format="pyarrow")
    )

    def per_bucket(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_l = pc.equal(group["__side"], pa.scalar(0, pa.int8()))
        lhs = group.filter(is_l).select(l_cols).to_pandas()
        rkeys = (
            group.filter(pc.invert(is_l)).select(on).to_pandas().drop_duplicates()
        )
        for k in on:
            target = l_schema.field(k).type.to_pandas_dtype()
            if lhs[k].dtype != target:
                lhs[k] = lhs[k].astype(target)
            if rkeys[k].dtype != target:
                rkeys[k] = rkeys[k].astype(target)
        m = lhs.merge(rkeys, on=on, how="left", indicator="__in_right")
        keep = (m["__in_right"] == "both") if how == "semi" else (
            m["__in_right"] == "left_only"
        )
        out = m.loc[keep, l_cols]
        if len(out) == 0:
            return out_schema.empty_table()
        try:
            # pin the declared schema so every bucket's block concatenates
            # cleanly (from_pandas alone can drift string/large_string etc.)
            return pa.Table.from_pandas(
                out, schema=out_schema, preserve_index=False
            )
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            return pa.Table.from_pandas(out, preserve_index=False)

    return tagged.groupby("__bucket").map_groups(per_bucket, batch_format="pyarrow")


# --- bloom-filter join pruning ---------------------------------------------
def _key_hash64(df: pd.DataFrame, on: list[str]) -> np.ndarray:
    """uint64 key hash (same family as ``_bucket_col``, pre-modulus)."""
    h = pd.util.hash_pandas_object(df[on[0]], index=False).to_numpy()
    for c in on[1:]:
        h = h * np.uint64(31) + pd.util.hash_pandas_object(
            df[c], index=False
        ).to_numpy()
    return h.astype(np.uint64)


def _bloom_positions(h: np.ndarray, num_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing: h1 + i*h2 (uint64 wraparound)."""
    h2 = (h ^ (h >> np.uint64(33))) * np.uint64(0x9E3779B97F4A7C15)
    i = np.arange(k, dtype=np.uint64)
    return ((h[:, None] + i[None, :] * h2[:, None]) % np.uint64(num_bits)).astype(
        np.int64
    )


def build_bloom_filter(ds, on, num_bits: int | None = None, k: int = 4):
    """Distributed bloom filter of a Dataset's key column(s).

    Each block emits one packed bitset (num_bits/8 bytes); bitsets OR-reduce
    in a two-level tree (per-partition combine, then a bounded driver fold of
    <= 8 rows) so driver traffic stays O(num_bits), never O(blocks).
    ``num_bits=None`` sizes the filter to ~20 bits/row (fp ~2e-4 at k=4,
    floor 2^17) so a small key side doesn't pay megabyte bitsets through the
    reduce; pass an explicit power of two to pin it.
    """
    import pyarrow as pa

    on = [on] if isinstance(on, str) else list(on)
    if num_bits is None:
        n = max(int(ds.count() or 0), 1)
        num_bits = 1 << max(17, int(np.ceil(np.log2(20 * n))))
    nbytes = num_bits // 8

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(nbytes, dtype=np.uint8)
        pos = _bloom_positions(
            _key_hash64(batch.dropna(subset=on), on), num_bits, k
        ).ravel()
        np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        return pd.DataFrame({"bits": [bits.tobytes()]})

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(nbytes, dtype=np.uint8)
        for b in batch["bits"]:
            acc |= np.frombuffer(b, dtype=np.uint8)
        return pd.DataFrame({"bits": [acc.tobytes()]})

    rows = (
        ds.select_columns(on)
        .map_batches(partial, batch_format="pandas")
        .repartition(8)
        .map_batches(combine, batch_format="pandas")
        .take_all()
    )
    acc = np.zeros(nbytes, dtype=np.uint8)
    for r in rows:
        acc |= np.frombuffer(r["bits"], dtype=np.uint8)
    return acc


def bloom_filtered_join(left_ds, right_ds, on, how: str = "inner",
                        num_buckets: int = 64, num_bits: int | None = None,
                        k: int = 4):
    """Inner hash join with bloom pre-pruning of the (big) left side.

    The classic distributed-join optimization: one cheap pass builds a bloom
    filter of the right side's keys, broadcast once via ``ray.put``; left
    rows whose keys cannot be on the right are dropped BEFORE the join
    shuffle, so the exchange moves only plausible matches (false positives
    merely ride along and drop in the per-bucket merge — results are exactly
    ``hash_join``'s).  Worth it when the right side is selective relative to
    the left; skip it when most left rows match anyway.
    """
    if how != "inner":
        raise ValueError("bloom pruning only preserves inner-join semantics")
    on = [on] if isinstance(on, str) else list(on)
    bits = build_bloom_filter(right_ds, on, num_bits, k)
    num_bits = len(bits) * 8
    bits_ref = ray.put(bits)

    def prune(batch: pd.DataFrame) -> pd.DataFrame:
        bits = np.frombuffer(fetch_broadcast(bits_ref), dtype=np.uint8)
        pos = _bloom_positions(_key_hash64(batch, on), num_bits, k)
        hit = (
            (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        ).all(axis=1)
        return batch[hit]

    pruned = left_ds.map_batches(prune, batch_format="pandas")
    return hash_join(pruned, right_ds, on=on, how="inner",
                     num_buckets=num_buckets)


# --- skew-aware salted join --------------------------------------------------
def _hot_keys(ds, on: list[str], hot_threshold: int, top_per_block: int = 64):
    """Approximate hot-key census: each block contributes its top-N key
    counts (bounded rows per block, never the key space), partials sum on
    the driver.  Keys whose (partial) count crosses ``hot_threshold`` are
    hot.  Under-count is possible for keys scattered thinly across blocks —
    harmless: a missed hot key degrades to the unsalted path, correctness
    unchanged (same argument as the flagship's pair-gen census)."""
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        c = batch.groupby(on, sort=False).size().nlargest(top_per_block)
        f = c.reset_index()
        f.columns = [*on, "__n"]
        return f

    rows = ds.select_columns(on).map_batches(
        partial, batch_format="pandas").to_pandas()
    if not len(rows):
        return rows.iloc[:0]
    total = rows.groupby(on, sort=False)["__n"].sum().reset_index()
    return total[total["__n"] >= hot_threshold][on]


def salted_join(left_ds, right_ds, on, how: str = "inner",
                num_buckets: int = 64, num_salts: int = 8,
                hot_threshold: int = 100_000):
    """Partitioned hash join that survives LEFT-side key skew.

    A hot key (appearing ``hot_threshold``+ times on the left) would land its
    entire row set in one bucket of ``hash_join`` — one straggler task owning
    the whole key.  Here hot-key left rows fan out across ``num_salts``
    sub-buckets by a deterministic row hash, and the RIGHT side's rows for
    those keys replicate to every sub-bucket (broadcast-side duplication is
    bounded: #hot_keys × right-rows-per-key × num_salts).  Cold keys take the
    plain path.  Results are exactly ``hash_join``'s for inner/left joins.
    """
    import pyarrow as pa

    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    on = [on] if isinstance(on, str) else list(on)

    hot = _hot_keys(left_ds, on, hot_threshold)
    if len(hot) == 0:
        return hash_join(left_ds, right_ds, on=on, how=how,
                         num_buckets=num_buckets)
    hot_ref = ray.put(hot)

    salt_col = "__salt"

    def salt_left(batch: pd.DataFrame) -> pd.DataFrame:
        hotk = fetch_broadcast(hot_ref)
        batch = batch.copy()
        is_hot = batch.merge(
            hotk.assign(__hot=1), on=on, how="left")["__hot"].notna().to_numpy()
        # deterministic per-row salt: hash of the row's position-independent
        # payload hash keeps reruns identical
        row_h = pd.util.hash_pandas_object(batch, index=False).to_numpy()
        salt = (row_h % np.uint64(num_salts)).astype(np.int64)
        salt[~is_hot] = 0
        batch[salt_col] = salt
        return batch

    def salt_right(batch: pd.DataFrame) -> pd.DataFrame:
        hotk = fetch_broadcast(hot_ref)
        batch = batch.copy()
        is_hot = batch.merge(
            hotk.assign(__hot=1), on=on, how="left")["__hot"].notna().to_numpy()
        cold = batch[~is_hot].copy()
        cold[salt_col] = 0
        hot_rows = batch[is_hot]
        reps = []
        for s in range(num_salts):
            r = hot_rows.copy()
            r[salt_col] = s
            reps.append(r)
        return pd.concat([cold, *reps], ignore_index=True)

    lsalted = left_ds.map_batches(salt_left, batch_format="pandas")
    rsalted = right_ds.map_batches(salt_right, batch_format="pandas")
    joined = hash_join(lsalted, rsalted, on=[*on, salt_col], how=how,
                       num_buckets=num_buckets)

    def drop_salt(batch: pa.Table) -> pa.Table:
        return batch.drop_columns([salt_col])

    return joined.map_batches(drop_salt, batch_format="pyarrow")


# --- merge / upsert ----------------------------------------------------------
def merge_upsert(base_ds, updates_ds, on, num_buckets: int = 64,
                 version_col: str | None = None):
    """MERGE INTO semantics: rows from ``updates`` replace same-key rows of
    ``base``; update keys absent from base are inserts.  Both sides must
    share one schema.

    Distributed shape: union with a priority tag + ONE bucketed shuffle +
    vectorized per-bucket drop_duplicates(keep=update) — the grouped
    take-latest pattern, no join and no driver state.  If the updates feed
    can carry SEVERAL rows per key, pass ``version_col``: the max-version
    row wins deterministically.  Without it, block arrival order decides
    between same-key update rows — fine for feeds that are unique per key
    (the common case), not a guarantee worth relying on at scale.
    """
    import pyarrow as pa

    on = [on] if isinstance(on, str) else list(on)
    schema = _arrow_schema(base_ds)
    names = list(schema.names)

    def tag(pri: int):
        def fn(batch: pa.Table) -> pa.Table:
            batch = batch.select(names)  # enforce one column order
            key_df = pd.DataFrame({c: batch[c].to_pandas() for c in on})
            return batch.append_column(
                "__pri", pa.array(np.full(len(batch), pri, np.int8))
            ).append_column(
                "__bucket", pa.array(_bucket_col(key_df, on, num_buckets))
            )
        return fn

    tagged = base_ds.map_batches(tag(0), batch_format="pyarrow").union(
        updates_ds.map_batches(tag(1), batch_format="pyarrow")
    )

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        # stable sort by (priority, version): keep="last" → the max-version
        # update row wins, else the base row survives
        sort_cols = ["__pri"] + ([version_col] if version_col else [])
        g = group.sort_values(sort_cols, kind="mergesort")
        g = g.drop_duplicates(subset=on, keep="last")
        return g.drop(columns=["__pri", "__bucket"])

    return tagged.groupby("__bucket").map_groups(
        per_bucket, batch_format="pandas")




def interval_join(points, intervals, point_ts: str, start_col: str,
                  end_col: str, point_cols: list[str],
                  interval_cols: list[str], out_types: dict,
                  band_us: int, num_buckets: int = 32):
    """Banded interval (range) join: every point row pairs with every
    interval row whose ``[start, end)`` contains its timestamp — no
    equality key required (the pure range join Ray Data lacks; the
    reference has no analogue either, this is an engine-native §2.15 op).

    Partitioning: time is cut into fixed bands of ``band_us`` µs.  Each
    interval replicates to every band it overlaps (≤ ceil(width/band)+1
    copies — keep ``band_us`` at or above the typical interval width so
    the factor stays ≤ 2); each point lands in exactly ONE band; a single
    tagged-union hash shuffle co-locates band-mates; a pair can only meet
    in the point's band, so the output needs no dedup.  In-bucket work is
    a vectorized pandas equality-merge on the band id plus the exact range
    filter.  Skew knob: the band width — size it so one band holds minutes
    of data; a still-hot band can additionally salt its points and
    replicate that band's intervals per salt.

    ``out_types`` pins the output Arrow schema (= point_cols +
    interval_cols); per-bucket pandas passes drift null-padded int64s to
    float64 otherwise (see hash_join note in ray-data gotchas).
    """
    import pyarrow as pa

    band_us = int(band_us)
    all_cols = list(point_cols) + list(interval_cols)
    out_schema = pa.schema([(c, out_types[c]) for c in all_cols])

    def _tag(batch: pa.Table, side: int, bands: np.ndarray,
             rep: np.ndarray | None, extra: dict) -> pa.Table:
        own = point_cols if side == 0 else interval_cols
        other = interval_cols if side == 0 else point_cols
        take = pa.array(rep) if rep is not None else None
        cols = {}
        for c in own:
            cols[c] = batch[c].take(take) if take is not None else batch[c]
        n = len(bands)
        for c in other:
            cols[c] = pa.nulls(n, out_schema.field(c).type)
        for name, arr in extra.items():
            cols[name] = pa.array(arr, pa.int64())
        cols["__side"] = pa.array(np.full(n, side, np.int8))
        cols["__band"] = pa.array(bands, pa.int64())
        cols["__bucket"] = pa.array(
            (bands % num_buckets + num_buckets) % num_buckets, pa.int64())
        return pa.table(cols)

    def tag_points(batch: pa.Table) -> pa.Table:
        ts = batch[point_ts].cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = len(ts)
        zero = np.zeros(n, np.int64)
        return _tag(batch, 0, ts // band_us, None,
                    {"__ts": ts, "__lo": zero, "__hi": zero})

    def tag_intervals(batch: pa.Table) -> pa.Table:
        s = batch[start_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        e = batch[end_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        b0 = s // band_us
        b1 = np.maximum(b0, (e - 1) // band_us)  # end-exclusive
        counts = (b1 - b0 + 1).astype(np.int64)
        rep = np.repeat(np.arange(len(s), dtype=np.int64), counts)
        off = np.arange(rep.size, dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts)
        return _tag(batch, 1, b0[rep] + off, rep,
                    {"__ts": np.zeros(rep.size, np.int64),
                     "__lo": s[rep], "__hi": e[rep]})

    unioned = points.map_batches(tag_points, batch_format="pyarrow").union(
        intervals.map_batches(tag_intervals, batch_format="pyarrow"))

    def per_bucket(group: pd.DataFrame) -> pa.Table:
        p = group[group["__side"] == 0]
        iv = group[group["__side"] == 1]
        if p.empty or iv.empty:
            return out_schema.empty_table()
        m = p[["__band", "__ts"] + point_cols].merge(
            iv[["__band", "__lo", "__hi"] + interval_cols], on="__band")
        # µs epochs < 2^53: exact through any float64 dtype drift
        keep = (m["__ts"] >= m["__lo"]) & (m["__ts"] < m["__hi"])
        sel = m.loc[keep, all_cols]
        return pa.Table.from_pandas(sel, preserve_index=False).cast(out_schema)

    return unioned.groupby("__bucket").map_groups(
        per_bucket, batch_format="pandas")


def table_diff(old_ds, new_ds, key_cols, compare_cols,
               num_buckets: int = 32):
    """Row-level diff of two keyed tables: one FULL-OUTER partitioned hash
    join, then a vectorized column compare — emits (key, status) rows with
    status ∈ {added, removed, changed}; unchanged rows emit nothing, so
    the output is delta-sized (the anti-entropy / CDC primitive; pairs
    with the table digest for cheap equality pre-checks).

    Both sides' compare columns ride the join padded with typed nulls;
    NULL == NULL counts as equal (IS NOT DISTINCT FROM semantics, matching
    the SQL oracle).
    """
    import pyarrow as pa

    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)

    def tag(side: str):
        def fn(batch: pa.Table) -> pa.Table:
            cols = {c: batch[c] for c in key_cols}
            for c in compare_cols:
                cols[f"{side}_{c}"] = batch[c]
            # dedicated presence flag: a legitimately-NULL compare column
            # must not read as an absent row
            cols[f"{side}_present"] = pa.array(
                np.ones(len(batch), np.int8), pa.int8())
            return pa.table(cols)
        return fn

    old_t = old_ds.map_batches(tag("old"), batch_format="pyarrow")
    new_t = new_ds.map_batches(tag("new"), batch_format="pyarrow")
    j = hash_join(old_t, new_t, on=key_cols, how="outer",
                  num_buckets=num_buckets)

    def classify(batch: pd.DataFrame) -> pd.DataFrame:
        has_old = batch["old_present"].notna()
        has_new = batch["new_present"].notna()
        # NULL-safe equality per compare column
        same = np.ones(len(batch), dtype=bool)
        for c in compare_cols:
            a, b = batch[f"old_{c}"], batch[f"new_{c}"]
            same &= (a.eq(b) | (a.isna() & b.isna())).to_numpy()
        status = np.where(~has_old, "added",
                          np.where(~has_new, "removed",
                                   np.where(same, "same", "changed")))
        out = batch[key_cols].copy()
        out["status"] = status
        return out[out["status"] != "same"]

    return j.map_batches(classify, batch_format="pandas")
