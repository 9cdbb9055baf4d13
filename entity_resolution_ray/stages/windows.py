"""Time-window operators: sliding-window aggregation and a banded interval
self-join (range join).

Both are single-logical-shuffle compositions designed for the streaming
executor:

* ``sliding_window`` replicates each row to the (window/slide) windows that
  contain it inside ``map_batches`` (vectorized ``np.repeat``), then runs the
  partial-combining ``grouped_aggregate``.  The shuffle moves at most one
  partial row per (key, window, input block) — never the replicated events.
  Replication factor is the bounded constant window/slide (e.g. 6 for a
  6h/1h window), so this holds at any data scale.

* ``interval_neighbor_count`` is the classic banded range join: time is cut
  into bands of width = radius; the build side lands in its home band, the
  probe side is replicated to the 3 candidate bands, and the exact predicate
  |Δts| ≤ radius is verified inside each (key, band) group with a sorted
  ``searchsorted`` count — no per-row Python, no all-pairs.  Partitioning
  assumption: one (key, band) group fits in a task; salt hot keys by
  sub-band if a single key×band is unbounded.

Reference anchor: the reference's windowed/temporal handling lives in its
date/time standardisation visitors (am_combiner/features/frontend.py) and the
annotation time joins; these operators generalize that tier to streaming
window analytics over an events table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .aggregate import _add_bucket, grouped_aggregate


def sliding_window(
    ds,
    ts_col: str,
    key_col: str,
    value_col: str,
    window_s: int,
    slide_s: int,
    num_buckets: int = 64,
):
    """Per-(key, window_start) count + sum over a sliding window.

    ``window_s`` must be a multiple of ``slide_s``; each row contributes to
    exactly ``window_s // slide_s`` windows whose starts are the ``slide``-
    aligned instants in ``(ts - window, ts]``.
    """
    if window_s % slide_s:
        raise ValueError("window_s must be a multiple of slide_s")
    k = window_s // slide_s
    slide_ns = np.int64(slide_s) * 1_000_000_000

    def explode(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].to_numpy(zero_copy_only=False)
        ts_ns = ts.astype("datetime64[ns]").astype(np.int64)
        base = (ts_ns // slide_ns) * slide_ns  # slide-aligned floor
        n = len(ts_ns)
        idx = np.repeat(np.arange(n), k)
        offs = np.tile(np.arange(k, dtype=np.int64), n) * slide_ns
        starts = base[idx] - offs
        return pa.table(
            {
                key_col: batch[key_col].take(pa.array(idx)),
                "window_start": pa.array(
                    starts.astype("datetime64[ns]"), pa.timestamp("ns")
                ),
                value_col: batch[value_col].take(pa.array(idx)),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    out = grouped_aggregate(
        exploded,
        [key_col, "window_start"],
        {
            "n_events": (value_col, "size"),
            "sum_value": (value_col, "sum"),
        },
        num_buckets=num_buckets,
    )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[[key_col, "window_start", "n_events", "sum_value"]].copy()
        batch["sum_value"] = np.round(batch["sum_value"], 4)
        return batch

    return out.map_batches(finish, batch_format="pandas")


def partitioned_window(
    ds,
    keys,
    order_by,
    specs: dict,
    tie_cols: list[str] | None = None,
    num_buckets: int = 64,
):
    """General ranked / frame window functions per key partition — the
    distributed equivalent of ``fn() OVER (PARTITION BY keys ORDER BY
    order_by)`` for the whole-partition family SQL calls ranked windows.

    ``order_by`` is a list of ``(col, ascending)`` pairs (or bare column
    names, ascending).  ``specs`` maps output column → spec tuple:

    * ``("row_number",)`` — 1-based position in the partition
    * ``("rank",)`` / ``("dense_rank",)`` — ties detected on the
      ``order_by`` columns ONLY (``tie_cols`` break the sort for the
      sequential functions below without entering tie detection, exactly
      like SQL where rank is tie-invariant but lag/lead need a total order)
    * ``("lag", col, offset)`` / ``("lead", col, offset)``
    * ``("cumsum", col)`` / ``("cummin", col)`` / ``("cummax", col)`` —
      ROWS UNBOUNDED PRECEDING..CURRENT ROW semantics (make the sort a
      total order when translating SQL's default RANGE frame)
    * ``("ntile", n)`` — follows the TOTAL order (``order_by`` +
      ``tie_cols``), as SQL's NTILE is only deterministic over one
    * ``("percent_rank",)`` / ``("cume_dist",)`` — tie-invariant on the
      ``order_by`` columns, like rank

    One hash-bucket shuffle moves each row once; every partition lands
    whole in exactly one bucket task and is processed with vectorized
    pandas/numpy (no per-row Python).  Partitioning assumption: a single
    key's partition fits in one task — the same contract as SQL's
    PARTITION BY; salt or pre-aggregate upstream if a key is unbounded.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    order_by = [
        (o, True) if isinstance(o, str) else (o[0], bool(o[1]))
        for o in order_by
    ]
    tie_cols = tie_cols or []
    order_cols = [c for c, _ in order_by]
    sort_cols = keys + order_cols + tie_cols
    ascending = [True] * len(keys) + [a for _, a in order_by] + [True] * len(
        tie_cols
    )
    for out, spec in specs.items():
        if spec[0] not in ("row_number", "rank", "dense_rank", "lag", "lead",
                           "cumsum", "cummin", "cummax", "ntile",
                           "percent_rank", "cume_dist"):
            raise ValueError(f"unsupported window fn {spec[0]!r} for {out!r}")

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(sort_cols, ascending=ascending, kind="mergesort")
        g = g.drop(columns="__bucket").reset_index(drop=True)
        n = len(g)
        gb = g.groupby(keys, sort=False, dropna=False)
        rn = gb.cumcount().to_numpy() + 1
        need_cnt = any(s[0] in ("ntile", "percent_rank", "cume_dist")
                       for s in specs.values())
        if need_cnt:
            cnt = gb[sort_cols[0]].transform("size").to_numpy(np.int64)
        need_rank = any(s[0] in ("rank", "dense_rank", "percent_rank",
                                 "cume_dist") for s in specs.values())
        if need_rank:
            new_key = rn == 1
            same_order = np.ones(n, dtype=bool)
            for c in order_cols:
                v = g[c].to_numpy()
                prev_eq = np.concatenate([[False], v[1:] == v[:-1]])
                both_na = np.concatenate(
                    [[False], pd.isna(v[1:]) & pd.isna(v[:-1])]
                )
                same_order &= prev_eq | both_na
            new_tie = new_key | ~same_order
            idx = np.arange(n)
            tie_start = np.maximum.accumulate(np.where(new_tie, idx, 0))
            key_start = np.maximum.accumulate(np.where(new_key, idx, 0))
            if any(s[0] == "cume_dist" for s in specs.values()):
                # last index of each contiguous tie group
                starts_idx = np.flatnonzero(new_tie)
                group_id = np.cumsum(new_tie) - 1
                ends = np.append(starts_idx[1:], n) - 1
                tie_end = ends[group_id]
        out = g.copy()
        for name, spec in specs.items():
            fn = spec[0]
            if fn == "row_number":
                out[name] = rn
            elif fn == "rank":
                out[name] = rn[tie_start]
            elif fn == "dense_rank":
                csum = np.cumsum(new_tie)
                out[name] = csum - csum[key_start] + 1
            elif fn == "ntile":
                # SQL NTILE: sizes as equal as possible, the first
                # (cnt mod n) buckets take the extra row
                nt = np.int64(spec[1])
                q, r = cnt // nt, cnt % nt
                boundary = r * (q + 1)
                in_big = (rn - 1) < boundary
                big = (rn - 1) // np.maximum(q + 1, 1)
                small = r + (rn - 1 - boundary) // np.maximum(q, 1)
                out[name] = np.where(in_big, big, small) + 1
            elif fn == "percent_rank":
                rank = rn[tie_start]
                out[name] = np.where(cnt > 1, (rank - 1) / np.maximum(cnt - 1, 1), 0.0)
            elif fn == "cume_dist":
                out[name] = (tie_end - key_start + 1) / cnt
            elif fn in ("lag", "lead"):
                col, offset = spec[1], (spec[2] if len(spec) > 2 else 1)
                shift = offset if fn == "lag" else -offset
                out[name] = gb[col].shift(shift)
            else:  # cumsum / cummin / cummax
                out[name] = gb[spec[1]].transform(fn)
        return out

    tagged = ds.map_batches(
        lambda b: _add_bucket(b, keys, num_buckets), batch_format="pandas"
    )
    return tagged.groupby("__bucket").map_groups(
        per_bucket, batch_format="pandas"
    )


def interval_neighbor_count(
    ds,
    key_col: str,
    ts_col: str,
    id_col: str,
    radius_s: int,
    num_buckets: int = 64,
):
    """For every row: how many OTHER rows with the same key fall within
    ±radius seconds.  Emits (id_col, n_neighbors) for every input row,
    including zero-neighbor rows (left-join semantics)."""
    radius_ns = np.int64(radius_s) * 1_000_000_000

    def tag(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].to_numpy(zero_copy_only=False)
        ts_ns = ts.astype("datetime64[ns]").astype(np.int64)
        band = ts_ns // radius_ns
        n = len(ts_ns)
        # build copy: home band only; probe copies: bands band-1, band, band+1
        idx = np.concatenate([np.arange(n)] * 4)
        bands = np.concatenate([band, band - 1, band, band + 1])
        side = np.concatenate(
            [np.zeros(n, np.int8), np.ones(3 * n, np.int8)]
        )
        key = batch[key_col].take(pa.array(idx)).to_numpy(zero_copy_only=False)
        # dtype-generic key hash (string keys included), same partitioner
        # family as _bucket_col/_add_bucket elsewhere in the codebase
        kh = pd.util.hash_pandas_object(
            pd.Series(key), index=False
        ).to_numpy(np.uint64)
        bucket = (
            kh * np.uint64(0x9E3779B97F4A7C15) + bands.astype(np.uint64)
        ) % np.uint64(num_buckets)
        return pa.table(
            {
                id_col: batch[id_col].take(pa.array(idx)),
                key_col: batch[key_col].take(pa.array(idx)),
                "__ts_ns": pa.array(ts_ns[idx]),
                "__band": pa.array(bands),
                "__side": pa.array(side),
                "__bucket": pa.array(bucket.astype(np.int64)),
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    def _segments(k: np.ndarray, b: np.ndarray):
        # elementwise != (not np.diff) so object/string key arrays work
        chg = np.flatnonzero((k[1:] != k[:-1]) | (b[1:] != b[:-1]))
        starts = np.concatenate([[0], chg + 1])
        ends = np.concatenate([chg + 1, [len(k)]])
        return starts, ends

    def count_in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        side = group["__side"].to_numpy()
        key = group[key_col].to_numpy()
        band = group["__band"].to_numpy()
        ts = group["__ts_ns"].to_numpy()
        ids = group[id_col].to_numpy()
        isb = side == 0
        bk, bb, bt = key[isb], band[isb], ts[isb]
        ob = np.lexsort((bt, bb, bk))
        bk, bb, bt = bk[ob], bb[ob], bt[ob]
        pk, pb, pt, pid = key[~isb], band[~isb], ts[~isb], ids[~isb]
        op = np.lexsort((pt, pb, pk))
        pk, pb, pt, pid = pk[op], pb[op], pt[op], pid[op]
        if not len(pt):
            return pd.DataFrame(
                {id_col: pid, "n_neighbors": np.zeros(0, np.int64)}
            )
        cnt = np.zeros(len(pt), np.int64)
        if len(bt):
            bs, be = _segments(bk, bb)
            ps, pe = _segments(pk, pb)
            # align probe segments to build segments on (key, band) with a
            # small C-speed merge over segment heads (≤ one row per group)
            m = pd.DataFrame(
                {"k": pk[ps], "b": pb[ps], "ps": ps, "pe": pe}
            ).merge(
                pd.DataFrame({"k": bk[bs], "b": bb[bs], "s": bs, "e": be}),
                on=["k", "b"],
                how="inner",
            )
            for p0, p1, s0, s1, b_ in m[["ps", "pe", "s", "e", "b"]].itertuples(
                index=False
            ):
                seg = bt[s0:s1]
                q = pt[p0:p1]
                c = np.searchsorted(seg, q + radius_ns, side="right") - \
                    np.searchsorted(seg, q - radius_ns, side="left")
                # a probe's own build copy lives exactly in its home band
                # (__band == floor(ts/radius)); subtract that self-match
                cnt[p0:p1] = c - (q // radius_ns == b_)
        return pd.DataFrame(
            {id_col: pid, "n_neighbors": cnt}
        )

    per_band = tagged.groupby("__bucket").map_groups(
        count_in_bucket, batch_format="pandas"
    )
    # 3 partial rows per id (one per visited band) → tiny final sum
    return grouped_aggregate(
        per_band, id_col, {"n_neighbors": ("n_neighbors", "sum")},
        num_buckets=max(8, num_buckets // 4),
    )
