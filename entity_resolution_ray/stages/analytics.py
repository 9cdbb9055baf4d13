"""Distributed analytic aggregates: per-group top-k, exact grouped
percentiles, pivoted conditional counts, and exact distinct counts.

All four follow the same scale discipline as ``grouped_aggregate``: a
vectorized per-batch PARTIAL inside ``map_batches`` shrinks what the shuffle
has to move (≤ k rows per key per block for top-k, one row per distinct
(key, value) per block for percentiles/distinct, one row per key per block
for pivots), then ONE bucket shuffle finishes the job.

Scale assumptions, stated:

* ``grouped_percentiles`` is EXACT and shuffles one row per distinct
  (key, value) pair — the right tier for bounded-cardinality values
  (prices, scores, counts).  For unbounded continuous values use
  ``grouped_percentiles_unbounded`` (histogram refinement, below).
* ``topk_per_group`` / ``distinct_count`` bucket by key hash; a single hot
  key holds ≤ (k × num_blocks) / ≤ (its distinct values) rows in one task.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .aggregate import _add_bucket, grouped_aggregate


def _round_half_away(x, d: int):
    """SQL-style round-half-away-from-zero (DuckDB/ANSI): np.round's
    banker's rounding diverges on exact .5 ties at the target precision —
    e.g. percentile midpoints of 4-dp money values land on .00005 exactly."""
    f = 10.0 ** d
    return np.sign(x) * np.floor(np.abs(x) * f + 0.5) / f


def topk_per_group(
    ds,
    keys,
    order_col: str,
    k: int,
    descending: bool = True,
    tie_cols: list[str] | None = None,
    num_buckets: int = 64,
):
    """Top-``k`` rows per key combination by ``order_col`` (ties broken by
    ``tie_cols`` ascending), with a 1-based ``rn`` rank column.

    Partial top-k inside each block means the shuffle never moves more than
    k rows per (key, block) — the distributed equivalent of
    ``row_number() over (partition by keys order by ...) <= k``.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    tie_cols = tie_cols or []
    sort_cols = keys + [order_col] + tie_cols
    ascending = [True] * len(keys) + [not descending] + [True] * len(tie_cols)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch.sort_values(sort_cols, ascending=ascending, kind="mergesort")
        top = s.groupby(keys, sort=False, dropna=False).head(k)
        return _add_bucket(top, keys, num_buckets)

    def final(group: pd.DataFrame) -> pd.DataFrame:
        s = group.sort_values(sort_cols, ascending=ascending, kind="mergesort")
        top = s.groupby(keys, sort=False, dropna=False).head(k).copy()
        top["rn"] = top.groupby(keys, sort=False, dropna=False).cumcount() + 1
        return top.drop(columns="__bucket")

    partials = ds.map_batches(partial, batch_format="pandas")
    return partials.groupby("__bucket").map_groups(final, batch_format="pandas")


def grouped_percentiles(
    ds,
    keys,
    value_col: str,
    quantiles: dict[str, float],
    round_to: int = 4,
    num_buckets: int = 64,
):
    """Exact ``percentile_cont`` per key: one output row per key combination
    with a column per entry of ``quantiles`` (e.g. {"p50": 0.5, "p90": 0.9})
    plus ``n`` (the group count)."""
    keys = [keys] if isinstance(keys, str) else list(keys)

    counts = grouped_aggregate(
        ds,
        keys + [value_col],
        {"__cnt": (value_col, "size")},
        num_buckets=num_buckets,
    )

    def quantile_group(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(value_col, kind="mergesort")
        v = g[value_col].to_numpy(np.float64)
        c = g["__cnt"].to_numpy(np.int64).cumsum()
        n = int(c[-1])
        # x[j] (0-based j of the expanded sorted multiset) = v[first i with
        # c[i] > j]; percentile_cont interpolates x[floor(h)]..x[ceil(h)]
        row = {k_: group[k_].iloc[0] for k_ in keys}
        for name, q in quantiles.items():
            h = (n - 1) * q
            lo = int(np.floor(h))
            hi = int(np.ceil(h))
            xlo = v[np.searchsorted(c, lo, side="right")]
            xhi = v[np.searchsorted(c, hi, side="right")]
            row[name] = _round_half_away(xlo + (h - lo) * (xhi - xlo), round_to)
        row["n"] = n
        return pd.DataFrame([row])

    return counts.groupby(keys).map_groups(quantile_group, batch_format="pandas")


def pivot_counts(
    ds,
    keys,
    pivot_col: str,
    values: list[str],
    prefix: str = "n_",
    num_buckets: int = 64,
):
    """Conditional-count pivot: one row per key combination, one int64 column
    ``{prefix}{v}`` per pivot value.  ``values`` is explicit so the output
    schema is static (a scan for distinct values is the caller's choice)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    out_cols = [f"{prefix}{v}" for v in values]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        # group over ALL rows (not just rows matching `values`): a key whose
        # rows all carry other pivot values must still emit an all-zero row,
        # exactly like SQL conditional counts grouped over the full table
        p = (
            batch.groupby(keys + [pivot_col], sort=False, dropna=False)
            .size()
            .unstack(pivot_col, fill_value=0)
            .reindex(columns=values, fill_value=0)
        )
        p.columns = out_cols
        return p.reset_index()

    partials = ds.map_batches(partial, batch_format="pandas")
    return grouped_aggregate(
        partials,
        keys,
        {c: (c, "sum") for c in out_cols},
        num_buckets=num_buckets,
    )


def rollup_aggregate(
    ds,
    keys,
    agg: dict[str, tuple[str, str]],
    lvl_col: str = "lvl",
    num_buckets: int = 64,
):
    """GROUP BY ROLLUP(keys): every prefix level plus the grand total,
    ``lvl_col`` = number of rolled-up keys (== SQL ``GROUPING(k1)+…``).
    See ``grouping_sets_aggregate`` for semantics and scale notes."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    specs = [
        (tuple(keys[: len(keys) - lvl]), lvl) for lvl in range(len(keys) + 1)
    ]
    return grouping_sets_aggregate(
        ds, keys, specs, agg, lvl_col=lvl_col, num_buckets=num_buckets
    )


def cube_aggregate(
    ds,
    keys,
    agg: dict[str, tuple[str, str]],
    lvl_col: str = "grp",
    num_buckets: int = 64,
):
    """GROUP BY CUBE(keys): every subset of ``keys``, ``lvl_col`` = the SQL
    GROUPING bitmask (``grouping(k1)*2^(n-1) + … + grouping(kn)``), which —
    unlike a rolled-count — identifies the subset uniquely even when data
    keys are genuinely null.  See ``grouping_sets_aggregate``."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    n = len(keys)
    specs = []
    for mask in range(2 ** n):
        kept = tuple(k for i, k in enumerate(keys) if not (mask >> (n - 1 - i)) & 1)
        specs.append((kept, mask))
    return grouping_sets_aggregate(
        ds, keys, specs, agg, lvl_col=lvl_col, num_buckets=num_buckets
    )


def grouping_sets_aggregate(
    ds,
    keys,
    sets: list[tuple],
    agg: dict[str, tuple[str, str]],
    lvl_col: str = "grp",
    num_buckets: int = 64,
):
    """GROUP BY GROUPING SETS in ONE shuffle: each entry of ``sets`` is
    ``(kept_key_columns, lvl_value)`` — rolled-up key columns come back
    null and ``lvl_col`` carries the given marker (use the SQL GROUPING
    bitmask so rows from different sets can never be conflated, even when
    data keys are genuinely null).

    ``agg`` = {out_col: (in_col, fn)}, fn ∈ {sum, count, size, min, max,
    mean} — the re-aggregatable set: each batch is pre-aggregated at the
    finest level (all ``keys``), every requested set is derived from those
    partials *inside the batch*, and one bucket shuffle merges.  Shuffle
    volume is ≤ (len(sets) × distinct finest keys per batch) rows, never
    the input.
    """
    import pyarrow as pa

    from .joins import _arrow_schema

    keys = [keys] if isinstance(keys, str) else list(keys)
    level_specs = []
    for kept, lvl in sets:
        kept = [kept] if isinstance(kept, str) else list(kept)
        if any(k not in keys for k in kept):
            raise ValueError(f"grouping set {kept!r} not a subset of {keys!r}")
        level_specs.append((kept, lvl))
    for out_col, (in_col, fn) in agg.items():
        if fn not in ("sum", "count", "size", "min", "max", "mean"):
            raise ValueError(f"unsupported rollup fn {fn!r} for {out_col!r}")

    # numeric key columns ride as float64 (NaN = rolled-up) so every block
    # converts to the same Arrow type; int+None object columns otherwise
    # resolve per-block to int64 or float64 and the output representation
    # drifts (the nullable-int story DuckDB's .df() answers the same way)
    schema = _arrow_schema(ds)
    numeric_keys = {
        k for k in keys
        if pa.types.is_integer(schema.field(k).type)
        or pa.types.is_floating(schema.field(k).type)
    }

    def _pin_key_types(f: pd.DataFrame) -> pd.DataFrame:
        for k in keys:
            if k in numeric_keys:
                f[k] = f[k].astype(np.float64)
            else:
                col = f[k]
                f[k] = col.astype(object).where(pd.notna(col), None)
        return f

    # partial column layout (shared by the in-batch derive and the merge)
    def _partial_cols(g, src: pd.DataFrame | None):
        cols = {}
        for out_col, (in_col, fn) in agg.items():
            if fn in ("count", "size"):
                cols[f"{out_col}__cnt"] = (
                    g.size() if src is None else g[f"{out_col}__cnt"].sum()
                )
            elif fn == "mean":
                # SQL AVG denominator is the NON-NULL count, not group size
                cols[f"{out_col}__sum"] = (
                    g[in_col].sum() if src is None
                    else g[f"{out_col}__sum"].sum()
                )
                cols[f"{out_col}__cnt"] = (
                    g[in_col].count() if src is None
                    else g[f"{out_col}__cnt"].sum()
                )
            elif fn == "sum":
                cols[f"{out_col}__sum"] = (
                    g[in_col].sum() if src is None
                    else g[f"{out_col}__sum"].sum()
                )
            else:  # min / max merge with themselves
                cols[f"{out_col}__{fn}"] = (
                    g[in_col].agg(fn) if src is None
                    else g[f"{out_col}__{fn}"].agg(fn)
                )
        return cols

    pcol_names: list[str] = []
    for out_col, (_in, fn) in agg.items():
        if fn in ("count", "size"):
            pcol_names.append(f"{out_col}__cnt")
        elif fn == "mean":
            pcol_names += [f"{out_col}__sum", f"{out_col}__cnt"]
        else:
            pcol_names.append(f"{out_col}__{fn}")
    pcol_names = list(dict.fromkeys(pcol_names))

    def _null_out(f: pd.DataFrame, rolled: list[str]) -> pd.DataFrame:
        for k in rolled:
            # object-typed None (not NaN) so the null survives string canon
            f[k] = pd.Series([None] * len(f), dtype=object)
        return f

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        finest = pd.DataFrame(
            _partial_cols(batch.groupby(keys, sort=False, dropna=False), None)
        ).reset_index()
        if not len(finest):
            # an empty batch must not fabricate a zero-count total row
            empty = _pin_key_types(
                pd.DataFrame({c: [] for c in keys + [lvl_col] + pcol_names})
            )
            empty[lvl_col] = empty[lvl_col].astype(np.int64)
            return _add_bucket(empty, keys + [lvl_col], num_buckets)
        frames = []
        for kept, lvl in level_specs:
            rolled = [k for k in keys if k not in kept]
            if len(kept) == len(keys):
                f = finest.copy()
            elif kept:
                g = finest.groupby(kept, sort=False, dropna=False)
                f = pd.DataFrame(_partial_cols(g, finest)).reset_index()
            else:
                f = pd.DataFrame([{
                    name: (finest[name].sum() if name.endswith(("__cnt", "__sum"))
                           else finest[name].agg(name.rsplit("__", 1)[1]))
                    for name in pcol_names
                }])
            frames.append(_null_out(f, rolled).assign(**{lvl_col: lvl}))
        out = _pin_key_types(
            pd.concat(frames, ignore_index=True)[keys + [lvl_col] + pcol_names]
        )
        return _add_bucket(out, keys + [lvl_col], num_buckets)

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby(keys + [lvl_col], sort=False, dropna=False)
        cols = {}
        for out_col, (_in, fn) in agg.items():
            if fn in ("count", "size"):
                cols[out_col] = g[f"{out_col}__cnt"].sum()
            elif fn == "mean":
                cols[out_col] = (
                    g[f"{out_col}__sum"].sum() / g[f"{out_col}__cnt"].sum()
                )
            elif fn == "sum":
                cols[out_col] = g[f"{out_col}__sum"].sum()
            else:
                cols[out_col] = g[f"{out_col}__{fn}"].agg(fn)
        out = _pin_key_types(pd.DataFrame(cols).reset_index())
        out[lvl_col] = out[lvl_col].astype(np.int64)
        return out

    partials = ds.map_batches(partial, batch_format="pandas")
    return partials.groupby("__bucket").map_groups(merge, batch_format="pandas")


def unpivot(
    ds,
    id_cols: list[str],
    value_cols: list[str],
    var_col: str = "name",
    value_col: str = "value",
):
    """Wide → long melt (SQL UNPIVOT): one output row per (input row,
    entry of ``value_cols``), with the source column name in ``var_col``
    and its value cast to float64 in ``value_col``.

    Pure ``map_batches`` — embarrassingly parallel, zero shuffle; the id
    columns are Arrow ``take``-repeated (no Python rows), so this holds at
    any scale with output ≈ len(value_cols) × input."""
    import pyarrow as pa

    def melt(batch: pa.Table) -> pa.Table:
        n = len(batch)
        k = len(value_cols)
        # row-major interleave (row0's k metrics, then row1's …) purely for
        # readable output; the engine is order-agnostic
        idx = pa.array(np.repeat(np.arange(n), k))
        cols = {c: batch[c].take(idx) for c in id_cols}
        cols[var_col] = pa.array(np.tile(np.array(value_cols, object), n))
        vals = np.empty(n * k, np.float64)
        for j, c in enumerate(value_cols):
            vals[j::k] = batch[c].to_numpy(zero_copy_only=False).astype(
                np.float64
            )
        cols[value_col] = pa.array(vals)
        return pa.table(cols)

    return ds.map_batches(melt, batch_format="pyarrow")


def distinct_count(
    ds,
    keys,
    value_col: str,
    out_col: str = "n_distinct",
    num_buckets: int = 64,
):
    """Exact COUNT(DISTINCT value) per key: in-batch dedup → one shuffle
    bucketed by hash(keys, value) → per-bucket dedup + per-key partial
    counts → tiny final sum (≤ num_buckets rows per key)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    on = keys + [value_col]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return _add_bucket(batch[on].drop_duplicates(), on, num_buckets)

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        d = group[on].drop_duplicates()
        return d.groupby(keys, sort=False, dropna=False).size().rename(out_col).reset_index()

    partials = ds.map_batches(partial, batch_format="pandas")
    per_key_partials = partials.groupby("__bucket").map_groups(
        per_bucket, batch_format="pandas"
    )
    return grouped_aggregate(
        per_key_partials, keys, {out_col: (out_col, "sum")},
        num_buckets=max(8, num_buckets // 4),
    )


def grouped_percentiles_unbounded(
    ds,
    keys,
    value_col: str,
    quantiles: dict[str, float],
    round_to: int = 4,
    bins: int = 512,
    refine_iters: int = 2,
    num_buckets: int = 32,
):
    """Exact percentile_cont for UNBOUNDED-cardinality continuous values —
    the scale complement of ``grouped_percentiles`` (which ships one row per
    distinct value and assumes bounded cardinality).

    Histogram refinement: each pass shuffles only (key, bin) partial counts
    (bins × keys rows per block), narrows every needed order statistic's
    value range by ~bins×, then a final pass gathers (value, count) pairs
    inside the surviving ranges — ~n/bins^iters distinct values per key, no
    matter how large n is.  Driver-side state is a few floats per
    (key, quantile): the KEY set must be driver-small (the values need not).

    All ranks are resolved against the true global order (rank_below is
    tracked per range), so ties and repeated values are exact, and the
    result equals SQL percentile_cont to float precision.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    import pandas as _pd

    # pass 0: per-key min / max / count
    base = grouped_aggregate(
        ds,
        keys,
        {"__min": (value_col, "min"), "__max": (value_col, "max"),
         "__n": (value_col, "size")},
        num_buckets=num_buckets,
    ).to_pandas()

    # per (key, needed-order-statistic): rank -> current [lo, hi] + the count
    # of values strictly below lo.  Start: every rank in [min, max].
    # state[key_tuple] = list of dicts {rank, lo, hi, below}
    state: dict = {}
    for _, row in base.iterrows():
        kt = tuple(row[k] for k in keys)
        n = int(row["__n"])
        ranks = set()
        for q in quantiles.values():
            h = (n - 1) * q
            ranks.add(int(np.floor(h)))
            ranks.add(int(np.ceil(h)))
        state[kt] = {
            "n": n,
            "stats": [
                {"rank": r, "lo": float(row["__min"]), "hi": float(row["__max"]),
                 "below": 0}
                for r in sorted(ranks)
            ],
        }

    def _ranges(st):
        # merged (lo, hi) spans still being refined, per key
        return [(s["lo"], s["hi"]) for s in st["stats"] if s["lo"] < s["hi"]]

    for _ in range(refine_iters):
        # one histogram pass over all keys' open ranges at once
        edges = {
            kt: [np.linspace(lo, hi, bins + 1) for lo, hi in _ranges(st)]
            for kt, st in state.items()
        }
        if not any(e for e in edges.values()):
            break

        def hist_partial(batch: _pd.DataFrame, _edges=edges) -> _pd.DataFrame:
            out_rows = []
            for kt, grp_idx in batch.groupby(
                keys, sort=False, dropna=False
            ).indices.items():
                kt_t = kt if isinstance(kt, tuple) else (kt,)
                spans = _edges.get(kt_t)
                if not spans:
                    continue
                v = batch[value_col].to_numpy(np.float64)[grp_idx]
                for si, e in enumerate(spans):
                    sub = v[(v >= e[0]) & (v <= e[-1])]
                    if not len(sub):
                        continue
                    # exact comparison-based bin assignment (np.histogram's
                    # scaled arithmetic can shift edge values by one ulp,
                    # which would corrupt the exact rank bookkeeping):
                    # bin b holds e[b] <= v < e[b+1], last bin closed
                    idx = np.clip(
                        np.searchsorted(e, sub, side="right") - 1, 0, bins - 1
                    )
                    cnt = np.bincount(idx, minlength=bins)
                    nz = np.flatnonzero(cnt)
                    for b in nz:
                        out_rows.append((*kt_t, si, int(b), int(cnt[b])))
            return _pd.DataFrame(
                out_rows, columns=keys + ["__span", "__bin", "__cnt"]
            )

        hist = grouped_aggregate(
            ds.map_batches(hist_partial, batch_format="pandas"),
            keys + ["__span", "__bin"],
            {"__cnt": ("__cnt", "sum")},
            num_buckets=num_buckets,
        ).to_pandas()

        for kt, st in state.items():
            spans = _ranges(st)
            span_edges = edges[kt]
            sub = hist[
                np.logical_and.reduce(
                    [hist[k].to_numpy() == kv for k, kv in zip(keys, kt)]
                )
            ]
            for si, (lo, hi) in enumerate(spans):
                e = span_edges[si]
                counts = np.zeros(bins, np.int64)
                s2 = sub[sub["__span"].to_numpy() == si]
                counts[s2["__bin"].to_numpy(np.int64)] = s2["__cnt"].to_numpy(np.int64)
                cum = np.concatenate([[0], np.cumsum(counts)])
                for s in st["stats"]:
                    if not (s["lo"] == lo and s["hi"] == hi and lo < hi):
                        continue
                    # find the bin holding order statistic `rank`
                    local = s["rank"] - s["below"]
                    b = int(np.searchsorted(cum, local, side="right") - 1)
                    b = min(max(b, 0), bins - 1)
                    s["below"] = s["below"] + int(cum[b])
                    s["lo"], s["hi"] = float(e[b]), float(e[b + 1])

    # final pass: exact (value, count) inside the surviving ranges
    final_ranges = {
        kt: sorted({(s["lo"], s["hi"]) for s in st["stats"]})
        for kt, st in state.items()
    }

    def gather(batch: _pd.DataFrame, _r=final_ranges) -> _pd.DataFrame:
        out_rows = []
        for kt, grp_idx in batch.groupby(
            keys, sort=False, dropna=False
        ).indices.items():
            kt_t = kt if isinstance(kt, tuple) else (kt,)
            spans = _r.get(kt_t)
            if not spans:
                continue
            v = batch[value_col].to_numpy(np.float64)[grp_idx]
            keep = np.zeros(len(v), bool)
            for lo, hi in spans:
                keep |= (v >= lo) & (v <= hi)
            vals, cnts = np.unique(v[keep], return_counts=True)
            for val, c in zip(vals, cnts):
                out_rows.append((*kt_t, float(val), int(c)))
        return _pd.DataFrame(out_rows, columns=keys + ["__val", "__cnt"])

    gathered = grouped_aggregate(
        ds.map_batches(gather, batch_format="pandas"),
        keys + ["__val"],
        {"__cnt": ("__cnt", "sum")},
        num_buckets=num_buckets,
    ).to_pandas()

    out_rows = []
    for kt, st in state.items():
        sub = gathered[
            np.logical_and.reduce(
                [gathered[k].to_numpy() == kv for k, kv in zip(keys, kt)]
            )
        ].sort_values("__val")
        vals = sub["__val"].to_numpy()
        cnts = sub["__cnt"].to_numpy(np.int64)
        # rank of first occurrence of each gathered value = below(range) +
        # cumulative counts inside the range; ranges are disjoint and the
        # 'below' bookkeeping is per range — rebuild rank per stat
        row = dict(zip(keys, kt))
        n = st["n"]
        # order stats by rank
        def order_stat(rank: int) -> float:
            # locate the range this rank resolved to
            for s in st["stats"]:
                if s["rank"] == rank:
                    lo, hi, below = s["lo"], s["hi"], s["below"]
                    m = (vals >= lo) & (vals <= hi)
                    vv, cc = vals[m], cnts[m]
                    cum = below + np.cumsum(cc)
                    i = int(np.searchsorted(cum, rank + 1, side="left"))
                    return float(vv[min(i, len(vv) - 1)])
            raise KeyError(rank)

        for name, q in quantiles.items():
            h = (n - 1) * q
            lo_r, hi_r = int(np.floor(h)), int(np.ceil(h))
            xlo, xhi = order_stat(lo_r), order_stat(hi_r)
            row[name] = _round_half_away(xlo + (h - lo_r) * (xhi - xlo), round_to)
        row["n"] = n
        out_rows.append(row)
    return _pd.DataFrame(out_rows)


def priority_sample(ds, key_col: str, weight_col: str, k: int):
    """Duffield–Lund–Thorup priority sampling (JACM 2007): a deterministic
    weighted sample-without-replacement of size ``k`` with an unbiased
    subset-sum estimator.  Priority q = w / u with u = (md5_lower64(key)+1)
    / 2^64; keep the k largest priorities; the (k+1)-th priority τ gives
    the estimator  ŵ = max(w, τ)  (sum of ŵ over the sample estimates the
    population weight of any selected subset).

    Bit-exact under a SQL oracle BY CONSTRUCTION: uint64→float64
    conversion, division by 2^64 (a pure exponent shift) and w/u are each
    single correctly-rounded IEEE-754 ops, so DuckDB computes the
    IDENTICAL doubles — sample membership and order carry no float
    tolerance (unlike ln/pow-based Efraimidis–Spirakis keys, which would
    ride on libm).

    Scale shape: a per-block partial top-(k+1) prunes the exchange to
    (k+1)·num_blocks rows, the global sort+limit runs on that bounded
    table, and the driver touches exactly k+1 rows (τ).  No stage grows
    with the corpus.
    """
    import pyarrow as pa

    from entity_resolution_ray.utils.hashing import md5_hash64_array

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        h = md5_hash64_array([str(v) for v in keys])
        # +1 in uint64 (exact; h = 2^64-1 has probability 2^-64), then ONE
        # correctly-rounded conversion — matching SQL's (ubigint+1)::double
        u = (h + np.uint64(1)).astype(np.float64) / np.float64(2.0 ** 64)
        w = batch[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        q = w / u
        order = np.lexsort((np.asarray(keys), -q))[: k + 1]
        return pa.table({
            key_col: batch[key_col].take(pa.array(order)),
            weight_col: batch[weight_col].take(pa.array(order)),
            "q": pa.array(q[order], pa.float64()),
        })

    top = (
        ds.map_batches(partial, batch_format="pyarrow")
        .sort(["q", key_col], descending=[True, False])
        .limit(k + 1)
        .take_all()
    )
    tau = float(top[k]["q"]) if len(top) > k else 0.0
    sel = top[:k]
    w = np.array([r[weight_col] for r in sel], np.float64)
    return pd.DataFrame({
        key_col: [r[key_col] for r in sel],
        weight_col: w,
        "rn": np.arange(1, len(sel) + 1, dtype=np.int64),
        "est_weight": _round_half_away(np.maximum(w, tau), 6),
    })


def grouped_weighted_percentiles(ds, keys, value_col: str, weight_col: str,
                                 quantiles: dict[str, tuple[int, int]],
                                 num_buckets: int = 32):
    """Exact WEIGHTED percentile per key (inverted-CDF definition): the
    smallest value v with  Σ weight(≤v) ≥ q · Σ weight  — the weighted
    complement of ``grouped_percentiles``.

    ``quantiles`` maps output column → q as a RATIONAL (num, den): the
    selection compares  den·cum ≥ num·tot  in int64, so with integer
    weights the result is integer-exact — no float cumsum whose
    summation-order ulps could flip a boundary row (the failure mode a
    float q·total threshold would reintroduce).  Weights are cast to
    int64; use a fixed-point scale upstream for fractional weights.

    Scale shape: one shuffled row per distinct (key, value) pair (weights
    pre-summed per pair inside ``grouped_aggregate``'s combiner), then a
    per-key sort inside one bucket exchange — same tier as the exact
    unweighted path.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)

    def to_int_weight(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[keys + [value_col]].copy()
        out["__w"] = batch[weight_col].to_numpy().astype(np.int64)
        return out

    sums = grouped_aggregate(
        ds.map_batches(to_int_weight, batch_format="pandas"),
        keys + [value_col], {"__wsum": ("__w", "sum")},
        num_buckets=num_buckets,
    )

    def per_key(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(value_col, kind="mergesort")
        v = g[value_col].to_numpy()
        cum = g["__wsum"].to_numpy(np.int64).cumsum()
        tot = int(cum[-1])
        row = {k_: group[k_].iloc[0] for k_ in keys}
        for name, (num, den) in quantiles.items():
            idx = int(np.searchsorted(den * cum, num * tot, side="left"))
            row[name] = v[min(idx, len(v) - 1)]
        row["total_weight"] = tot
        return pd.DataFrame([row])

    return sums.groupby(keys).map_groups(per_key, batch_format="pandas")
