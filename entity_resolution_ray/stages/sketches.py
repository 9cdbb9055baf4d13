"""Mergeable sketches: HyperLogLog approximate distinct count.

``hll_distinct`` is the scale complement of ``analytics.distinct_count``:
exact distinct shuffles one row per distinct (key, value) — right when the
distinct set is data-proportional but bounded per key.  HLL ships a FIXED
2^p-byte register blob per (key, block) regardless of how many distinct
values a block saw, so a key with 10^10 distinct values still costs each
block 4 KiB (p=12) on the wire: the right tier when value sets are huge and
±1.6% (1.04/sqrt(2^p)) relative error is acceptable.

Partial per block (register maxima), merged with an elementwise ``max`` in
one small groupby — associative/commutative/idempotent, so re-execution or
duplicate blocks cannot skew the estimate.  Register hash is the
SQL-reproducible md5-lower-64 of the value's canonical rendering (DuckDB
``md5_number_lower(v::varchar)``), rho is an exact bit-trick clz, and the
register sum is an exact integer — so a DuckDB oracle can restate the WHOLE
sketch bit-for-bit (see ``APPROX_DISTINCT_PARTS_SQL`` in ``__ray_entry__``).
Estimates are bias-corrected with the standard linear-counting small-range
switch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def _rho(h: np.ndarray, p: int) -> np.ndarray:
    """Position (1-based) of the first set bit of the low 64-p bits of h —
    EXACT vectorized count-leading-zeros (binary search over shift widths),
    no float log2: a SQL oracle restates it as ``64 - (bit_length(w) - 1)``
    and both sides must agree on every register.  Capped at 64-p+1 for w==0."""
    w = (h.astype(np.uint64) << np.uint64(p)).astype(np.uint64)
    clz = np.zeros(len(h), dtype=np.uint8)
    v = w.copy()
    for s in (32, 16, 8, 4, 2, 1):
        top_zero = (v >> np.uint64(64 - s)) == 0
        clz[top_zero] += s
        v[top_zero] = v[top_zero] << np.uint64(s)
    out = clz + np.uint8(1)  # rho = clz + 1 for w > 0
    out[w == 0] = 64 - p + 1
    return out


def _hash_series(s: pd.Series) -> np.ndarray:
    """SQL-reproducible 64-bit value hash: DuckDB ``md5_number_lower(v::varchar)``
    (md5, last 8 bytes little-endian) of the value's canonical decimal/string
    rendering.  Hashes only the block's UNIQUE values and maps back — md5 is
    ~1µs/item in Python, so a block with heavy value repetition pays only its
    distinct count.  Null values hash to 0 (one pseudo-value, like the old
    pandas-hash path)."""
    from entity_resolution_ray.utils.hashing import md5_hash64_array

    def render(u):
        if u is None or (isinstance(u, float) and np.isnan(u)):
            return None
        # a nullable int column arrives as float64 (pandas promotion):
        # str(2.0) = '2.0' but SQL int::varchar = '2' — render integral
        # floats as ints so the hash matches the SQL restatement
        if isinstance(u, float) and u.is_integer():
            return str(int(u))
        return str(u)

    codes, uniques = pd.factorize(s, use_na_sentinel=True)
    rendered = [render(u) for u in uniques]
    uh = md5_hash64_array(rendered)
    uh = np.concatenate([uh, np.zeros(1, np.uint64)])  # sentinel -1 -> 0
    return uh[codes]


def _estimate(regs: np.ndarray) -> int:
    """Bias-corrected HLL estimate with the linear-counting small-range
    switch.  The register sum is computed as an EXACT integer
    ``S = Σ 2^(64-reg)`` (Python ints; reg=0 contributes 2^64) so a SQL
    oracle summing the same HUGEINT terms in any order gets the identical
    value; the only float ops are one division and (small range) one log,
    each performed in the same literal order as the SQL restatement."""
    import math

    m = len(regs)
    counts = np.bincount(regs, minlength=1)
    S = sum(int(c) << (64 - k) for k, c in enumerate(counts) if c)
    est = _alpha(m) * m * m * 2.0**64 / float(S)
    if est <= 2.5 * m:
        zeros = int(counts[0])
        if zeros:
            est = m * math.log(m / zeros)  # linear counting
    return int(math.floor(est + 0.5))


def hll_distinct(
    ds,
    keys,
    value_col: str,
    out_col: str = "n_approx",
    p: int = 12,
):
    """Approximate COUNT(DISTINCT value_col) per key combination."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    m = 1 << p

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        h = _hash_series(batch[value_col])
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        rho = _rho(h, p)
        rows = []
        # dropna=False: NULL-key groups survive like the exact
        # distinct_count / grouped_aggregate paths (SQL GROUP BY keeps them)
        for key_vals, grp_idx in batch.groupby(
            keys, sort=False, dropna=False
        ).indices.items():
            regs = np.zeros(m, np.uint8)
            np.maximum.at(regs, idx[grp_idx], rho[grp_idx])
            if len(keys) == 1:
                key_vals = (key_vals,)
            rows.append((*key_vals, regs.tobytes()))
        return pd.DataFrame(rows, columns=keys + ["__regs"])

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        stacked = np.frombuffer(
            b"".join(group["__regs"].tolist()), dtype=np.uint8
        ).reshape(len(group), m)
        regs = stacked.max(axis=0)
        row = {k: group[k].iloc[0] for k in keys}
        row[out_col] = _estimate(regs)
        return pd.DataFrame([row])

    partials = ds.map_batches(partial, batch_format="pandas")
    return partials.groupby(keys).map_groups(merge, batch_format="pandas")


def dd_quantiles(
    ds,
    value_col: str,
    quantiles: dict[str, float],
    keys=None,
    alpha: float = 0.01,
    num_buckets: int = 16,
):
    """One-pass approximate quantiles with a RELATIVE error guarantee
    (DDSketch bucketing: bucket = ceil(log_gamma |x|), gamma=(1+a)/(1-a)) —
    the streaming complement of the exact two-pass
    ``analytics.grouped_percentiles_unbounded``.

    Per block each value folds into its log bucket (vectorized), so a block
    contributes ≤ its distinct-bucket count (~1/alpha per decade) rows to
    the shuffle regardless of row count; bucket counts merge by plain SUM —
    associative, commutative, order-independent, so the estimate is
    deterministic under any block order and safe under re-execution.
    Returns one row per key (or a single global row) with a column per
    entry of ``quantiles``; each answer is within ±alpha relative error.
    """
    from .aggregate import grouped_aggregate

    keys = [] if keys is None else ([keys] if isinstance(keys, str) else list(keys))
    gamma = (1 + alpha) / (1 - alpha)
    lg = np.log(gamma)

    def to_buckets(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[value_col].to_numpy(np.float64)
        v = v[~np.isnan(v)]
        # signed log bucket; 0 gets its own bucket at idx 0 / sign 0
        sign = np.sign(v).astype(np.int64)
        idx = np.zeros(len(v), np.int64)
        nz = sign != 0
        idx[nz] = np.ceil(np.log(np.abs(v[nz])) / lg).astype(np.int64)
        f = batch.loc[~batch[value_col].isna(), keys].copy() if keys else \
            pd.DataFrame(index=np.arange(len(v)))
        f["__sign"] = sign
        f["__b"] = idx
        return f

    bucketed = ds.map_batches(to_buckets, batch_format="pandas")
    counts = grouped_aggregate(
        bucketed, keys + ["__sign", "__b"], {"__cnt": ("__b", "size")},
        num_buckets=num_buckets,
    )

    def finish(group: pd.DataFrame) -> pd.DataFrame:
        sign = group["__sign"].to_numpy(np.int64)
        b = group["__b"].to_numpy(np.int64)
        cnt = group["__cnt"].to_numpy(np.int64)
        # ascending value order: negatives by descending bucket, zero, positives
        # by ascending bucket — integer lexsort (a float combined key loses
        # the bucket term to the sign term's magnitude)
        inner = np.where(sign < 0, -b, np.where(sign > 0, b, 0))
        o = np.lexsort((inner, sign))
        sign, b, cnt = sign[o], b[o], cnt[o]
        mid = 2.0 * np.power(gamma, b.astype(np.float64)) / (gamma + 1)
        vals = sign * np.where(sign == 0, 0.0, mid)
        c = np.cumsum(cnt)
        n = int(c[-1])
        row = {k: group[k].iloc[0] for k in keys}
        for name, q in quantiles.items():
            r = max(0, min(n - 1, int(np.ceil(q * (n - 1)))))
            row[name] = vals[np.searchsorted(c, r, side="right")]
        row["n"] = n
        return pd.DataFrame([row])

    if keys:
        return counts.groupby(keys).map_groups(finish, batch_format="pandas")
    # global: fold every partial row into one group
    tagged = counts.map_batches(
        lambda f: f.assign(__g=0), batch_format="pandas"
    )
    out = tagged.groupby("__g").map_groups(
        lambda g: finish(g.drop(columns="__g")), batch_format="pandas"
    )
    return out


def heavy_hitters(
    ds,
    value_col: str,
    k: int = 64,
    num_buckets: int = 16,
):
    """Approximate top-k most frequent values with honest count bounds
    (truncate-and-bound, the mergeable SpaceSaving shape): each block
    aggregates its values exactly (bounded by block size), keeps its k
    largest, and records the count of the first value it dropped as that
    block's error mass.  Partials merge by SUM; a reported value's true
    count lies in [count_min, count_max] where count_max adds the error
    mass of every block (it might have been just-under-threshold in each).

    Any value whose true count exceeds the summed error mass is guaranteed
    to surface.  Memory per task is O(k + block distinct), shuffle volume
    ≤ (k+1) rows per block — never the corpus' value cardinality.
    """
    from .aggregate import grouped_aggregate

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch[value_col].value_counts()
        top = vc.iloc[:k]
        err = int(vc.iloc[k]) if len(vc) > k else 0
        f = pd.DataFrame(
            {value_col: top.index, "__cnt": top.to_numpy(np.int64),
             "__is_err": np.zeros(len(top), np.int64)}
        )
        # one sentinel row per block carries its dropped-count bound
        f.loc[len(f)] = [None, err, 1]
        return f

    partials = ds.map_batches(partial, batch_format="pandas")
    merged = grouped_aggregate(
        partials, [value_col, "__is_err"], {"cnt": ("__cnt", "sum")},
        num_buckets=num_buckets,
    )

    def finish(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop(columns="__g")
        err = int(g.loc[g["__is_err"] == 1, "cnt"].sum())
        vals = g[g["__is_err"] == 0].nlargest(k, "cnt")
        return pd.DataFrame(
            {
                value_col: vals[value_col].to_numpy(),
                "count_min": vals["cnt"].to_numpy(np.int64),
                "count_max": vals["cnt"].to_numpy(np.int64) + err,
            }
        )

    tagged = merged.map_batches(
        lambda f: f.assign(__g=0), batch_format="pandas"
    )
    return tagged.groupby("__g").map_groups(finish, batch_format="pandas")


def hll_set_ops(ds_a, ds_b, value_col: str, p: int = 12):
    """Approximate |A|, |B|, |A∪B|, |A∩B|, and Jaccard between two value
    sets from ONE pass over each side — HLL's closure under union makes
    the union estimate a register-wise max of the two sketches, and the
    intersection follows by inclusion–exclusion (|A|+|B|−|A∪B|).

    Standard error: ~1.04/√m on each cardinality; the intersection
    inherits the absolute errors of all three terms, so small overlaps of
    large sets are noisy — the documented trade (use the exact
    ``brand_set_ops`` tier when the sets are shuffle-able).  Returns a
    one-row pandas DataFrame; each side's sketch is built distributed
    (fixed 2^p bytes per block) and only the two register arrays reach
    the driver.
    """
    m = 1 << p

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        h = _hash_series(batch[value_col])
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        rho = _rho(h, p)
        regs = np.zeros(m, np.uint8)
        np.maximum.at(regs, idx, rho)
        return pd.DataFrame({"__regs": [regs.tobytes()]})

    def sketch(ds) -> np.ndarray:
        rows = ds.map_batches(partial, batch_format="pandas").take_all()
        regs = np.zeros(m, np.uint8)
        for r in rows:
            regs = np.maximum(regs, np.frombuffer(r["__regs"], np.uint8))
        return regs

    ra, rb = sketch(ds_a), sketch(ds_b)
    na, nb = _estimate(ra), _estimate(rb)
    nu = _estimate(np.maximum(ra, rb))
    ni = max(na + nb - nu, 0)
    import math

    # floor(x*1e6+0.5)/1e6 instead of round(): SQL restates it literally
    # (Python round() is banker's, SQL round() half-away — neither matches
    # the other on ties)
    return pd.DataFrame([{
        "n_a": na, "n_b": nb, "n_union": nu, "n_intersect": ni,
        "jaccard_est": math.floor(ni / nu * 1e6 + 0.5) / 1e6 if nu else 0.0,
    }])
