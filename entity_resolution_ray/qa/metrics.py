"""Clustering quality metrics.

Reference analogues:

- pairwise precision/recall/F1 on labeled pairs —
  ``am_combiner/qa/acceptance_metrics.py:55-74`` (the reference samples pairs
  at rate 0.2; here the fixture labels are exhaustive so the score is exact),
- homogeneity / completeness / V-measure —
  ``am_combiner/qa/quality_metrics.py:174-197`` (sklearn there; computed from
  contingency entropies here, same definitions),
- over/under-combination rates and the score-to-minimise with weights
  3.4 / 8.4 / 0.4 / 0.8 — ``am_combiner/qa/quality_metrics.py:200-319``.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def pairwise_prf(pred: pd.DataFrame, labeled_pairs: pd.DataFrame) -> dict:
    """pred: (doc_id, cluster_id); labeled_pairs: (doc_a, doc_b, is_match)."""
    cmap = dict(zip(pred["doc_id"], pred["cluster_id"]))
    same = np.array(
        [cmap.get(a) == cmap.get(b) and cmap.get(a) is not None
         for a, b in zip(labeled_pairs["doc_a"], labeled_pairs["doc_b"])]
    )
    truth = labeled_pairs["is_match"].to_numpy(dtype=bool)
    tp = int((same & truth).sum())
    fp = int((same & ~truth).sum())
    fn = int((~same & truth).sum())
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = (2 * precision * recall / (precision + recall)) if precision + recall else 0.0
    return {"tp": tp, "fp": fp, "fn": fn,
            "precision": precision, "recall": recall, "f1": f1}


def _entropy(counts: np.ndarray) -> float:
    n = counts.sum()
    p = counts[counts > 0] / n
    return float(-(p * np.log(p)).sum())


def homogeneity_completeness_v(truth: pd.Series, pred: pd.Series) -> tuple:
    ct = pd.crosstab(truth, pred).to_numpy()
    n = ct.sum()
    h_c = _entropy(ct.sum(axis=1))
    h_k = _entropy(ct.sum(axis=0))
    p = ct / n
    with np.errstate(divide="ignore", invalid="ignore"):
        h_c_given_k = -np.nansum(
            p * (np.log(ct) - np.log(ct.sum(axis=0, keepdims=True))),
            where=ct > 0,
        )
        h_k_given_c = -np.nansum(
            p * (np.log(ct) - np.log(ct.sum(axis=1, keepdims=True))),
            where=ct > 0,
        )
    hom = 1.0 if h_c == 0 else 1.0 - h_c_given_k / h_c
    com = 1.0 if h_k == 0 else 1.0 - h_k_given_c / h_k
    v = 0.0 if hom + com == 0 else 2 * hom * com / (hom + com)
    return hom, com, v


def over_under_rates(merged: pd.DataFrame) -> dict:
    """merged: (doc_id, cluster_id, ground_truth) for ONE blocking key.

    A predicted cluster is *over-combined* when it spans >1 truth label,
    *under-combined* when its truth label is split across >1 predicted
    cluster (reference definitions, ``qa/quality_metrics.py:200-319``)."""
    by_cluster = merged.groupby("cluster_id")["ground_truth"].agg(["nunique", "size"])
    profiles_created = len(by_cluster)
    is_over = by_cluster["nunique"] > 1
    oc_rate = round(float(is_over.sum()) / profiles_created, 2) if profiles_created else 0.0
    truth_splits = merged.groupby("ground_truth")["cluster_id"].nunique()
    under_clusters = merged[
        merged["ground_truth"].isin(truth_splits[truth_splits > 1].index)
    ]["cluster_id"].nunique()
    uc_rate = round(under_clusters / profiles_created, 2) if profiles_created else 0.0
    # reference CLUSTER_SUPPORT_FIELD = number of distinct ground-truth
    # profiles the over-combined cluster spans (len(expected_clusters) in
    # ``qa/quality_metrics.py`` get_clustering_per_name), NOT its doc count
    oc_support = by_cluster.loc[is_over, "nunique"]
    profiles_per_oc = round(float(oc_support.mean()), 2) if len(oc_support) else 0.0
    true_profiles = int(merged["ground_truth"].nunique())
    return {
        "oc_rate": oc_rate,
        "uc_rate": uc_rate,
        "profiles_per_oc": profiles_per_oc,
        "profiles_created": profiles_created,
        "true_profiles": true_profiles,
    }


def hash_split(doc_ids: pd.Series, k: int = 5, seed: int = 7) -> np.ndarray:
    """Deterministic k-fold assignment by stable id hash — the engine's
    cross-validation / train-test holdout primitive (reference name- and
    link-level holdouts, ``qa/cross_validation.py:13-111``; sanction split
    ``utils/sanction_data.py:109-125``)."""
    from entity_resolution_ray.utils.hashing import stable_hash64

    return np.fromiter(
        ((stable_hash64(f"{seed}:{d}") % k) for d in doc_ids),
        dtype=np.int64,
        count=len(doc_ids),
    )


def sample_pairs(pairs: pd.DataFrame, rate: float = 0.2, seed: int = 7) -> pd.DataFrame:
    """Deterministic hash-based pair sampling (reference acceptance metrics
    sample at rate 0.2, ``qa/acceptance_metrics.py:36-52`` — random.sample
    there; stable hashing here so reruns agree)."""
    from entity_resolution_ray.utils.hashing import stable_hash64

    keep = [
        (stable_hash64(f"{seed}:{a}|{b}") % 10_000) < rate * 10_000
        for a, b in zip(pairs["doc_a"], pairs["doc_b"])
    ]
    return pairs[np.asarray(keep)]


def quality_report(per_name_df: pd.DataFrame,
                   weights_column: str | None = None,
                   verbose: bool = False) -> dict:
    """Per-metric (optionally weighted) nan-aware averages over the per-name
    quality frame — the reference ``QualityControl.clustering_report`` /
    ``get_average_statistic`` rollup (``am_combiner/qa/quality_control.py:
    23-85``), rounded to 2 dp."""
    report: dict = {}
    for label in per_name_df.columns:
        if label == weights_column:
            continue
        col = per_name_df[label]
        if not np.issubdtype(col.dtype, np.number):
            continue
        use = ~col.isna()
        if not use.any():
            continue
        weights = (
            per_name_df.loc[use, weights_column].to_numpy()
            if weights_column else None
        )
        val = round(float(np.average(col[use].to_numpy(), weights=weights)), 2)
        if verbose:
            print(f"{label}: {val}")
        report[label] = val
    return report


def calculate_improvements(improvements_against: list[str],
                           report_frame: pd.DataFrame,
                           combiners: list[str]) -> list[dict]:
    """Pairwise metric ratios combiner/reference with the reference's
    0/0→nan, x/0→inf conventions (``am_combiner/qa/utils.py:56-103``)."""
    if "all" in improvements_against:
        improvements_against = combiners
    out: list[dict] = []
    for reference in improvements_against:
        for combiner in combiners:
            row: dict = {"reference": reference, "combiner": combiner}
            for col in report_frame.columns:
                try:
                    num = report_frame.loc[combiner][col]
                    den = report_frame.loc[reference][col]
                    if not num and not den:
                        frac = math.nan
                    elif not den:
                        frac = math.inf
                    else:
                        frac = num / den
                except TypeError:
                    continue
                row[col] = round(frac, 2)
            out.append(row)
    return out


def score_to_minimise(oc_rate, uc_rate, profiles_per_oc, profiles_created,
                      true_profiles) -> float:
    """Reference product score, weights 3.4/8.4/0.4/0.8
    (``qa/quality_metrics.py:284-319``)."""
    return round(
        3.4 * uc_rate
        + 8.4 * oc_rate
        + 0.4 * profiles_per_oc
        + 0.8 * max(profiles_created - true_profiles, 0) / true_profiles,
        2,
    )
