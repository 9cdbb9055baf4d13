"""Per-block-size timing report (SURVEY.md §2.6 diagnostics).

Reference analogue: ``combine_entities_and_time`` collects, per blocking name,
the wall time of the block's clustering keyed by its mention count, and ships
the averages (ms) as ``all_combiners_time_performance.csv``
(``am_combiner/combiners/common.py:246-261``, ``__main__.py`` results saver).

Distributed shape: block work here happens inside the pair-generation bucket
tasks, so each task times its per-block slices locally and sends ONE partial
dict (size → total seconds, block count) to a zero-CPU collector actor —
traffic is bounded by the number of distinct block sizes per task, never
per-pair or per-doc.  The driver folds the summary into a sidecar JSON next
to the run's outputs.
"""

from __future__ import annotations

import json

import ray


@ray.remote(num_cpus=0)
class BlockTimingCollector:
    """Accumulates (block_size → total seconds, #blocks) partials."""

    def __init__(self):
        self.total: dict[int, float] = {}
        self.count: dict[int, int] = {}

    def add(self, partial: dict[int, tuple[float, int]]) -> None:
        for size, (tot, cnt) in partial.items():
            self.total[size] = self.total.get(size, 0.0) + float(tot)
            self.count[size] = self.count.get(size, 0) + int(cnt)

    def summary(self) -> dict[int, dict]:
        """size → {avg_ms, n_blocks} — the reference's avg-ms-by-mention-no."""
        return {
            size: {
                "avg_ms": round(self.total[size] / self.count[size] * 1000.0, 4),
                "n_blocks": self.count[size],
            }
            for size in self.total
        }


def write_timing_report(path: str, summary: dict[int, dict]) -> None:
    """Sidecar JSON, size-sorted (the reference CSV's row order)."""
    with open(path, "w") as f:
        json.dump(
            {str(k): summary[k] for k in sorted(summary)}, f, indent=1,
            sort_keys=False,
        )
