"""Process-wide Ray Data execution defaults for this engine.

Call ``apply_context_defaults()`` from every entry point that owns (or is
handed) a Ray session — bench, tests, the job runner, the driver contract.
Library stages never touch the context themselves.

Push-based sort shuffle: interleaved A/B on the flagship at 200k docs
(2 rounds, same session, control-normalized) measured 26.7/27.2 s push vs
29.2/36.7 s pull — the push-based pipeline overlaps merge with map and
cuts the per-fragment scheduling overhead that dominates our sort walls
(remote compute inside the sorts is ~3 s).  HASH_SHUFFLE was also tried
and rejected: ArrowInvalid in HashShuffleAggregator.finalize on the
flagship's list-typed columns (Ray 2.49).
"""

from __future__ import annotations


def apply_context_defaults() -> None:
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
