"""entity_resolution_ray — a Ray-Data-native record-linkage / data-processing engine.

A from-scratch rebuild (NOT a port) of the capabilities of the reference
``tamajyoti/entity_resolution`` (am_combiner) repo, expressed Ray-Data-first:

- one logical table == one ``ray.data.Dataset``; stage UDFs are vectorized
  ``map_batches`` transforms over zero-copy Arrow batches,
- stateful stages (models, vectorizers, similarity kernels) are actor pools,
- wide steps (blocking, pair dedup, connected components) are ``groupby`` /
  aggregate shuffles with explicit skew handling (salting, posting-list caps),
- every stage can checkpoint partitioned Parquet with per-partition lineage.

Nothing in this package calls ``ray.init`` / ``ray.shutdown`` — sessions are
owned by the caller (driver, bench harness, or test fixture).
"""

__version__ = "0.1.0"
