"""doc_quality_check_ray — a Ray-Data-native schema + constraint validation engine.

A from-scratch re-expression of the capabilities of the reference repo
``kabeertest/doc-quality-check`` (see SURVEY.md) as streaming Ray Data pipelines
over Parquet transcript tables:

- per-row quality gates (emptiness, readability, referential domains) as
  vectorized ``map_batches`` over zero-copy Arrow batches,
- per-column stats (null rate, min/max, length histograms, t-digest quantiles)
  as partial-per-batch + tree-merged aggregates,
- uniqueness / contiguity checks as hash-partitioned group-bys with explicit
  skew-aware salting,
- distribution-drift checks (PSI/KL vs a reference snapshot) as an actor-pool
  stage holding the broadcast snapshot,
- verdict manifests + materialized violation rows, resumable per-partition
  Parquet outputs,
- plus large-scale training-data operators: dedup (exact / MinHash-LSH /
  SimHash / n-gram Jaccard / embedding-cosine), similarity search, text
  analysis, and multimodal stage plumbing.

Design scale: 10^12 turns on a multi-node cluster; tested single-node.
"""

__version__ = "0.1.0"
