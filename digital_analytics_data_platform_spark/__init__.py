"""digital_analytics_data_platform_spark — a PySpark-native CDC / incremental-ingest engine.

A brand-new engine (not a port) with the query and data-processing
capabilities of the reference medallion analytics platform
(khldsqmr/Digital-Analytics-Data-Platform): a binlog/WAL-style change
feed of conversation-transcript events is tailed with Structured
Streaming and applied to Bronze/Silver/Gold lake tables via an
idempotent, exactly-once MERGE kernel expressed entirely in DataFrame
operations (no per-row Python; Arrow-vectorized UDFs only where a
built-in cannot express the semantics).

Layout
------
- ``lake``       snapshot-based table format (atomic manifest commits,
                 bucketed layout, schema evolution, file-stats pruning)
                 + the MERGE kernel.
- ``operators``  relational operators from the reference inventory
                 (SURVEY.md §2): LWW dedupe, as-of join, reshaping,
                 calendar logic, plus training-data ops (minhash /
                 simhash dedup, ANN similarity, text analysis,
                 multimodal plumbing).
- ``functions``  scalar column helpers (defensive casts, blank→null,
                 key hashing).
- ``plans``      Bronze → Silver → Gold pipeline definitions for the
                 transcripts data model.
- ``streaming``  Structured Streaming wiring: CDC file source,
                 foreachBatch runner, checkpointing, lineage/metrics.
- ``datagen``    deterministic, fully-distributed synthetic CDC log
                 generator (scales to 10^10 events without
                 materializing anything on the driver).
"""

__version__ = "0.1.0"
