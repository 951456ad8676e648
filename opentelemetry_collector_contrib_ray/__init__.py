"""opentelemetry_collector_contrib_ray — a Ray-Data-native log/telemetry engine.

A from-scratch reimplementation of the data-processing capabilities of the
OpenTelemetry Collector Contrib (reference: /root/reference, Go) as an
idiomatic Ray Data pipeline library:

- ``sources``   — Parquet readers + the deterministic tokenized-sequence corpus
                  (the filelog-receiver analog; SURVEY.md §2.1).
- ``functions`` — OTTL-subset expression compiler and converter/editor kernels
                  over Arrow batches (SURVEY.md §2.5).
- ``stages``    — parse / enrich / route / aggregate / dedup / sample /
                  text-stats / similarity stages, each a vectorized
                  ``map_batches``-compatible callable (SURVEY.md §2.3-2.9).
- ``pipelines`` — composed end-to-end pipelines (flagship parse→enrich→route→
                  aggregate; SURVEY.md §7.0).
- ``state``     — per-partition lineage manifest for resumable runs
                  (SURVEY.md §4 checkpoint row).

Nothing in this package calls ``ray.init()``; callers own the Ray session.
"""

__version__ = "0.1.0"
