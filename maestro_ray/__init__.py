"""maestro_ray — a Ray-Data-native CDC / incremental-ingest engine.

A from-scratch reimagination of the maestro lineage's typed
stage-composition model (see SURVEY.md; the reference checkout at
/root/reference was empty at survey time — provenance for every design
decision is recorded in SURVEY.md §0) as a typed, Arrow-schema-checked
incremental-ingest DAG on ray.data:

- ``core``      — Arrow schema contracts, evolution, Stage/DAG, manifests
- ``io``        — sources and sinks (parquet lake, changelog segments)
- ``ops``       — the operator library (map/filter/join/agg/dedup/...)
- ``pipelines`` — end-to-end entry points (replay ingest, resume)

Library code never calls ``ray.init``/``ray.shutdown`` — sessions are
owned by the CLI, bench.py, and the pytest fixture only.
"""

__version__ = "0.1.0"
