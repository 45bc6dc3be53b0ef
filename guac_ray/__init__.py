"""guac_ray — a Ray-Data-native knowledge-graph construction engine.

From-scratch reimagination of the GUAC collector→processor→parser→assembler
pipeline (reference: xkcd-2347/guac, see SURVEY.md) as streaming Ray Data
stages over Parquet transcript tables
(conv_id, turn_idx, role, text, tool, ts):

    read_parquet → sort(conv_id, turn_idx) → map_batches(extract triples)
      → actor-pool entity linking → salted two-phase dedup (assemble)
      → nodes/edges Parquet + per-partition lineage/metrics checkpoints.

Nothing is copied from the reference; it defines WHAT to compute
(canonical keys, predicate families, dedup identity — SURVEY.md §1-2),
this package defines HOW on Ray Data.
"""

__version__ = "0.1.0"
