"""Training-data pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) — the ops a 100 TB corpus job needs beyond the
KG-construction stages. All hot paths are JVM-side built-ins or Arrow-batched
pandas UDFs; no row-wise Python anywhere."""
