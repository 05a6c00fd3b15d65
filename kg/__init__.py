"""entity_recogniser_spark — PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the semantics of hutomadotAI/entity_recogniser
(reference at /root/reference, studied not copied) as a distributed Spark
DataFrame pipeline: HTML->text extraction, gazetteer/regex/NER mention
detection, OpenIE-style triple extraction, entity linking, canonicalization
(MinHash blocking + connected components) and graph materialization, plus the
training-data-pipeline operators (dedup, ANN, text analysis) a 100 TB corpus
job needs.
"""

__version__ = "0.1.0"
