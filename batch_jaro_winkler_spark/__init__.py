"""batch_jaro_winkler_spark — a PySpark-native near-duplicate detection and
clustering engine with the query capabilities of ``dbousque/batch_jaro_winkler``.

Layers:

* ``kernel``    — pure-numpy batched Jaro-Winkler scoring (reference parity).
* ``api``       — the reference's 6-function API surface, re-expressed.
* ``functions`` — Spark Column helpers (text normalization, hashing, vectors).
* ``operators`` — DataFrame-level operators: score_pairs/topk, minhash,
                  simhash, LSH banding, connected components, exact dedup,
                  suffix/fingerprint substring dedup, ANN cosine search.
* ``sources``   — checkpoint catalog (parquet + JSON manifest lineage).
* ``pipeline``  — the end-to-end resumable dedup pipeline.
"""

__version__ = "0.1.0"
