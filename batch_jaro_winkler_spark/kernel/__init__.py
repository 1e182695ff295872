from batch_jaro_winkler_spark.kernel.bjw import (
    CandidateModel,
    build_model,
    score,
    score_pair,
    score_pair_batch,
    score_strings,
    units_from_bytes,
)

__all__ = [
    "CandidateModel",
    "build_model",
    "score",
    "score_pair",
    "score_pair_batch",
    "score_strings",
    "units_from_bytes",
]
