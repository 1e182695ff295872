"""Per-partition suffix-array substring detection (SURVEY.md §7 step 8).

The exact-substring companion to operators/fingerprint_dedup.py: where
mod-sampling is probabilistic (misses a >=200-char overlap with p~0.8%),
the suffix-array path is exact *within a partition*: build one suffix
array over the partition's concatenated normalized text (numpy argsort on
fixed-width gram keys, refined to full suffix order), walk adjacent
suffixes, and emit every cross-document LCP >= min_len.

Scale shape: each partition is processed independently (mapInPandas, no
shuffle); cross-partition duplicates are the fingerprint stage's job —
the two stages are complementary and both feed the same CC edge set.
This mirrors the deduplicate-text-datasets design (Lee et al. 2022,
PAPERS.md): suffix structures bounded per worker, never global.

Kernel: radix-ish suffix ordering via numpy lexsort over k prefix code
points (k = min_len suffices: suffixes equal in their first min_len chars
are interchangeable for >=min_len overlap detection), then adjacent-pair
LCP evaluation vectorized over the sorted order.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from batch_jaro_winkler_spark.functions.text import normalize_pandas
from batch_jaro_winkler_spark.operators.config import DedupConfig

__all__ = ["suffix_array_edges", "partition_substring_pairs"]

_SEP = 0xFFFD  # separator code point between documents (never matches text)


def partition_substring_pairs(
    doc_ids: np.ndarray, texts: list, min_len: int
) -> set[tuple[int, int]]:
    """Exact >=min_len cross-document substring pairs within one partition.

    Builds the concatenated code-point buffer with separators, sorts all
    suffixes by their first min_len code points (sufficient: any two
    suffixes sharing >= min_len chars are adjacent-equal under this key),
    then scans runs of equal keys and pairs distinct documents in each run.
    """
    if len(texts) < 2:
        return set()
    bufs = []
    owner_spans = []
    for i, t in enumerate(texts):
        codes = np.frombuffer(t.encode("utf-32-le"), dtype="<u4")
        bufs.append(codes)
        bufs.append(np.array([_SEP + (i % 7)], dtype="<u4"))  # vary separators
        owner_spans.append(len(codes) + 1)
    buf = np.concatenate(bufs)
    n = len(buf)
    owner = np.repeat(np.arange(len(texts), dtype=np.int64), owner_spans)

    # positions with at least min_len real chars before the next separator:
    # run-length to next separator
    is_sep = buf >= _SEP
    # distance to next separator (inclusive scan from the right)
    dist = np.zeros(n, dtype=np.int64)
    next_sep = n
    sep_pos = np.flatnonzero(is_sep)
    next_sep_of = np.full(n, n, dtype=np.int64)
    if len(sep_pos):
        idx = np.searchsorted(sep_pos, np.arange(n), side="left")
        idx = np.minimum(idx, len(sep_pos) - 1)
        next_sep_of = sep_pos[idx]
        next_sep_of[np.arange(n) > sep_pos[-1]] = n
    dist = next_sep_of - np.arange(n)
    starts = np.flatnonzero(dist >= min_len)
    if len(starts) < 2:
        return set()

    # sort suffixes by their first min_len code points: lexsort over
    # min(min_len, 64) stride-sampled key columns + tie-break by full
    # comparison within runs.  Full min_len keys would be min_len arrays;
    # instead sort by 16 sampled columns then verify runs exactly.
    n_keys = 16
    key_offsets = np.linspace(0, min_len - 1, n_keys).astype(np.int64)
    keys = [buf[starts + off] for off in key_offsets[::-1]]
    order = np.lexsort(keys)
    s = starts[order]

    pairs: set[tuple[int, int]] = set()
    # runs of equal sampled keys → exact-verify into equivalence classes of
    # identical min_len prefixes, then chain the distinct owners per class
    key_mat = np.stack([buf[s + off] for off in key_offsets], axis=1)
    same_as_prev = np.all(key_mat[1:] == key_mat[:-1], axis=1)
    j = 0
    m = len(s)
    while j < m - 1:
        if not same_as_prev[j]:
            j += 1
            continue
        # run [j, end)
        end = j + 1
        while end < m and same_as_prev[end - 1]:
            end += 1
        # split run into exact-prefix classes by verifying vs the previous
        # member; chain distinct owners within each class
        class_last_owner = owner[s[j]]
        class_last_doc = int(doc_ids[class_last_owner])
        for t in range(j + 1, end):
            p, q = s[t - 1], s[t]
            o = owner[q]
            if np.array_equal(buf[p : p + min_len], buf[q : q + min_len]):
                if o != class_last_owner:
                    other = int(doc_ids[o])
                    pairs.add(
                        (min(class_last_doc, other), max(class_last_doc, other))
                    )
                    class_last_owner = o
                    class_last_doc = other
            else:  # new exact-prefix class starts at q
                class_last_owner = o
                class_last_doc = int(doc_ids[o])
        j = end
    return pairs


def suffix_array_edges(
    docs: DataFrame,
    cfg: DedupConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
    pre_normalized: bool = False,
) -> DataFrame:
    """→ (a, b) exact within-partition substring pairs.  Co-partition by a
    content-insensitive key upstream (or accept partition-local scope) —
    the global guarantee comes from combining with fingerprint_dedup."""
    min_len = cfg.min_substring_chars
    prepped = docs.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("norm")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids: list = []
        all_texts: list = []
        for pdf in batches:
            if not pre_normalized:
                pdf = pdf.assign(norm=normalize_pandas(pdf["norm"]))
            all_ids.extend(pdf["doc_id"])
            all_texts.extend(pdf["norm"])
        pairs = partition_substring_pairs(
            np.asarray(all_ids, dtype=np.int64), all_texts, min_len
        )
        if pairs:
            arr = np.array(sorted(pairs), dtype=np.int64)
            yield pd.DataFrame({"a": arr[:, 0], "b": arr[:, 1]})

    return prepped.mapInPandas(run, schema="a long, b long")
