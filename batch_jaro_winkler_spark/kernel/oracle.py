"""Independent textbook Jaro / Jaro-Winkler oracle (pure python).

Used only by the differential test-suite (SURVEY.md §5 layer 2): a direct
transcription of the published Jaro (1989) / Winkler (1990) definitions,
deliberately written in the most naive O(n*m) way so it shares no code or
structure with the vectorized kernel it checks.
"""

from __future__ import annotations

__all__ = ["jaro", "jaro_winkler"]


def jaro(s1: str, s2: str) -> float:
    """Plain Jaro similarity. Both-empty returns 0.0 to match the reference
    convention (lib/batch_jaro_winkler_runtime.h:429-438 emits 0.0 for
    zero-match candidates, including the empty-vs-empty case)."""
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    window = max(len1, len2) // 2 - 1
    if window < 0:
        window = 0
    flags1 = [False] * len1
    flags2 = [False] * len2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - window)
        hi = min(len2, i + window + 1)
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == c:
                flags1[i] = True
                flags2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    seq1 = [s1[i] for i in range(len1) if flags1[i]]
    seq2 = [s2[j] for j in range(len2) if flags2[j]]
    transpositions = sum(a != b for a, b in zip(seq1, seq2)) // 2
    return (
        matches / len1 + matches / len2 + (matches - transpositions) / matches
    ) / 3.0


def jaro_winkler(s1: str, s2: str, weight: float = 0.1, threshold: float = 0.7) -> float:
    score = jaro(s1, s2)
    if score >= threshold:
        prefix = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            prefix += 1
        score += prefix * weight * (1.0 - score)
    return score
