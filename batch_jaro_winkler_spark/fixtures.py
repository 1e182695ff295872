"""Deterministic synthetic fixtures (FIXTURES.md F1-F4, F6).

Pure functions of (seed, size): a Common-Crawl-style ``documents`` corpus
with planted near-duplicate clusters + ground-truth dup pairs, and seeded
word lists for the kernel's differential-oracle tests (replacing the
reference's stripped support/english_words.txt / chinese_words.txt,
see /root/reference/.MISSING_LARGE_BLOBS).
"""

from __future__ import annotations

import hashlib
import random
import string
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone

__all__ = ["make_wordlist", "make_corpus", "Corpus"]

_VOCAB_SIZE = 4000


def make_wordlist(n_ascii: int = 20000, n_cjk: int = 2000, seed: int = 0) -> list[str]:
    """Seeded word list mirroring the reference correctness-test corpus shape
    (FIXTURES.md F4): lowercase ASCII words length 2-15 with a Zipf-ish
    letter distribution, plus CJK-range words."""
    rng = random.Random(seed)
    letters = "etaoinshrdlcumwfgypbvkjxqz"
    weights = [1.0 / (i + 1) ** 0.7 for i in range(len(letters))]
    words = []
    for _ in range(n_ascii):
        ln = rng.randint(2, 15)
        words.append("".join(rng.choices(letters, weights=weights, k=ln)))
    for _ in range(n_cjk):
        ln = rng.randint(1, 4)
        words.append("".join(chr(rng.randint(0x4E00, 0x9FA5)) for _ in range(ln)))
    return words


def _vocab(rng: random.Random) -> list[str]:
    letters = string.ascii_lowercase
    weights = [1.0 / (i + 1) ** 0.6 for i in range(26)]
    out = []
    for _ in range(_VOCAB_SIZE):
        ln = rng.randint(3, 10)
        out.append("".join(rng.choices(letters, weights=weights, k=ln)))
    return out


@dataclass
class Corpus:
    """rows: list of dicts with url/warc_ts/html/text/lang (input_hint shape);
    true_pairs: set of (doc_index_a, doc_index_b) with a < b, all planted
    near-dup pairs (brute-force ground truth for the recall>=0.99 gate);
    substring_pairs: pairs linked only by a verbatim >=200-char substring
    (catchable only by the fingerprint/suffix stage, not shingle LSH)."""

    rows: list = field(default_factory=list)
    true_pairs: set = field(default_factory=set)
    substring_pairs: set = field(default_factory=set)


_LANGS = ["en", "es", "zh", "fr", "de"]
_BOILER = [
    "all rights reserved copyright notice terms of service apply",
    "subscribe to our newsletter for weekly updates and offers",
    "cookie policy we use cookies to improve your experience",
]


def _perturb(words: list[str], rng: random.Random, vocab: list[str]) -> list[str]:
    """One seeded near-dup perturbation (FIXTURES.md F1 kinds a-e)."""
    words = list(words)
    kind = rng.randint(0, 4)
    if kind == 0:  # swap 1-3 word pairs
        for _ in range(rng.randint(1, 3)):
            if len(words) > 2:
                i = rng.randrange(len(words) - 1)
                words[i], words[i + 1] = words[i + 1], words[i]
    elif kind == 1:  # delete/insert 1-5 words
        for _ in range(rng.randint(1, 5)):
            if rng.random() < 0.5 and len(words) > 6:
                del words[rng.randrange(len(words))]
            else:
                words.insert(rng.randrange(len(words) + 1), rng.choice(vocab))
    elif kind == 2:  # substitute <=2% of words
        k = max(1, int(len(words) * 0.02))
        for _ in range(rng.randint(1, k)):
            words[rng.randrange(len(words))] = rng.choice(vocab)
    elif kind == 3:  # append/prepend boilerplate
        extra = rng.choice(_BOILER).split()
        words = extra + words if rng.random() < 0.5 else words + extra
    # kind == 4: exact copy, different url
    return words


def make_corpus(n_rows: int = 500, seed: int = 42) -> Corpus:
    """Seeded corpus with ~60% unique docs and ~40% in planted near-dup
    clusters of size 2-8 (FIXTURES.md F1), plus ~3% substring-planted rows."""
    rng = random.Random(seed)
    vocab = _vocab(rng)
    corpus = Corpus()
    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)

    base_texts: list[list[str]] = []
    cluster_of: list[int | None] = []
    i = 0
    cluster_id = 0
    while i < n_rows:
        if rng.random() < 0.18 and n_rows - i >= 2:  # start a near-dup cluster
            size = min(rng.randint(2, 8), n_rows - i)
            base = rng.choices(vocab, k=rng.randint(30, 600))
            members = []
            for j in range(size):
                words = base if j == 0 else _perturb(base, rng, vocab)
                base_texts.append(words)
                cluster_of.append(cluster_id)
                members.append(i + j)
            for a_i, a in enumerate(members):
                for b in members[a_i + 1 :]:
                    corpus.true_pairs.add((a, b))
            cluster_id += 1
            i += size
        else:
            base_texts.append(rng.choices(vocab, k=rng.randint(30, 600)))
            cluster_of.append(None)
            i += 1

    # substring planting: ~3% of unique rows embed a verbatim >=200-char
    # substring of another document inside otherwise-unrelated text
    uniques = [k for k, c in enumerate(cluster_of) if c is None]
    n_sub = max(0, int(n_rows * 0.03))
    rng.shuffle(uniques)
    for k in range(0, min(n_sub * 2, len(uniques) - 1), 2):
        src, dst = uniques[k], uniques[k + 1]
        src_text = " ".join(base_texts[src])
        if len(src_text) < 260:
            continue
        start = rng.randrange(0, len(src_text) - 250)
        chunk = src_text[start : start + rng.randint(200, 250)]
        words = base_texts[dst]
        at = rng.randrange(len(words) + 1)
        base_texts[dst] = words[:at] + chunk.split() + words[at:]
        pair = (min(src, dst), max(src, dst))
        corpus.substring_pairs.add(pair)

    for idx, words in enumerate(base_texts):
        text = " ".join(words)
        h = hashlib.md5(f"{seed}-{idx}".encode()).hexdigest()[:8]
        corpus.rows.append(
            {
                "url": f"https://site{idx % 97}.example/{h}/page{idx}",
                "warc_ts": t0 + timedelta(seconds=idx * 137),
                "html": f"<html><body><p>{text}</p></body></html>".encode(),
                "text": text,
                "lang": _LANGS[idx % len(_LANGS)],
            }
        )
    return corpus
