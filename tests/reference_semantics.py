"""Pure-Python reimplementation of the reference's operator semantics, used
as the differential-test oracle for the Spark expressions.

Each function mirrors the cited reference code exactly (including bugs, where
noted) — ref:cleaners.py / ref:filters.py / ref:utils.py /
ref:minhash_deduplication.py.  Written from the SURVEY.md §2 spec; kept
dependency-free (no ftfy/kenlm/scipy).
"""

from __future__ import annotations

import hashlib
import re
import string
import struct
from collections import Counter, defaultdict

import numpy as np

# --- cleaners (ref:cleaners.py) -------------------------------------------

WHITESPACE = {
    " ", "\u0084", "\u2002", "\u2003", "\u2005", "\u2008",
    "\u2009", "\u200a", "\u202f", "\u3000", "\ufffc",
}

UNICODE_PUNCT = {
    "，": ",", "。": ".", "、": ",", "„": '"', "”": '"', "“": '"', "«": '"',
    "»": '"', "１": '"', "」": '"', "「": '"', "《": '"', "》": '"', "´": "'",
    "∶": ":", "：": ":", "？": "?", "！": "!", "（": "(", "）": ")", "；": ";",
    "–": "-", "—": " - ", "．": ". ", "～": "~", "’": "'", "…": "...",
    "━": "-", "〈": "<", "〉": ">", "【": "[", "】": "]", "％": "%", "►": "-",
}


def normalize_whitespace(text: str) -> str:
    return "".join(c if c not in WHITESPACE else " " for c in text)


def normalize_punctuation(text: str) -> str:
    return "".join(UNICODE_PUNCT.get(c, c) for c in text)


def remove_empty_lines_intended(text: str) -> str:
    lines = text.split("\n")
    return "\n".join(x for x in lines if not re.match(r"^\s*$", x))


def clean_new_lines(text: str) -> str:
    return text.strip().replace("\n", "")


# --- filters (ref:filters.py) ----------------------------------------------


def get_words(text: str) -> list[str]:
    return re.findall(r"\w+", text.lower())


def check_word_number(doc: str, lo=5, hi=512) -> bool:
    return lo <= len(get_words(doc)) <= hi


def nsfw_ratio(doc: str, phrases: list[str]) -> float:
    doc = str(doc.lower())
    n = len(get_words(doc))
    if n == 0:
        return 0.0
    return sum(doc.count(p) for p in phrases) / n


def lowercase_ratio(doc: str) -> float:
    if not len(doc):
        return 0.0
    return sum(1 for c in doc if c in string.ascii_lowercase) / len(doc)


def char_repetition_ratio(doc: str, n: int = 10) -> float:
    ngrams = [doc[i : i + n] for i in range(len(doc) - n + 1)]
    freq = Counter(ngrams)
    if not freq:
        return 0
    values = sorted(freq.values(), reverse=True)
    val_one = len([v for v in values if v == 1])
    k = min(int(np.sqrt(len(values))), len(values) - val_one)
    return sum(values[:k]) / sum(values)


def check_truncation(doc: str, token="<|truncation_splitter|>") -> bool:
    model_response, edited_response = doc.split(token)
    return edited_response not in model_response


PUNCTUATIONS = {".", "!", "?", "*", '"', "”", "~", "…", "'", "]", ")", "`", ";"}


def check_completion(doc: str) -> bool:
    doc = str(doc).strip()
    last = None if len(doc) == 0 else doc[-1]
    return last in PUNCTUATIONS


def check_gender(doc: str, token="<|gender_splitter|>") -> bool:
    response, edited = doc.split(token)
    g = ["he", "she", "him", "her", "girl", "boy"]
    rw, ew = response.lower().split(), edited.lower().split()
    for i in range(min(len(rw), len(ew))):
        if rw[i] in g and ew[i] in g and rw[i] != ew[i]:
            return True
    return False


def check_empty(doc: str) -> bool:
    return len(doc.replace("...", "").replace("…", "").strip()) != 0


def check_ethics(doc: str, phrases: list[str]) -> bool:
    doc = str(doc.lower())
    return not any(p in doc for p in phrases)


# --- minhash dedup (ref:minhash_deduplication.py) ---------------------------

SEED = 42
NON_ALPHA = re.compile("[^A-Za-z_0-9]")
MAX_HASH = np.uint64((1 << 32) - 1)
MERSENNE_PRIME = np.uint64((1 << 61) - 1)


def sha1_hash32(data: bytes) -> int:
    return struct.unpack("<I", hashlib.sha1(data).digest()[:4])[0]


def reference_minhash_dedup_keep_ids(
    texts: dict[int, str],
    ngram_size=5,
    num_perm=256,
    threshold=0.7,
    min_ngram_size=5,
    b_r: tuple[int, int] | None = None,
) -> set[int]:
    """Driver-style single-process reimplementation of the whole reference
    dedup (embed_func → LSH tables → union-find → keep min), returning the
    surviving id set."""
    from chat_data_pipeline_spark.operators.dedup import optimal_param

    B, R = b_r if b_r is not None else optimal_param(threshold, num_perm)
    hashranges = [(i * R, (i + 1) * R) for i in range(B)]
    rng = np.random.RandomState(SEED)
    permutations = np.array(
        [
            (
                rng.randint(1, MERSENNE_PRIME, dtype=np.uint64),
                rng.randint(0, MERSENNE_PRIME, dtype=np.uint64),
            )
            for _ in range(num_perm)
        ],
        dtype=np.uint64,
    ).T

    tables: list[dict[bytes, set[int]]] = [defaultdict(set) for _ in range(B)]
    for idx, content in texts.items():
        hashvalues = np.ones(num_perm, dtype=np.uint64) * MAX_HASH
        seq = NON_ALPHA.split(content)
        tokens = (
            {" ".join(seq[i : i + ngram_size]) for i in range(len(seq) - ngram_size + 1)}
            if len(seq) >= min_ngram_size
            else set()
        )
        if tokens:
            hv = np.array([sha1_hash32(t.encode("utf-8")) for t in tokens], dtype=np.uint64)
            a, bb = permutations
            phv = np.bitwise_and(
                ((hv * np.tile(a, (len(hv), 1)).T).T + bb) % MERSENNE_PRIME, MAX_HASH
            )
            hashvalues = np.vstack([phv, hashvalues]).min(axis=0)
        for (start, end), table in zip(hashranges, tables):
            table[bytes(hashvalues[start:end].byteswap().data)].add(idx)

    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x, y):
        px, py = find(x), find(y)
        parent[px] = parent[py] = min(px, py)

    for table in tables:
        for cluster in table.values():
            if len(cluster) <= 1:
                continue
            idx = min(cluster)
            for x in cluster:
                union(x, idx)

    return {i for i in texts if find(i) == i}
