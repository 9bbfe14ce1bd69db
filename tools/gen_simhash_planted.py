#!/usr/bin/env python
"""Construct + verify the planted simhash corpus for the graded oracle.

Design (all pure-alpha words — TOKEN_REGEX splits alnum mixes):
- 5 clusters, disjoint vocabularies. Per cluster: doc A (base token
  sequence), doc B (REVERSED sequence — simhash is a bag-of-tokens
  fingerprint, so a permutation has the IDENTICAL fingerprint: Hamming
  0 by construction, not observation), doc C (base with one token
  flipped — Hamming small; the flip index is searched so the pair
  lands <= 3, then frozen).
- 35 fillers with per-doc unique vocabularies: fingerprints are
  independent 64-bit draws, expected pairwise Hamming ~32
  (P(<=3) ~ 1e-14) — verified exhaustively here anyway.

Prints the frozen corpus rows + the expected (id_a, id_b, hamming)
pair set for the catalog literal and DuckDB VALUES oracle.
"""
from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from spatially_databricks_etl_spark.operators.dedup import simhash
from spatially_databricks_etl_spark.session import get_spark


def aa(i: int) -> str:
    return chr(97 + i // 26) + chr(97 + i % 26)


def cluster_tokens(c: int, n: int = 40) -> list[str]:
    return [f"c{aa(c)}tok{aa(j)}" for j in range(n)]


def filler_tokens(i: int, n: int = 30) -> list[str]:
    return [f"f{aa(i)}x{aa(j)}" for j in range(n)]


spark = get_spark(app_name="gen_simhash")
spark.sparkContext.setLogLevel("ERROR")


def fingerprints(docs: list[tuple[int, str]]) -> dict[int, int]:
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        r["doc_id"]: r["sh"]
        for r in df.select("doc_id", simhash(F.col("text"), seed=42).alias("sh")).collect()
    }


def ham(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


# search a flip index per cluster whose C-doc lands within Hamming 3
flip_choice: dict[int, int] = {}
for c in range(5):
    base = cluster_tokens(c)
    cands = [(0, " ".join(base))] + [
        (1 + j, " ".join(base[:j] + [f"c{aa(c)}alt{aa(j)}"] + base[j + 1 :]))
        for j in range(len(base))
    ]
    fps = fingerprints(cands)
    for j in range(len(base)):
        h = ham(fps[0], fps[1 + j])
        if 1 <= h <= 3:
            flip_choice[c] = j
            print(f"# cluster {c}: flip index {j} -> hamming {h}")
            break
    else:
        raise SystemExit(f"cluster {c}: no single-flip lands <=3; widen search")

# freeze the corpus
docs: list[tuple[int, str]] = []
for c in range(5):
    base = cluster_tokens(c)
    j = flip_choice[c]
    flipped = base[:j] + [f"c{aa(c)}alt{aa(j)}"] + base[j + 1 :]
    docs.append((100 * c + 0, " ".join(base)))
    docs.append((100 * c + 1, " ".join(reversed(base))))
    docs.append((100 * c + 2, " ".join(flipped)))
for i in range(35):
    docs.append((1000 + i, " ".join(filler_tokens(i))))

fps = fingerprints(docs)
pairs = {}
for (ia, fa), (ib, fb) in itertools.combinations(sorted(fps.items()), 2):
    h = ham(fa, fb)
    if h <= 3:
        pairs[(ia, ib)] = h

expected = set()
for c in range(5):
    a, b, cc = 100 * c, 100 * c + 1, 100 * c + 2
    expected |= {(a, b), (a, cc), (b, cc)}
assert set(pairs) == expected, f"planted set mismatch: extra={set(pairs)-expected} missing={expected-set(pairs)}"
for c in range(5):
    assert pairs[(100 * c, 100 * c + 1)] == 0, "reorder pair must be Hamming 0"

print("\n# corpus rows:")
for did, text in docs:
    print(f"    ({did}, {text!r}),")
print("\n# expected pairs (id_a, id_b, hamming):")
for (ia, ib), h in sorted(pairs.items()):
    print(f"    ({ia}, {ib}, {h}),")
spark.stop()
