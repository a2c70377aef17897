"""Edge-case tests for content-defined chunking
(``functions/text.cdc_chunk_stats``) against a pure-Python reference.

The DuckDB oracle (text_cdc_chunks) cross-checks the operator at
corpus scale, but the synthetic corpus contains no short documents —
so the n < 3 guard (Spark's ``sequence(start, stop)`` REVERSES when
start > stop instead of returning empty) and the exact boundary
arithmetic never get exercised there. Crafted docs close that gap."""

from __future__ import annotations

import hashlib
import re

import pytest

from rs_query_engine_spark.functions.text import cdc_chunk_stats

MASK = 8


def _ref(text: str) -> tuple[int, int, int, float]:
    """Pure-Python mirror of the operator: same tokenization as
    Spark's split(lower, \\s+) — note re.split keeps empty leading
    tokens and '' tokenizes to [''], exactly like Spark — same md5
    window hash, same boundary rule (1-indexed i in [3, n), window =
    tokens i-2..i)."""
    tok = re.split(r"\s+", text.lower())
    n = len(tok)
    bpos = []
    for i in range(3, n + 1):
        if i >= n:
            break
        window = " ".join(tok[i - 3 : i])
        h = int(hashlib.md5(window.encode()).hexdigest()[:8], 16)
        if h % MASK == 0:
            bpos.append(i)
    edges = [0] + bpos + [n]
    lens = [b - a for a, b in zip(edges, edges[1:])]
    n_chunks = len(bpos) + 1
    return n, n_chunks, max(lens), n / n_chunks


# a boundary-dense long doc: enough distinct 3-token windows that some
# hash into the 1/8 boundary space with near-certainty
LONG_DOC = " ".join(f"tok{i}" for i in range(200))

DOCS = [
    (0, ""),  # tokenizes to [''] — 1 token, 1 chunk
    (1, "one"),
    (2, "one two"),
    (3, "one two three"),  # first doc with a complete window (i=3=n → no cut)
    (4, "one two three four"),
    (5, "  leading whitespace doc"),  # empty first token, like Spark
    (6, LONG_DOC),
]


@pytest.fixture(scope="module")
def result(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    rows = cdc_chunk_stats(df, "doc_id", "text", mask=MASK).collect()
    return {r["doc_id"]: r for r in rows}


@pytest.mark.parametrize("doc_id,text", DOCS)
def test_matches_python_reference(result, doc_id, text):
    n, n_chunks, max_chunk, avg = _ref(text)
    r = result[doc_id]
    assert r["n_tokens"] == n
    assert r["n_chunks"] == n_chunks
    assert r["max_chunk"] == max_chunk
    assert r["avg_chunk"] == pytest.approx(avg, rel=0, abs=0)


def test_short_docs_are_single_chunks(result):
    # n < 3: no complete window exists, so exactly one chunk spanning
    # the whole doc — the sequence-reversal guard's observable contract
    for doc_id in (0, 1, 2):
        r = result[doc_id]
        assert r["n_chunks"] == 1
        assert r["max_chunk"] == r["n_tokens"]


def test_long_doc_actually_chunks(result):
    # statistical sanity: 196 windows at 1/8 boundary probability make
    # zero cuts astronomically unlikely — a dead boundary predicate
    # (wrong hash, wrong mask, wrong guard) shows up here
    assert result[6]["n_chunks"] > 1
    assert result[6]["max_chunk"] < result[6]["n_tokens"]


def test_seeded_random_docs_match_reference(spark):
    """Generalize the crafted edge docs: 30 seeded-random token lists
    spanning lengths 0–29 (every short-doc length plus boundary-mix
    territory) must match the Python reference exactly."""
    import random

    rng = random.Random(20260814)
    docs = []
    for i in range(30):
        n = i
        toks = [f"w{rng.randrange(40)}" for _ in range(n)]
        docs.append((1000 + i, " ".join(toks)))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: r for r in cdc_chunk_stats(df, "doc_id", "text", mask=MASK).collect()
    }
    for doc_id, text in docs:
        n, n_chunks, max_chunk, avg = _ref(text)
        r = got[doc_id]
        assert (r["n_tokens"], r["n_chunks"], r["max_chunk"]) == (n, n_chunks, max_chunk)
        assert r["avg_chunk"] == avg
