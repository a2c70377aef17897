"""Property tests for :func:`operators.dedup.exact_substring_spans`
against a pure-Python SUFFIX-ARRAY + LCP reference.

The operator finds maximal duplicated regions by grouping character
L-grams; the reference finds them the way Lee et al.'s ExactSubstr
does — sort all suffixes, mark every position whose suffix shares an
LCP ≥ L with a suffix-order neighbor, merge. The two formulations are
provably equivalent (see the operator docstring); these tests check
the implementations actually agree, on hand-built corpora with
planted duplicates and on hypothesis-generated ones.
"""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rs_query_engine_spark.operators.dedup import exact_substring_spans


def _normalize(s: str) -> str:
    return re.sub(r"\s+", " ", s.lower()).strip()


def _ref_spans(texts: dict[int, str], L: int) -> set[tuple[int, int, int]]:
    """Suffix-array reference: (doc, start, end) maximal duplicated
    regions over normalized text."""
    norm = {d: _normalize(t) for d, t in texts.items()}
    # all suffixes across the corpus, sorted — a position starts a
    # duplicated substring of length >= L iff its suffix shares an
    # LCP >= L with an adjacent suffix in this order
    suf = sorted(
        (txt[off:], d, off) for d, txt in norm.items() for off in range(len(txt))
    )

    def lcp(a: str, b: str) -> int:
        n = min(len(a), len(b))
        for i in range(n):
            if a[i] != b[i]:
                return i
        return n

    marked: set[tuple[int, int]] = set()
    for (s1, d1, o1), (s2, d2, o2) in zip(suf, suf[1:]):
        if lcp(s1, s2) >= L:
            marked.add((d1, o1))
            marked.add((d2, o2))
    # merge per-doc overlapping/adjacent [off, off+L) windows
    out: set[tuple[int, int, int]] = set()
    for d in norm:
        offs = sorted(o for (dd, o) in marked if dd == d)
        if not offs:
            continue
        start, end = offs[0], offs[0] + L
        for o in offs[1:]:
            if o > end:
                out.add((d, start, end))
                start, end = o, o + L
            else:
                end = o + L
        out.add((d, start, end))
    return out


def _spark_spans(spark, texts: dict[int, str], L: int) -> set[tuple[int, int, int]]:
    df = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )
    res = exact_substring_spans(df, "doc_id", "text", min_len=L)
    return {
        (r["doc_id"], r["span_start"], r["span_end"]) for r in res.collect()
    }


def test_planted_cross_doc_duplicate(spark):
    shared = "the quick brown fox jumps over the lazy dog"
    texts = {
        1: f"alpha {shared} omega",
        2: f"zzz {shared} qqq unrelated tail text here",
        3: "completely different content with no repeats at all",
    }
    got = _spark_spans(spark, texts, L=20)
    assert got == _ref_spans(texts, L=20)
    assert {d for d, _, _ in got} == {1, 2}


def test_self_repeat_within_one_doc(spark):
    # ExactSubstr semantics: two occurrences in the SAME doc count
    texts = {7: "abcdefghij" * 3 + " tail", 8: "no dups here at all ok"}
    got = _spark_spans(spark, texts, L=10)
    assert got == _ref_spans(texts, L=10)
    assert any(d == 7 for d, _, _ in got)
    assert not any(d == 8 for d, _, _ in got)


def test_adjacent_windows_merge_into_one_maximal_span(spark):
    # a 30-char shared region with L=10 must yield ONE span covering
    # all 30 chars, not 21 overlapping windows
    shared = "0123456789abcdefghijklmnopqrst"
    # boundaries differ on BOTH sides of the planted chunk (doc 1
    # wraps it in spaces, doc 2 abuts letters) so the maximal
    # duplicated region is exactly the chunk
    texts = {1: f"xx {shared} yy", 2: f"q{shared}tail padding"}
    got = _spark_spans(spark, texts, L=10)
    assert got == _ref_spans(texts, L=10)
    spans_1 = [(s, e) for d, s, e in got if d == 1]
    assert len(spans_1) == 1
    assert spans_1[0][1] - spans_1[0][0] == len(shared)


def test_no_duplicates_means_empty(spark):
    texts = {1: "every string here is unique", 2: "and so is this one friend"}
    assert _spark_spans(spark, texts, L=12) == set()
    assert _ref_spans(texts, L=12) == set()


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(
    data=st.data(),
    n_docs=st.integers(min_value=2, max_value=5),
)
def test_matches_suffix_array_reference(spark, data, n_docs):
    # random corpora over a tiny alphabet (maximizes accidental
    # repeats) with an occasionally-planted shared chunk
    chunk = st.text(alphabet="ab ", min_size=0, max_size=40)
    texts: dict[int, str] = {}
    planted = data.draw(chunk)
    for d in range(n_docs):
        t = data.draw(chunk)
        if data.draw(st.booleans()):
            t = t + planted
        texts[d] = t
    L = data.draw(st.integers(min_value=3, max_value=8))
    assert _spark_spans(spark, texts, L) == _ref_spans(texts, L)
