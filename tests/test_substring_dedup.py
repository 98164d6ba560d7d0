"""ExactSubstr cross-doc substring dedup vs pure-Python references.

Two independent references on fixture docs:
- diagonal-run DP: all maximal exact matches (MEMs) >= L per doc pair
  — the ground truth for ``duplicate_substring_spans``;
- suffix array + kasai LCP over the sentinel-joined corpus: per-
  position max cross-doc match length, unioned into duplicated
  character ranges — the ground truth for ``duplicated_char_stats``
  (this is the Lee et al. 2022 formulation itself).
The two references are also cross-checked against each other.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from shredder_spark.operators.substring_dedup import (
    duplicate_substring_spans,
    duplicated_char_stats,
)

L = 40  # min_len under test
K = 16


# ------------------------------------------------------------------ fixtures
SHARED_A = ("the quick brown fox jumps over the lazy dog while the band "
            "plays on and the crowd cheers loudly tonight")          # 104 chars
SHARED_B = ("it was a bright cold day in april and the clocks were "
            "striking thirteen somewhere far away")                  # 91 chars
SHARED_SHORT = "too short to ever be reported here"                  # < L
SHARED_UNI = ("díacrìtics and émojis do not bréak the chàracter "
              "offsets because utf-32 views are exact")              # multibyte

DOCS = {
    0: "prefix zero " + SHARED_A + " suffix zero",
    1: "one has it too: " + SHARED_A + " and then " + SHARED_B + " end",
    2: "two only carries " + SHARED_B + " nothing else of note here",
    3: "three has " + SHARED_SHORT + " which is below threshold " + SHARED_SHORT,
    # same-doc repeat of a long passage — must NOT be reported (cross-doc only)
    4: "four repeats itself " + SHARED_A[:60] + " mid " + SHARED_A[:60] + " done",
    5: "five is unicode " + SHARED_UNI + " tail five",
    6: "six is unicode too " + SHARED_UNI + " tail six",
    # two distinct shared spans with doc 0 on the SAME diagonal
    7: "prefix zero " + SHARED_A + " suffix nero",
}


def _mems(a: str, b: str, min_len: int) -> set:
    """All maximal exact matches >= min_len between a and b, as
    (i_start, j_start, length) — maximal runs of equality per
    diagonal."""
    out = set()
    for d in range(-(len(b) - 1), len(a)):
        i, j = max(d, 0), max(d, 0) - d
        run = 0
        while i < len(a) and j < len(b):
            if a[i] == b[j]:
                run += 1
            else:
                if run >= min_len:
                    out.add((i - run, j - run, run))
                run = 0
            i += 1
            j += 1
        if run >= min_len:
            out.add((i - run, j - run, run))
    return out


def _sa_dup_ranges(docs: dict, min_len: int) -> dict:
    """Per-doc merged duplicated ranges via suffix array + kasai LCP:
    position p of doc d is duplicated iff some suffix q <= p of d has
    a common prefix of length m_q >= max(min_len, p - q + 1) with a
    suffix of ANOTHER doc; equivalently union [q, q + m_q) for
    m_q >= min_len."""
    text, owner, start = [], [], {}
    for idx, (d, s) in enumerate(sorted(docs.items())):
        start[d] = len(text)
        text.extend(s)
        owner.extend([d] * len(s))
        text.append(chr(0xE000 + idx))  # unique sentinel, LCP-breaking
        owner.append(-1 - idx)
    s = "".join(text)
    n = len(s)
    sa = sorted(range(n), key=lambda i: s[i:])
    rank = [0] * n
    for r, i in enumerate(sa):
        rank[i] = r
    lcp = [0] * n  # lcp[r] = LCP(sa[r-1], sa[r])
    h = 0
    for i in range(n):
        if rank[i] > 0:
            j = sa[rank[i] - 1]
            while i + h < n and j + h < n and s[i + h] == s[j + h]:
                h += 1
            lcp[rank[i]] = h
            if h:
                h -= 1
        else:
            h = 0
    m = [0] * n
    cur = 0
    for r in range(1, n):  # down sweep: nearest different-owner above
        cur = min(cur, lcp[r])
        if owner[sa[r - 1]] != owner[sa[r]]:
            cur = max(cur, lcp[r])
        m[sa[r]] = max(m[sa[r]], cur)
    cur = 0
    for r in range(n - 2, -1, -1):  # up sweep
        cur = min(cur, lcp[r + 1])
        if owner[sa[r + 1]] != owner[sa[r]]:
            cur = max(cur, lcp[r + 1])
        m[sa[r]] = max(m[sa[r]], cur)
    ranges: dict = {d: [] for d in docs}
    for i in range(n):
        d = owner[i]
        if d >= 0 and m[i] >= min_len:
            ranges[d].append((i - start[d], i - start[d] + m[i]))
    return {d: _merge(r) for d, r in ranges.items() if r}


def _merge(iv):
    iv = sorted(iv)
    out = [list(iv[0])]
    for a, b in iv[1:]:
        if a > out[-1][1]:
            out.append([a, b])
        else:
            out[-1][1] = max(out[-1][1], b)
    return [tuple(x) for x in out]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        [(d, t) for d, t in DOCS.items()], "doc_id long, text string")


def test_spans_match_diagonal_dp(spark, docs_df):
    got = {(r.i, r.j, r.i_start, r.j_start, r.length)
           for r in duplicate_substring_spans(
               docs_df, min_len=L, k=K, max_bucket_size=10_000).collect()}
    want = set()
    ids = sorted(DOCS)
    for x in ids:
        for y in ids:
            if x < y:
                for a, b, ln in _mems(DOCS[x], DOCS[y], L):
                    want.add((x, y, a, b, ln))
    assert got == want
    # sanity on the fixture itself: cross-doc spans exist, the same-doc
    # repeat (doc 4 internal) is not representable in (i < j) output,
    # and every span is verbatim + maximal
    assert want, "fixture must plant at least one cross-doc duplicate"
    for i, j, a, b, ln in got:
        ti, tj = DOCS[i], DOCS[j]
        assert ti[a:a + ln] == tj[b:b + ln]
        assert a == 0 or b == 0 or ti[a - 1] != tj[b - 1]
        assert a + ln == len(ti) or b + ln == len(tj) or ti[a + ln] != tj[b + ln]


def test_char_stats_match_suffix_array(spark, docs_df):
    ref = _sa_dup_ranges(DOCS, L)
    got = {r.doc_id: (r.dup_chars, r.n_spans)
           for r in duplicated_char_stats(
               docs_df, min_len=L, k=K, max_bucket_size=10_000).collect()}
    want = {d: (sum(b - a for a, b in rs), len(rs)) for d, rs in ref.items()}
    assert got == want


def test_references_agree():
    """The suffix-array range reference equals the union of DP MEM
    spans — the two independent formulations pin each other."""
    ref = _sa_dup_ranges(DOCS, L)
    ids = sorted(DOCS)
    by_doc: dict = {d: [] for d in ids}
    for x in ids:
        for y in ids:
            if x < y:
                for a, b, ln in _mems(DOCS[x], DOCS[y], L):
                    by_doc[x].append((a, a + ln))
                    by_doc[y].append((b, b + ln))
    dp = {d: _merge(r) for d, r in by_doc.items() if r}
    assert dp == ref


def test_unicode_offsets(spark, docs_df):
    spans = duplicate_substring_spans(
        docs_df.filter(F.col("doc_id").isin(5, 6)),
        min_len=L, k=K, max_bucket_size=10_000).collect()
    assert spans, "unicode docs share a long passage"
    for r in spans:
        assert DOCS[r.i][r.i_start:r.i_start + r.length] == \
               DOCS[r.j][r.j_start:r.j_start + r.length]


def test_runs_on_real_documents(spark, sf_dir):
    """Smoke at sf0.001: the operator runs distributed on the driver
    tables and every reported span is verbatim-checkable."""
    from shredder_spark.catalog import load_table

    documents = load_table(spark, sf_dir, "documents")
    spans = duplicate_substring_spans(
        documents.select("doc_id", "text"), min_len=60).limit(20)
    texts = {r.doc_id: r.text for r in
             documents.select("doc_id", "text").collect()}
    for r in spans.collect():
        assert texts[r.i][r.i_start:r.i_start + r.length] == \
               texts[r.j][r.j_start:r.j_start + r.length]
        assert r.length >= 60


def test_plan_anchor_shuffle_is_ids_only(spark, docs_df):
    """Scale posture pins: (1) the anchor bucket shuffle groups a
    relation of (_id, _pos, _h) only — text never rides the anchor
    exchange; (2) exactly ONE anchor UDF pass and ONE extension pass
    exist (the pandas-UDF-expression form measurably duplicated the
    extension into two ArrowEvalPython nodes via filter pushdown)."""
    df = duplicate_substring_spans(docs_df, min_len=L, k=K)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    lines = plan.splitlines()
    agg = [ln for ln in lines if "Aggregate [_h#" in ln]
    assert len(agg) == 1, plan
    # the aggregate's child projection (next line) defines the shuffled
    # relation: ids and positions only, no _text column
    child = lines[lines.index(agg[0]) + 1]
    assert "Project [_id#" in child and "_pos#" in child and "_h#" in child
    assert "_text" not in child, child
    assert sum("ArrowEvalPython" in ln for ln in lines) == 1, plan
    assert sum("MapInPandas" in ln for ln in lines) == 1, plan
