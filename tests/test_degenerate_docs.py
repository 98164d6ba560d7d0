"""Adversarial degenerate-documents fixture: every documents-touching
oracle pair vs DuckDB on a 20-row corpus of edge-case texts.

Why this exists: the driver corpora (sf0.001–sf0.1) contain no empty,
1-token, or sub-n-token documents, so the whole test suite and both
committed oracle sweeps were structurally blind to the degenerate-doc
class — and three queries (q249, q189, q459) shipped broken/silently
wrong at sf1, where the derived corpus has an empty doc and several
1-token docs. Spark's descending ``SEQUENCE(1, 0)`` was the shared
root cause (see tools/lint_descending_sequence.py), but this fixture
is deliberately broader: whitespace runs, leading/trailing spaces,
space-only texts, unicode (latin-1 accents, CJK), and heavy repetition
all go through EVERY oracle-paired documents query, so any future
engine/oracle divergence on edge-case text becomes a unit-test failure
instead of an sf1 audit finding.

Non-documents tables are symlinked from sf0.001, so documents queries
that join other tables still run. Queries that legitimately return
empty on BOTH sides on this tiny corpus are accepted (the standard
compare flags both-empty as "can't verify" for the driver gate; here
the throw/phantom-row check is the point and empty==empty is a pass).
"""

from __future__ import annotations

import os
import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from shredder_spark import queries as q
from shredder_spark.catalog import TABLES
from tests.oracle_utils import compare_query

SF_BASE = "/root/testdata/sf0.001"

# doc_id < 100 keeps these inside every sampled-subset query
# (several registry queries filter doc_id < 100).
DEGENERATE_DOCS = [
    # (doc_id, text, lang, source)
    (0, "", "en", "src0"),                          # empty: the q459 killer
    (1, "a", "en", "src0"),                         # 1 char, 1 token
    (2, "hello", "de", "src1"),                     # 1 token, multi-char
    (3, "hello world", "es", "src1"),               # 2 tokens (bigram min)
    (4, "the fast table", "zh", "src2"),            # 3 tokens
    (5, "scan join sort merge", "en", "src2"),      # 4 tokens (< 5-gram)
    (6, "a  b", "de", "src3"),                      # double space: '' token
    (7, " lead", "es", "src3"),                     # leading space
    (8, "trail ", "zh", "src0"),                    # trailing space
    (9, "   ", "en", "src1"),                       # spaces only
    (10, "héllo wörld café", "de", "src2"),   # accents
    (11, "中文 文档 测试", "zh", "src3"),  # CJK
    (12, "dup dup dup dup dup dup", "en", "src0"),  # heavy repetition
    (13, "x y x y x y x y", "de", "src1"),          # alternating bigrams
    # normal-ish docs sharing vocabulary so joins/PMI/contamination
    # have non-degenerate mass to work over
    (14, "the fast key order sort table scan merge part window", "en", "src2"),
    (15, "spark group query row data slow small filter customer line", "es", "src3"),
    (16, "join a filter window row join stream customer data group", "de", "src0"),
    (17, "the fast key order sort table scan merge part window", "zh", "src1"),
    (18, "query data table scan the a window sort fast merge", "en", "src2"),
    (19, "the a the a the a the a the a the a", "es", "src3"),
    # supplementary-plane codepoints: Spark and DuckDB both count
    # codepoints (verified), but any byte/UTF-16 leak would diverge
    (20, "🙂a 🎉b 🙂a", "en", "src0"),
    (21, "🙂", "de", "src1"),                       # 1 emoji, 1 token
    # non-space whitespace: SPLIT on ' ' keeps \t/\n INSIDE tokens on
    # both engines (verified) — any \s-based tokenizer leak diverges
    (22, "a\tb c\nd", "es", "src2"),
    (23, "\n", "zh", "src3"),                       # newline-only text
]


@pytest.fixture(scope="module")
def degenerate_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("degenerate_sf")
    for t in TABLES:
        if t == "documents":
            continue
        os.symlink(f"{SF_BASE}/{t}.parquet", str(d / f"{t}.parquet"))
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in DEGENERATE_DOCS], pa.int64()),
        "text": pa.array([r[1] for r in DEGENERATE_DOCS], pa.string()),
        "lang": pa.array([r[2] for r in DEGENERATE_DOCS], pa.string()),
        "source": pa.array([r[3] for r in DEGENERATE_DOCS], pa.string()),
        "n_chars": pa.array([len(r[1]) for r in DEGENERATE_DOCS], pa.int64()),
    })
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


def _documents_touching_paired():
    names = []
    for name, query in sorted(q.registry().items()):
        if query.oracle is None:
            continue
        texts = (getattr(query, "engine_sql", None) or "") + query.oracle
        if re.search(r"\bdocuments\b", texts):
            names.append(name)
    return names


DOCS_QUERIES = _documents_touching_paired()


def test_fixture_covers_the_family():
    # the documents family is large; if this collapses, the fixture
    # silently stops guarding anything
    assert len(DOCS_QUERIES) >= 150, len(DOCS_QUERIES)


@pytest.mark.parametrize("name", DOCS_QUERIES)
def test_documents_query_on_degenerate_corpus(spark, degenerate_sf_dir, name):
    query = q.registry()[name]
    problems = compare_query(spark, degenerate_sf_dir, query)
    # both-empty is fine HERE (tiny adversarial corpus): the check is
    # "no throw, no phantom rows, engine == oracle", not "non-trivial"
    problems = [p for p in problems if "empty result on both sides" not in p]
    assert not problems, f"{name}: " + "; ".join(problems)
