"""Adversarial degenerate-numeric fixture: every relational-table-
touching oracle pair vs DuckDB on sf0.001 PLUS appended edge rows.

Why this exists: the driver tables are clean TPC-H-shaped data — no
zero or negative prices, no NULL measures or keys, no epoch-boundary
dates — so the suite and all committed sweeps were structurally blind
to the degenerate-numeric class, the same blindness the docs/
embeddings/events legs each closed (and each caught real bugs:
q249/q189/q459 empty-doc, IVF NULL/ragged vectors). This leg gives
the relational family its turn: appended rows carry zero and negative
prices/balances, a 100% discount, NULL keys and NULL measures where
the schema allows them, fractional .5 quantities (ROUND half-way),
empty strings in name columns, orphan lineitems / customer-less
orders (FK holes), and 1970-epoch / 2038-int32-boundary / pre-1970
(negative-epoch) timestamps.

Rows are APPENDED to the sf0.001 tables (originals symlinked
elsewhere stay untouched): existing FK mass keeps every join
populated, while new rows attach edge values both to existing keys
(inside ``o_orderkey <= 500``-style subset filters via new
linenumbers) and to fresh keys beyond the existing max (FK holes).
Any engine/oracle divergence on this corpus is a genuine totality bug
in one of the paired texts.
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

def _ts(iso: str):
    """Naive-UTC datetime for an ISO timestamp string. pyarrow converts
    it to whatever unit the table's timestamp column actually uses."""
    import datetime

    return datetime.datetime.fromisoformat(iso)


def _append(base_dir: str, out_dir: str, name: str, rows: list[dict]) -> None:
    src = pq.read_table(f"{base_dir}/{name}.parquet")
    cols = {f.name: [] for f in src.schema}
    for r in rows:
        for c in cols:
            cols[c].append(r.get(c))
    extra = pa.table(
        {c: pa.array(v, src.schema.field(c).type) for c, v in cols.items()},
        schema=src.schema)
    pq.write_table(pa.concat_tables([src, extra]),
                   f"{out_dir}/{name}.parquet")


@pytest.fixture(scope="module")
def degenerate_sf_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("degenerate_rel"))
    import duckdb

    con = duckdb.connect()

    def kmax(t, c):
        return con.execute(
            f"SELECT MAX({c}) FROM '{SF_BASE}/{t}.parquet'").fetchone()[0]

    def kmin(t, c):
        return con.execute(
            f"SELECT MIN({c}) FROM '{SF_BASE}/{t}.parquet'").fetchone()[0]

    omax, cmax = kmax("orders", "o_orderkey"), kmax("customer", "c_custkey")
    smax, pmax = kmax("supplier", "s_suppkey"), kmax("part", "p_partkey")
    ok1, ok2 = kmin("orders", "o_orderkey"), kmax("orders", "o_orderkey")
    pk1, sk1 = kmin("part", "p_partkey"), kmin("supplier", "s_suppkey")
    cmin = kmin("customer", "c_custkey")

    epoch = _ts("1970-01-01T00:00:00")
    y2038 = _ts("2038-01-19T03:14:07")
    pre70 = _ts("1969-12-31T23:59:59.123456")

    _append(SF_BASE, d, "lineitem", [
        # all-zero measures on an existing order, epoch shipdate
        dict(l_orderkey=ok1, l_partkey=pk1, l_suppkey=sk1, l_linenumber=901,
             l_quantity=0.0, l_extendedprice=0.0, l_discount=0.0, l_tax=0.0,
             l_returnflag="N", l_linestatus="O", l_shipdate=epoch),
        # negative price (credit line), 2038 int32-seconds boundary
        dict(l_orderkey=ok1, l_partkey=pk1, l_suppkey=sk1, l_linenumber=902,
             l_quantity=1.0, l_extendedprice=-1234.56, l_discount=0.0,
             l_tax=0.08, l_returnflag="R", l_linestatus="F",
             l_shipdate=y2038),
        # 100% discount (revenue exactly zero), leap day
        dict(l_orderkey=ok2, l_partkey=pk1, l_suppkey=sk1, l_linenumber=901,
             l_quantity=50.0, l_extendedprice=9999.99, l_discount=1.0,
             l_tax=0.0, l_returnflag="A", l_linestatus="F",
             l_shipdate=_ts("2000-02-29T12:00:00")),
        # NULL part/supp keys + NULL shipdate, half-way .5 quantity
        dict(l_orderkey=ok2, l_partkey=None, l_suppkey=None,
             l_linenumber=902, l_quantity=2.5, l_extendedprice=100.0,
             l_discount=0.05, l_tax=0.02, l_returnflag="N",
             l_linestatus="O", l_shipdate=None),
        # orphan line (no parent order), pre-1970 negative-epoch ts
        dict(l_orderkey=omax + 2, l_partkey=pk1, l_suppkey=sk1,
             l_linenumber=1, l_quantity=12.0, l_extendedprice=300.0,
             l_discount=0.04, l_tax=0.01, l_returnflag="N",
             l_linestatus="O", l_shipdate=pre70),
        # lines under the customer-less (NULL o_custkey) order below:
        # lineitem→orders→customer paths must treat the NULL FK as
        # join-dropping, and GROUP BY o_custkey rewrites must not
        # collapse NULL custs into a real group (r11: q624's
        # collect_set form would have); two lines with two brands so
        # a NULL-cust "customer" would emit a spurious brand pair
        dict(l_orderkey=omax + 3, l_partkey=pk1, l_suppkey=sk1,
             l_linenumber=1, l_quantity=1.0, l_extendedprice=50.0,
             l_discount=0.0, l_tax=0.0, l_returnflag="N",
             l_linestatus="O", l_shipdate=_ts("1997-06-01T00:00:00")),
        dict(l_orderkey=omax + 3, l_partkey=pmax + 1, l_suppkey=sk1,
             l_linenumber=2, l_quantity=2.0, l_extendedprice=60.0,
             l_discount=0.1, l_tax=0.01, l_returnflag="A",
             l_linestatus="F", l_shipdate=_ts("1997-06-02T00:00:00")),
    ])
    _append(SF_BASE, d, "orders", [
        # zero totalprice, epoch orderdate, no lineitems, NULL-bal cust
        dict(o_orderkey=omax + 1, o_custkey=cmax + 1, o_orderstatus="F",
             o_totalprice=0.0, o_orderdate=epoch,
             o_orderpriority="1-URGENT"),
        # customer-less order (NULL FK), negative totalprice
        dict(o_orderkey=omax + 3, o_custkey=None, o_orderstatus="O",
             o_totalprice=-500.0, o_orderdate=y2038,
             o_orderpriority="5-LOW"),
        # NULL totalprice on a valid customer
        dict(o_orderkey=omax + 4, o_custkey=cmin, o_orderstatus="P",
             o_totalprice=None, o_orderdate=_ts("1992-01-01T00:00:00"),
             o_orderpriority="3-MEDIUM"),
    ])
    _append(SF_BASE, d, "customer", [
        dict(c_custkey=cmax + 1, c_name="Customer#degen1", c_nationkey=0,
             c_acctbal=None, c_mktsegment="BUILDING"),
        dict(c_custkey=cmax + 2, c_name="Customer#degen2", c_nationkey=None,
             c_acctbal=0.0, c_mktsegment=None),
        dict(c_custkey=cmax + 3, c_name="", c_nationkey=3,
             c_acctbal=-999.99, c_mktsegment="MACHINERY"),
    ])
    _append(SF_BASE, d, "supplier", [
        dict(s_suppkey=smax + 1, s_name="Supplier#degen1", s_nationkey=None,
             s_acctbal=None),
        dict(s_suppkey=smax + 2, s_name="", s_nationkey=0,
             s_acctbal=-99999.99),
    ])
    _append(SF_BASE, d, "part", [
        dict(p_partkey=pmax + 1, p_name="", p_brand="Brand#00", p_type="",
             p_size=0, p_retailprice=0.0),
        dict(p_partkey=pmax + 2, p_name="degenerate zero part",
             p_brand="Brand#55", p_type="STANDARD ANODIZED TIN",
             p_size=None, p_retailprice=None),
    ])
    for t in TABLES:
        if not os.path.exists(f"{d}/{t}.parquet"):
            os.symlink(f"{SF_BASE}/{t}.parquet", f"{d}/{t}.parquet")
    return d


_RELATIONAL = r"\b(lineitem|orders|customer|supplier|part)\b"


def _relational_touching_paired():
    names = []
    for name, query in sorted(q.registry().items()):
        if query.oracle is None:
            continue
        texts = (getattr(query, "engine_sql", None) or "") + query.oracle
        if query.builder is None and re.search(_RELATIONAL, texts):
            names.append(name)
        elif query.builder is not None and re.search(_RELATIONAL,
                                                     query.oracle):
            names.append(name)
    return names


REL_QUERIES = _relational_touching_paired()


def test_fixture_covers_the_family():
    # the relational family is the registry's largest; if this
    # collapses, the fixture silently stops guarding anything
    assert len(REL_QUERIES) >= 300, len(REL_QUERIES)


@pytest.mark.parametrize("name", REL_QUERIES)
def test_relational_query_on_degenerate_rows(spark, degenerate_sf_dir,
                                             name):
    query = q.registry()[name]
    problems = compare_query(spark, degenerate_sf_dir, query)
    # both-empty is fine HERE (the appended rows can empty a guarded
    # subset): the check is "no throw, no phantom rows, engine ==
    # oracle", not "non-trivial"
    problems = [p for p in problems if "empty result on both sides"
                not in p]
    assert not problems, f"{name}: " + "; ".join(problems)
