"""Scale-safe replacements for unpartitioned (global) window functions.

``OVER (ORDER BY ...)`` with no PARTITION BY funnels the whole input
through ONE task (Spark plans ``Exchange SinglePartition`` + a
single-partition sort) — correct, and fine at sf0.1, but a 100 TB
non-starter. The five declared registry queries that use the shape
(q149 decile stats, q243 token-budget prefix, q288 RFM quintiles,
q313 quantile normalization, q343 cumulative gains) keep their oracle
texts; THESE operators are the scale tier that computes the identical
result with no unpartitioned window anywhere in the plan:

1. **Range-bucket** rows by the leading sort key: cutoffs from one
   ``approx_percentile`` aggregate (map-side partial, collected as a
   tiny boundary list — balance, not correctness, depends on them),
   assignment is a codegen'd count-of-boundaries-below expression.
   Rows that tie on the boundary value all land in one bucket, so the
   composite sort order is preserved ACROSS buckets by construction.
2. **Partition-local pass**: row_number / running-sum over
   ``Window.partitionBy(bucket)`` — an ordinary hash-partitioned
   window, every task sorts only its bucket.
3. **Offsets**: per-bucket counts/sums (one tiny groupBy, ≤ `buckets`
   rows) are COLLECTED (bounded by the `buckets` parameter, not the
   data) and folded into prefix offsets driver-side, then applied as a
   literal-map lookup: ``global = local + offset[bucket]``. No global
   window, no extra join anywhere in the operator's plan.

Exact NTILE(n) then follows from the exact global rank by integer
arithmetic (first ``cnt % n`` tiles get ``cnt div n + 1`` rows).

Cost model: the input subtree is evaluated 3× (boundary aggregate,
offset aggregate, final pass) — with parquet column pruning those are
cheap parallel scans, the right trade against a single-task sort of
everything. ``.cache()`` the input first if it is expensive to
recompute. Leading sort key must be non-null (true of every declared
consumer); heavy ties on the leading key concentrate in one bucket —
add a higher-resolution leading expression (e.g. the hex prefix as an
integer) via ``bucket_by`` if that matters.

Equivalence with the declared oracle texts is pinned in
tests/test_scale_windows.py; the no-unpartitioned-Window plan property
in the same file.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

# (column name or Column expression, "asc" | "desc")
OrderSpec = Sequence[Tuple[str, str]]


def _ordering(order: OrderSpec) -> list[Column]:
    cols = []
    for name, direction in order:
        c = F.col(name) if isinstance(name, str) else name
        cols.append(c.desc() if direction == "desc" else c.asc())
    return cols


def _bucket_col(df: DataFrame, order: OrderSpec, buckets: int,
                bucket_by: Optional[Column]) -> Column:
    """Range-bucket id (0..buckets-1) aligned with the sort order:
    every row of bucket i sorts before every row of bucket i+1."""
    lead_name, lead_dir = order[0]
    lead = bucket_by if bucket_by is not None else (
        F.col(lead_name) if isinstance(lead_name, str) else lead_name)
    qs = [i / buckets for i in range(1, buckets)]
    row = df.select(
        F.percentile_approx(lead, F.lit(qs).cast("array<double>"),
                            F.lit(10000)).alias("b")
    ).collect()[0]
    bnds = sorted(set(row.b or []))
    if not bnds:
        return F.lit(0)
    arr = F.array(*[F.lit(b) for b in bnds])
    below = F.size(F.filter(arr, lambda b: b < lead))
    if lead_dir == "desc":
        # descending order: highest values must form bucket 0
        below = F.lit(len(bnds)) - below
    return below


def _tag_local(df: DataFrame, bucket: Column, order: OrderSpec,
               value: Optional[Column]) -> DataFrame:
    """Attach `_sw_b` (bucket), `_sw_local` (bucket-local row_number)
    and — when `value` is given — `_sw_lsum` (bucket-local running
    sum): ONE hash-partitioned window pass, each task sorts only its
    bucket."""
    tagged = df.withColumn("_sw_b", bucket)
    if value is not None:
        tagged = tagged.withColumn("_sw_v", value.cast("double"))
    w = Window.partitionBy("_sw_b").orderBy(*_ordering(order))
    tagged = tagged.withColumn("_sw_local", F.row_number().over(w))
    if value is not None:
        tagged = tagged.withColumn(
            "_sw_lsum",
            F.sum("_sw_v").over(w.rowsBetween(Window.unboundedPreceding,
                                              Window.currentRow)))
    return tagged


def _offsets(tagged: DataFrame, with_sum: bool):
    """Collect per-bucket counts (and sums) — a ≤ `buckets`-row
    aggregate, bounded by the parameter not the data — and fold prefix
    offsets driver-side. Returns (count_offsets, sum_offsets, total)."""
    aggs = [F.count(F.lit(1)).alias("n")]
    if with_sum:
        aggs.append(F.sum("_sw_v").alias("s"))
    rows = sorted(tagged.groupBy("_sw_b").agg(*aggs).collect(),
                  key=lambda r: r._sw_b)
    n_off: dict[int, int] = {}
    s_off: dict[int, float] = {}
    cum_n, cum_s = 0, 0.0
    for r in rows:
        n_off[r._sw_b] = cum_n
        cum_n += r.n
        if with_sum:
            s_off[r._sw_b] = cum_s
            cum_s += r.s or 0.0
    return n_off, s_off, cum_n


def _lookup(mapping: dict, dtype: str, default) -> Column:
    if not mapping:
        return F.lit(default).cast(dtype)
    pairs: list[Column] = []
    for k, v in mapping.items():
        pairs += [F.lit(k), F.lit(v).cast(dtype)]
    return F.coalesce(F.element_at(F.create_map(*pairs), F.col("_sw_b")),
                      F.lit(default).cast(dtype))


def with_global_rank(df: DataFrame, order: OrderSpec, *,
                     out_col: str = "global_rank",
                     buckets: int = 32,
                     bucket_by: Optional[Column] = None) -> DataFrame:
    """Exact ``ROW_NUMBER() OVER (ORDER BY <order>)`` with no
    unpartitioned window: bucketed local rank + literal-map prefix
    offsets. The composite order must be a total order (tiebreak!)."""
    bucket = _bucket_col(df, order, buckets, bucket_by)
    tagged = _tag_local(df, bucket, order, None)
    n_off, _, _ = _offsets(tagged, with_sum=False)
    return (tagged
            .withColumn(out_col,
                        (_lookup(n_off, "long", 0)
                         + F.col("_sw_local")).cast("long"))
            .drop("_sw_b", "_sw_local"))


def with_global_running_sum(df: DataFrame, order: OrderSpec, value: Column, *,
                            out_col: str = "running_sum",
                            buckets: int = 32,
                            bucket_by: Optional[Column] = None) -> DataFrame:
    """Exact ``SUM(value) OVER (ORDER BY <order> ROWS UNBOUNDED
    PRECEDING)``: bucket-local prefix sums + literal-map sum offsets."""
    bucket = _bucket_col(df, order, buckets, bucket_by)
    tagged = _tag_local(df, bucket, order, value)
    _, s_off, _ = _offsets(tagged, with_sum=True)
    return (tagged
            .withColumn(out_col, _lookup(s_off, "double", 0.0)
                        + F.col("_sw_lsum"))
            .drop("_sw_b", "_sw_v", "_sw_local", "_sw_lsum"))


def with_global_rank_and_running_sum(
        df: DataFrame, order: OrderSpec, value: Column, *,
        rank_col: str = "global_rank", sum_col: str = "running_sum",
        buckets: int = 32,
        bucket_by: Optional[Column] = None) -> DataFrame:
    """Exact global ROW_NUMBER AND running SUM(value) over the same
    ORDER BY in ONE bucketed window pass + one offsets collect —
    for rank-curve shapes (vocab coverage, Lorenz/gains curves) that
    need both, without paying the input subtree twice."""
    bucket = _bucket_col(df, order, buckets, bucket_by)
    tagged = _tag_local(df, bucket, order, value)
    n_off, s_off, _ = _offsets(tagged, with_sum=True)
    return (tagged
            .withColumn(rank_col,
                        (_lookup(n_off, "long", 0)
                         + F.col("_sw_local")).cast("long"))
            .withColumn(sum_col, _lookup(s_off, "double", 0.0)
                        + F.col("_sw_lsum"))
            .drop("_sw_b", "_sw_v", "_sw_local", "_sw_lsum"))


def with_global_ntile(df: DataFrame, order: OrderSpec, n: int, *,
                      out_col: str = "ntile",
                      buckets: int = 32,
                      bucket_by: Optional[Column] = None) -> DataFrame:
    """Exact ``NTILE(n) OVER (ORDER BY <order>)`` from the exact global
    rank: the first ``cnt % n`` tiles hold ``cnt div n + 1`` rows, the
    rest ``cnt div n`` (the SQL-standard split)."""
    bucket = _bucket_col(df, order, buckets, bucket_by)
    tagged = _tag_local(df, bucket, order, None)
    n_off, _, cnt = _offsets(tagged, with_sum=False)
    rk = _lookup(n_off, "long", 0) + F.col("_sw_local")
    q, r = divmod(cnt, n)
    if q == 0:
        tile = rk  # cnt < n: one row per tile
    else:
        big = r * (q + 1)  # rows living in the larger leading tiles
        tile = (F.when(rk <= big, ((rk - 1) / (q + 1)).cast("long") + 1)
                .otherwise(r + ((rk - big - 1) / q).cast("long") + 1))
    return (tagged.withColumn(out_col, tile.cast("long"))
            .drop("_sw_b", "_sw_local"))


def _group_key(groups: Sequence[str], with_bucket: bool) -> Column:
    """String composite key for the literal-map lookups: group values
    (cast to string) + optionally the bucket id, unit-separator joined.
    concat_ws skips NULLs, so a NULL group value would collide with the
    absent-column spelling — the operator contract requires non-null
    group keys (true of every declared consumer)."""
    parts = [F.col(g).cast("string") for g in groups]
    if with_bucket:
        parts.append(F.col("_sw_b").cast("string"))
    return F.concat_ws("\x1f", *parts)


def _str_lookup(mapping: dict, key: Column, dtype: str, default) -> Column:
    if not mapping:
        return F.lit(default).cast(dtype)
    pairs: list[Column] = []
    for k, v in mapping.items():
        pairs += [F.lit(k), F.lit(v).cast(dtype)]
    return F.coalesce(F.element_at(F.create_map(*pairs), key),
                      F.lit(default).cast(dtype))


def with_grouped_ranks(df: DataFrame, groups: Sequence[str], order: OrderSpec,
                       *, row_number_col: Optional[str] = None,
                       rank_col: Optional[str] = None,
                       dense_rank_col: Optional[str] = None,
                       ntile: Optional[Tuple[int, str]] = None,
                       buckets: int = 32,
                       bucket_by: Optional[Column] = None) -> DataFrame:
    """Exact ROW_NUMBER / RANK / DENSE_RANK / NTILE over
    ``PARTITION BY <groups> ORDER BY <order>`` when the group key is
    LOW-CARDINALITY (the q21 shape: 3 distinct l_returnflag values →
    three single-task sorts of a third of the fact table each at any
    scale). Same two-phase trick as the global tier, keyed by
    (group, range-bucket):

    - one GLOBAL boundary aggregate on the leading order expression
      range-buckets every group's rows simultaneously (cell (g, b) is a
      subset of bucket b, so cells stay ≈ n/buckets regardless of how
      skewed the groups are);
    - one window pass partitioned by (groups..., bucket) computes
      bucket-local row_number / rank / dense_rank — every task sorts
      only a cell;
    - a ≤ groups×buckets-row aggregate is collected and folded into
      per-(group, bucket) prefix offsets driver-side (count offsets for
      row_number/rank, distinct-tuple offsets = max local dense_rank for
      dense_rank), applied as literal-map lookups.

    Order-tuple ties never span buckets (equal tuples share the leading
    value, and bucket id is a function of the leading value), so
    ``local + prefix-offset`` is exact for all three rank flavors.
    NTILE(n) follows from the exact per-group row_number and the group
    totals by the SQL-standard first-``cnt%n``-tiles-are-bigger split.

    ``ntile`` is ``(n, out_col)``. The collected offset relation is
    bounded by ``len(groups-domain) × buckets`` — this operator is for
    few-valued group keys; for high-cardinality groups an ordinary
    partitioned window is already scale-correct and should be used
    instead. Leading order expression must be non-null.
    """
    bucket = _bucket_col(df, order, buckets, bucket_by)
    # The composite group key is rendered ONCE, Spark-side (_sw_g), and
    # that exact string travels through the boundary aggregate to the
    # driver — Python str() re-derivation would disagree with Spark's
    # CAST(… AS STRING) for booleans (True vs true) and some float
    # formats, silently falling back to offset 0.
    pre = (df.withColumn("_sw_b", bucket)
           .withColumn("_sw_g", _group_key(groups, with_bucket=False)))
    w = Window.partitionBy(*groups, "_sw_b").orderBy(*_ordering(order))
    tagged = pre.withColumn("_sw_rn", F.row_number().over(w))
    need_rank = rank_col is not None
    need_dense = dense_rank_col is not None
    if need_rank:
        tagged = tagged.withColumn("_sw_rk", F.rank().over(w))
    if need_dense:
        tagged = tagged.withColumn("_sw_drk", F.dense_rank().over(w))

    # Offsets: the rank offsets need per-cell counts (computable from
    # the pre-window frame), but the dense-rank offset needs the max
    # local dense_rank per cell — a window-output quantity. Actions
    # don't share exchanges, so aggregating the lazy window frame
    # would pay the full shuffle+sort a second time (and a distinct
    # order-tuple count over the pre-window frame costs even more than
    # the window itself). Instead the window output is persisted ONCE
    # (memory-and-disk local checkpoint — the persist-once/read-twice
    # trade a cluster job would make): the offsets aggregate is then a
    # cheap cached scan and the returned frame reads the same blocks.
    aggs = [F.count(F.lit(1)).alias("n")]
    if need_dense:
        # Rank offsets need only per-cell counts, but the dense-rank
        # offset (max local dense_rank per cell) is a window-output
        # quantity, and actions don't share exchanges — aggregating
        # the lazy frame would pay the 60 M-row shuffle+sort twice.
        # Persist the window output once (compressed columnar cache,
        # spills to disk under pressure): the offsets aggregate is
        # then a column-pruned cache scan and the returned frame reads
        # the same blocks. At sf10 this is ~3× the lazy double-pass.
        # Cache substitution hides the Window node from downstream
        # plan inspection, so the no-few-task-sort property is
        # enforced HERE, on the lazy frame, on every call.
        from pyspark import StorageLevel
        assert_no_low_cardinality_window(tagged)
        tagged = tagged.persist(StorageLevel.MEMORY_AND_DISK)
        aggs.append(F.max("_sw_drk").alias("d"))
        rows = tagged.groupBy("_sw_g", "_sw_b").agg(*aggs).collect()
    else:
        rows = pre.groupBy("_sw_g", "_sw_b").agg(*aggs).collect()
    sep = "\x1f"
    by_group: dict[str, list] = {}
    for r in rows:
        by_group.setdefault(r._sw_g, []).append(r)
    n_off: dict[str, int] = {}
    d_off: dict[str, int] = {}
    g_cnt: dict[str, int] = {}
    for gk, cells in by_group.items():
        cum_n = cum_d = 0
        for r in sorted(cells, key=lambda row: row._sw_b):
            # bucket ids are Spark ints: str() and CAST agree on those
            key = gk + sep + str(r._sw_b)
            n_off[key] = cum_n
            cum_n += r.n
            if need_dense:
                d_off[key] = cum_d
                cum_d += r.d
        g_cnt[gk] = cum_n

    cell_key = F.concat_ws(sep, F.col("_sw_g"),
                           F.col("_sw_b").cast("string"))
    out = tagged
    base = _str_lookup(n_off, cell_key, "long", 0)
    grn = (base + F.col("_sw_rn")).cast("long")
    if row_number_col is not None:
        out = out.withColumn(row_number_col, grn)
    if need_rank:
        out = out.withColumn(rank_col,
                             (base + F.col("_sw_rk")).cast("long"))
    if need_dense:
        out = out.withColumn(
            dense_rank_col,
            (_str_lookup(d_off, cell_key, "long", 0)
             + F.col("_sw_drk")).cast("long"))
    if ntile is not None:
        n_tiles, tile_col = ntile
        cnt = _str_lookup(g_cnt, F.col("_sw_g"), "long", 0)
        q = F.floor(cnt / n_tiles)
        r = cnt % n_tiles
        big = r * (q + 1)
        tile = (F.when(q == 0, grn)
                .when(grn <= big, F.floor((grn - 1) / (q + 1)) + 1)
                .otherwise(r + F.floor((grn - big - 1) / q) + 1))
        out = out.withColumn(tile_col, tile.cast("long"))
    drop = [c for c in ("_sw_b", "_sw_g", "_sw_rn", "_sw_rk", "_sw_drk")
            if c in out.columns]
    return out.drop(*drop)


def assert_no_low_cardinality_window(df: DataFrame) -> None:
    """Raise if the OPTIMIZED plan has a Window whose partitionSpec
    does NOT include the range-bucket column `_sw_b` — i.e. a window
    keyed only by the (low-cardinality) group columns, the few-task
    sort shape `with_grouped_ranks` exists to avoid."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    for raw in plan.splitlines():
        line = raw.strip().lstrip("+-: ").strip()
        if line.startswith("Window ") and "windowspecdefinition(" in line:
            groups = _top_level_groups(line[len("Window "):])
            part = groups[1] if len(groups) >= 3 else ""
            if "_sw_b" not in part:
                raise AssertionError(
                    "window not bucket-partitioned in plan:\n" + raw)


def q21_scale(spark, sf_dir: str) -> DataFrame:
    """Scale tier of q21 (ranking windows over the 3-value
    l_returnflag partition): identical output, no window partitioned
    by fewer than (group, bucket) keys anywhere in the plan."""
    from shredder_spark.catalog import load_table
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice")
    r = with_grouped_ranks(
        li, ["l_returnflag"],
        [("l_extendedprice", "desc"), ("l_orderkey", "asc"),
         ("l_linenumber", "asc")],
        row_number_col="rn", rank_col="rk", dense_rank_col="drk",
        ntile=(4, "nt"))
    return (r.select("l_orderkey", "l_linenumber", "rn", "rk", "drk", "nt")
            .orderBy("l_orderkey", "l_linenumber"))


def _top_level_groups(s: str) -> list[str]:
    """Top-level ``[...]`` group contents of a plan node's argument
    list (nested brackets/parens stay inside their group)."""
    depth = 0
    groups: list[str] = []
    buf: list[str] = []
    for ch in s:
        if ch in "[(":
            if ch == "[" and depth == 0:
                buf = []
                depth += 1
                continue
            depth += 1
        elif ch in "])":
            depth -= 1
            if ch == "]" and depth == 0:
                groups.append("".join(buf))
                continue
        if depth > 0:
            buf.append(ch)
    return groups


def assert_no_unpartitioned_window(df: DataFrame) -> None:
    """Raise if the OPTIMIZED plan contains a Window node that orders
    without partitioning — the single-task shape this module exists to
    avoid. A Window node prints [functions], [partitionSpec],
    [orderSpec] — the partition group is omitted when empty, so two
    groups whose trailer is an ORDERING spec (ASC/DESC markers) is the
    global-sort shape; two groups with a plain attribute trailer is a
    partition-only window (fine). Used by tests and available as a
    production guard."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    for raw in plan.splitlines():
        line = raw.strip().lstrip("+-: ").strip()
        if line.startswith("Window ") and "windowspecdefinition(" in line:
            groups = _top_level_groups(line[len("Window "):])
            if len(groups) >= 3:
                continue  # functions, partition, order — partitioned
            trailer = groups[-1] if len(groups) >= 2 else ""
            if " ASC" in trailer or " DESC" in trailer:
                raise AssertionError("unpartitioned window in plan:\n" + raw)


# ----------------------------------------------------------------------
# Scale tiers of the five declared global-window queries. Each computes
# the IDENTICAL result to its registry oracle text (pinned in
# tests/test_scale_windows.py) with no unpartitioned Window anywhere in
# the plan — the form you would run at 100 TB. The registry texts stay
# as the declared/oracle surface; these are the production-shape
# equivalents.

def q149_scale(spark, sf_dir: str) -> DataFrame:
    """Decile stats over order prices (q149) without the global NTILE."""
    from shredder_spark.catalog import load_table
    orders = load_table(spark, sf_dir, "orders")
    d = with_global_ntile(
        orders.select("o_totalprice", "o_orderkey"),
        [("o_totalprice", "asc"), ("o_orderkey", "asc")], 10, out_col="dec")
    return (d.groupBy("dec")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.round(F.min("o_totalprice"), 2).alias("lo"),
                 F.round(F.max("o_totalprice"), 2).alias("hi"),
                 F.round(F.avg("o_totalprice"), 2).alias("av"))
            .orderBy("dec"))


def q243_scale(spark, sf_dir: str) -> DataFrame:
    """Token-budget prefix (q243) without the global running-sum window.
    The hash sort key is a fixed-width hex string, so its lexicographic
    order equals the numeric order of its integer value — that integer
    is the bucketing proxy (``bucket_by``)."""
    from shredder_spark.catalog import load_table
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "),
                                               F.lit(""))) + 1)
        .alias("n_tok"),
        F.substring(F.md5(F.concat(F.col("doc_id").cast("string"),
                                   F.lit("-order"))), 1, 8).alias("h"))
    run = with_global_running_sum(
        sized, [("h", "asc"), ("doc_id", "asc")], F.col("n_tok"),
        out_col="cum", bucket_by=F.conv(F.col("h"), 16, 10).cast("long"))
    return (run.filter(F.col("cum") <= 5000)
            .select("doc_id", F.col("n_tok").cast("long").alias("n_tok"),
                    F.col("cum").cast("long").alias("cum_tokens"))
            .orderBy("doc_id"))


def q288_scale(spark, sf_dir: str) -> DataFrame:
    """RFM quintiles (q288) without the three global NTILE windows."""
    from shredder_spark.catalog import load_table
    orders = load_table(spark, sf_dir, "orders")
    base = (orders.groupBy("o_custkey")
            .agg(F.max("o_orderdate").alias("last_o"),
                 F.count(F.lit(1)).cast("double").alias("f"),
                 F.sum(F.col("o_totalprice").cast("double")).alias("m")))
    d0 = base.agg(F.max("last_o").alias("d0")).collect()[0].d0
    r = base.withColumn(
        "rec", F.datediff(F.lit(d0).cast("date"),
                          F.col("last_o").cast("date")).cast("double"))
    r = with_global_ntile(r, [("rec", "desc"), ("o_custkey", "asc")], 5,
                          out_col="r_q")
    r = with_global_ntile(r, [("f", "asc"), ("o_custkey", "asc")], 5,
                          out_col="f_q")
    r = with_global_ntile(r, [("m", "asc"), ("o_custkey", "asc")], 5,
                          out_col="m_q")
    return r.select("o_custkey", "r_q", "f_q", "m_q").orderBy("o_custkey")


def q313_scale(spark, sf_dir: str) -> DataFrame:
    """Quantile normalization (q313): the global ROW_NUMBER that indexes
    the reference distribution becomes a two-phase global rank; the
    per-language windows were already partitioned and stay as they are."""
    from shredder_spark.catalog import load_table
    docs = load_table(spark, sf_dir, "documents")
    v = docs.select("doc_id", "lang", F.col("n_chars").cast("long").alias("x"))
    g = (with_global_rank(v, [("x", "asc"), ("doc_id", "asc")],
                          out_col="grn")
         .select(F.col("x").alias("gx"), "grn"))
    n = v.count()
    wl = Window.partitionBy("lang").orderBy("x", "doc_id")
    l = (v.withColumn("lrn", F.row_number().over(wl))
         .withColumn("ln", F.count(F.lit(1)).over(Window.partitionBy("lang"))))
    target = F.when(F.col("ln") == 1, F.lit(1)).otherwise(
        F.round((F.col("lrn") - 1.0) * (n - 1) / (F.col("ln") - 1))
        .cast("long") + 1)
    return (l.withColumn("_tgt", target)
            .join(g, F.col("_tgt") == g.grn)
            .select("doc_id", "lang", "x", F.col("gx").alias("x_norm"))
            .orderBy("doc_id"))


def q343_scale(spark, sf_dir: str) -> DataFrame:
    """Cumulative gains (q343): the global NTILE over scored rows
    becomes the two-phase tier; the 10-row per-decile cumulative sum is
    folded driver-side (the decile relation is bounded by construction,
    but this keeps the plan free of ANY unpartitioned window)."""
    from shredder_spark.catalog import load_table
    orders = load_table(spark, sf_dir, "orders")
    s = orders.select(
        "o_orderkey",
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 4),
               16, 10).cast("long").alias("score"),
        F.when(F.col("o_totalprice") > 250000, 1).otherwise(0).alias("y"))
    r = with_global_ntile(s, [("score", "desc"), ("o_orderkey", "asc")], 10,
                          out_col="decile")
    d = sorted(r.groupBy("decile")
               .agg(F.sum("y").cast("double").alias("pos"),
                    F.count(F.lit(1)).cast("long").alias("n")).collect(),
               key=lambda row: row.decile)
    tot = sum(row.pos for row in d)
    out, cum = [], 0.0
    for row in d:
        cum += row.pos
        out.append((int(row.decile), row.n, round(cum / tot, 4)))
    return spark.createDataFrame(
        out, "decile long, n long, cum_capture double").orderBy("decile")


def exact_percentiles(df: DataFrame, value, ps: Sequence[float], *,
                      buckets: int = 32) -> list:
    """Exact ``PERCENTILE(value, p)`` (SQL interpolation semantics:
    ``pos = (n-1)·p``, linear between the floor/ceil ranks) computed
    DISTRIBUTED — no single-reduce value→count map.

    Spark's exact ``percentile`` aggregate buffers a value→count
    OpenHashMap whose size is the column's DISTINCT count, merged into
    ONE final buffer: fine for bounded domains (``l_quantity``: 50
    values), a non-starter over near-continuous columns at fact scale
    (r10 finding: ``l_extendedprice`` at sf100 = 801 s;
    ``o_totalprice`` is ~near-unique, a ~7 GB single buffer). This
    tier ranks the column with the bucketed two-phase machinery above
    (boundary aggregate → bucket-local ROW_NUMBER → literal-map
    offsets), then fetches only the ≤ 2·|ps| bracketing rows. Ties on
    the value are interchangeable for value-at-rank, so the arbitrary
    within-bucket tie order cannot change the result. Cost: ~4 scans
    of one column — parallel, spill-free, any sf.

    Returns interpolated floats positionally matching ``ps`` (None for
    an empty input)."""
    import math

    v = F.col(value) if isinstance(value, str) else value
    src = (df.select(v.cast("double").alias("_ep_v"))
           .filter(F.col("_ep_v").isNotNull()))
    n = src.count()
    if n == 0:
        return [None] * len(ps)
    need: set = set()
    for p in ps:
        pos = (n - 1) * p
        need.add(int(math.floor(pos)) + 1)
        need.add(int(math.ceil(pos)) + 1)
    ranked = with_global_rank(src, [("_ep_v", "asc")], out_col="_ep_r",
                              buckets=buckets)
    got = {row._ep_r: row._ep_v for row in
           ranked.filter(F.col("_ep_r").isin(*[int(k) for k in need]))
           .collect()}  # bounded: <= 2*len(ps) rows
    out = []
    for p in ps:
        pos = (n - 1) * p
        kl = int(math.floor(pos))
        ku = int(math.ceil(pos))
        lo = got[kl + 1]
        hi = got[ku + 1]
        # Spark's Percentile interpolates with the WEIGHTED form
        # (ceil-pos)·lo + (pos-floor)·hi, not lo + frac·(hi-lo) —
        # they differ by 1 ulp on some inputs; match it bit-for-bit
        out.append(lo if ku == kl else (ku - pos) * lo + (pos - kl) * hi)
    return out
