"""Fluent pipeline facade tests: the reference's eager ETL chain shape,
compiled lazily into one Catalyst plan (pipeline.py docstring)."""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from bangdatapipeline_spark.pipeline import Frame, Pipeline


def test_survey_style_chain(spark, sf_dir, tmp_path):
    """filter -> recode -> merge metadata -> widen: the §3.1 survey
    workflow, checked against a direct SQL equivalent."""
    p = Pipeline(spark, sf_dir)
    nations = p.table("nation").select("n_nationkey", "n_name")
    wide = (
        p.table("customer")
        .filter(F.col("c_acctbal") > 0)
        .recode(c_mktsegment=lambda c: F.lower(c))
        .merge(nations, F.col("c_nationkey") == F.col("n_nationkey"))
        .widen(index=["n_name"], key="c_mktsegment",
               values=["building", "machinery"])
    )
    got = {r.n_name: (r.building, r.machinery) for r in wide.df.collect()}
    from bangdatapipeline_spark.tables import register_views

    register_views(spark, sf_dir)
    exp = {
        r.n_name: (r.building, r.machinery)
        for r in spark.sql(
            """SELECT n_name,
                      count(CASE WHEN lower(c_mktsegment) = 'building' THEN 1 END) AS building,
                      count(CASE WHEN lower(c_mktsegment) = 'machinery' THEN 1 END) AS machinery
               FROM customer JOIN nation ON c_nationkey = n_nationkey
               WHERE c_acctbal > 0 GROUP BY n_name"""
        ).collect()
    }
    assert got == exp and got


def test_chain_compiles_to_one_plan_with_pushdown(spark, sf_dir):
    """A filter applied LAST in the chain still reaches the parquet scan —
    the wrapper adds no materialization barriers."""
    p = Pipeline(spark, sf_dir)
    f = (p.table("customer")
         .recode(c_mktsegment=lambda c: F.upper(c))
         .select("c_custkey", "c_mktsegment", "c_acctbal")
         .filter(F.col("c_acctbal") > 5000))
    plan = f.df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(c_acctbal), GreaterThan(c_acctbal,5000.0)]" in plan, plan[:2000]


def test_flatten_and_ingest_json(spark, tmp_path):
    """ingest_json -> flatten: the fetch-cache-normalize path on a nested
    batch document (rounds -> users)."""
    doc = {"batch_id": 7, "rounds": [
        {"round": 1, "users": [{"u": 1, "score": 3}, {"u": 2, "score": 5}]},
        {"round": 2, "users": [{"u": 1, "score": 4}]}]}
    src = tmp_path / "cache"
    src.mkdir()
    (src / "batch7.json").write_text(json.dumps(doc))
    p = Pipeline(spark)
    flat = (p.ingest_json(str(src))
            .flatten("rounds")
            .flatten("rounds_users", prefix="user"))
    rows = sorted((r.batch_id, r.rounds_round, r.user_u, r.user_score)
                  for r in flat.df.collect())
    assert rows == [(7, 1, 1, 3), (7, 1, 2, 5), (7, 2, 1, 4)]


def test_dedup_split_export(spark, sf_dir, tmp_path):
    """dedup (deterministic keeper) -> split -> partitioned export; split
    fractions land near 80/10/10 and the export is hive-partitioned."""
    p = Pipeline(spark, sf_dir)
    f = (p.table("documents")
         .dedup(keys=["text"], order_by=[F.col("doc_id")])
         .split("doc_id"))
    out = str(tmp_path / "docs")
    f.to_parquet(out, partition_by=["split"])
    back = spark.read.parquet(out)
    counts = {r.split: r.n for r in
              back.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = sum(counts.values())
    assert set(counts) == {"train", "val", "test"}
    assert 0.75 < counts["train"] / n < 0.85
    # deterministic keeper: re-running the chain yields identical doc_ids
    ids1 = sorted(r.doc_id for r in f.df.select("doc_id").collect())
    ids2 = sorted(r.doc_id for r in f.df.select("doc_id").collect())
    assert ids1 == ids2


def test_fillna_dropna(spark, sf_dir):
    from pyspark.sql import Row

    df = spark.createDataFrame([
        Row(a=1, b=None), Row(a=None, b="x"), Row(a=3, b="y")])
    f = Frame(df)
    assert f.fillna({"b": "?"}).df.filter(F.col("b") == "?").count() == 1
    assert f.dropna(subset=["a"]).df.count() == 2
    assert f.dropna(how="all").df.count() == 3


def test_split_boundary_fractions(spark, sf_dir):
    """frac_train + frac_val = 1.0 must leave test EMPTY and fill val with
    the full remainder (regression: a 9-hex-char cut string sorted BELOW
    8-char gates and mis-assigned ~15/16 of the val bucket to test)."""
    p = Pipeline(spark, sf_dir)
    f = p.table("documents").split("doc_id", frac_train=0.9, frac_val=0.1)
    counts = {r.split: r.n for r in
              f.df.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = sum(counts.values())
    assert counts.get("test", 0) == 0
    assert 0.85 < counts["train"] / n < 0.95
    assert counts.get("val", 0) > 0
    # all-train degenerate case
    f2 = p.table("documents").split("doc_id", frac_train=1.0, frac_val=0.0)
    c2 = {r.split: r.n for r in
          f2.df.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(c2) == {"train"}


def test_split_cut_properties():
    """Hypothesis: the md5-gate cut mapping is monotone in the fraction,
    always sorts at-or-above 8-hex gates for f>=1, and produces 8-char
    lowercase hex otherwise — the invariants the split bucketing relies
    on (no Spark needed: the cut is pure)."""
    import re

    from hypothesis import given, strategies as st

    # re-derive the cut exactly as Frame.split defines it
    def cut(f: float) -> str:
        return "g" if f >= 1.0 else format(int(f * 16**8), "08x")

    @given(st.floats(min_value=0.0, max_value=1.5, allow_nan=False),
           st.floats(min_value=0.0, max_value=1.5, allow_nan=False))
    def monotone(f1, f2):
        if f1 <= f2:
            assert cut(f1) <= cut(f2)

    @given(st.floats(min_value=0.0, max_value=0.999999, allow_nan=False))
    def wellformed(f):
        c = cut(f)
        assert re.fullmatch(r"[0-9a-f]{8}", c), c

    @given(st.text(alphabet="0123456789abcdef", min_size=8, max_size=8))
    def one_covers_all(gate):
        assert gate < cut(1.0)

    monotone()
    wellformed()
    one_covers_all()


def test_profile_verb_one_row_per_column(spark, sf_dir):
    p = Pipeline(spark, sf_dir)
    prof = p.table("orders").profile(["o_orderkey", "o_orderstatus"]).df.collect()
    by_col = {r.col_name: r for r in prof}
    assert set(by_col) == {"o_orderkey", "o_orderstatus"}
    o = p.table("orders").df
    assert by_col["o_orderkey"].n_rows == o.count()
    assert by_col["o_orderkey"].n_nulls == 0
    assert by_col["o_orderstatus"].n_distinct == o.select("o_orderstatus").distinct().count()


def test_profile_verb_hostile_names_and_map_rejection(spark, sf_dir):
    """Column names with backticks/quotes/dots must profile cleanly (the
    unpivot is built from typed expressions, not SQL text), and map-typed
    columns fail fast with a clear error."""
    import pytest

    p = Pipeline(spark, sf_dir)
    hostile = "o`weird '.col"
    f = Frame(
        p.table("orders").df.select(
            F.col("o_orderkey").alias(hostile),
            F.create_map(F.lit("k"), F.col("o_custkey")).alias("m"),
        )
    )
    prof = {r.col_name: r for r in f.profile([hostile]).df.collect()}
    assert set(prof) == {hostile}
    assert prof[hostile].n_nulls == 0
    with pytest.raises(ValueError, match="map-typed"):
        f.profile(["m"])
    with pytest.raises(ValueError, match="unknown columns"):
        f.profile(["nope"])


def test_upsert_verb_partition_replace(spark, sf_dir, tmp_path):
    p = Pipeline(spark, sf_dir)
    out = str(tmp_path / "up")
    f = p.table("documents").derive(ln=F.col("lang"))
    f.to_parquet_upsert(out, ["ln"])
    n_en = spark.read.parquet(out).filter("ln = 'en'").count()
    # backfill ONLY 'en' with a subset; other langs stay
    Frame(f.df.filter("ln = 'en'").limit(5)).to_parquet_upsert(out, ["ln"])
    got = spark.read.parquet(out)
    assert got.filter("ln = 'en'").count() == 5 != n_en
    assert got.filter("ln = 'de'").count() > 0


def test_value_counts_melt_describe_verbs(spark, sf_dir):
    """pandas-parity verbs: value_counts matches a plain groupBy (with
    normalized fractions summing to 1), melt round-trips shape, describe
    gives one row per numeric column with consistent stats."""
    p = Pipeline(spark, sf_dir)
    o = p.table("orders")

    vc = o.value_counts("o_orderstatus", normalize=True).df.collect()
    total = o.df.count()
    assert sum(r["count"] for r in vc) == total
    assert abs(sum(r.frac for r in vc) - 1.0) < 1e-4
    assert vc == sorted(vc, key=lambda r: (-r["count"], r.o_orderstatus))

    m = o.select("o_orderkey", "o_totalprice").melt(
        ["o_orderkey"], ["o_totalprice"], "var", "val"
    ).df
    assert m.columns == ["o_orderkey", "var", "val"]
    assert m.count() == total

    d = {r.col_name: r for r in o.describe(["o_totalprice", "o_custkey"]).df.collect()}
    assert set(d) == {"o_totalprice", "o_custkey"}
    assert d["o_totalprice"]["count"] == total
    assert d["o_totalprice"].min <= d["o_totalprice"].mean <= d["o_totalprice"].max
    import pytest

    with pytest.raises(ValueError, match="non-numeric"):
        o.describe(["o_orderstatus"])


def test_zorder_write_tightens_per_file_stats(spark, sf_dir, tmp_path):
    """Files written by to_parquet_zorder must carry tight per-file
    bounding boxes on BOTH clustered dimensions (that is the entire point
    of the layout: either-column predicates prune most files).

    Threshold rationale: the writer's cut points are EXACT equal-frequency
    z boundaries (full z histogram, not repartitionByRange's
    session-seeded reservoir sample — the r9 flake), so 8 files each hold
    a contiguous 1/8 z-run. A contiguous 1/8 slice of a 2^16 z curve
    spans at most 2 aligned z-quads of 8192 codes; each 8192-code quad is
    a 128x64 x/y rectangle, so the worst-case per-file bbox is
    ~2*(128*64) = 16384 = 65536/4, with typical files far tighter. The
    assert is the worst-case bound of the deterministic layout, not a
    statistical hope — which is also why the layout must be deterministic
    for this bound to be testable at all."""
    out = str(tmp_path / "zorders")
    p = Pipeline(spark, sf_dir)
    f = p.table("orders")
    x = F.col("o_custkey") % 256
    y = F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")) % 256
    f.to_parquet_zorder(out, x, y, n_files=8)

    back = spark.read.parquet(out)
    assert back.count() == f.df.count()
    per_file = (
        back.select(
            F.input_file_name().alias("file"),
            (F.col("o_custkey") % 256).alias("x"),
            (
                F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
                % 256
            ).alias("y"),
        )
        .groupBy("file")
        .agg(
            (
                (F.max("x") - F.min("x") + 1) * (F.max("y") - F.min("y") + 1)
            ).alias("bbox")
        )
        .collect()
    )
    assert len(per_file) >= 4  # the exact cut points actually split the data
    mean_bbox = sum(r.bbox for r in per_file) / len(per_file)
    # whole domain is 256*256 = 65536; see docstring for the 1/4 bound
    assert mean_bbox < 65536 / 4, [r.bbox for r in per_file]

    # Determinism: a second write of the same data must produce the exact
    # same per-file z-runs (the r9 flake was sampled, session-dependent
    # cut points — this pins the fix).
    out2 = str(tmp_path / "zorders2")
    f.to_parquet_zorder(out2, x, y, n_files=8)
    def _sizes(path):
        return sorted(
            r["n"]
            for r in spark.read.parquet(path)
            .groupBy(F.input_file_name())
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    assert _sizes(out) == _sizes(out2)


def test_bloom_semi_verb_no_false_negatives(spark, sf_dir):
    """bloom_semi keeps every true match (no false negatives) and its
    output is a superset of the exact semi-join bounded by the input."""
    from bangdatapipeline_spark.pipeline import Frame
    from bangdatapipeline_spark.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    dim = load_table(spark, sf_dir, "customer").filter(
        F.col("c_acctbal") > 9000
    ).select("c_custkey")
    gated = Frame(orders).bloom_semi(dim, on="o_custkey", dim_key="c_custkey").df
    exact = orders.join(dim, orders.o_custkey == dim.c_custkey, "left_semi")
    n_orders, n_gated, n_exact = orders.count(), gated.count(), exact.count()
    assert n_exact <= n_gated <= n_orders
    # soundness: gate(exact) == exact
    assert gated.join(
        dim, gated.o_custkey == dim.c_custkey, "left_semi"
    ).count() == n_exact


def test_merge_state_verb_equals_full_recompute(spark, sf_dir):
    """merge_state on two half-states reproduces the one-pass aggregate."""
    from bangdatapipeline_spark.pipeline import Frame
    from bangdatapipeline_spark.tables import load_table

    orders = load_table(spark, sf_dir, "orders")

    def st(df):
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_orderdate").alias("lo"),
            F.max("o_orderdate").alias("hi"),
        )

    half_a = st(orders.filter(F.col("o_orderkey") % 2 == 0))
    half_b = st(orders.filter(F.col("o_orderkey") % 2 == 1))
    got = {
        r.o_orderpriority: (r.n, r.lo, r.hi)
        for r in Frame(half_a)
        .merge_state(half_b, keys=["o_orderpriority"], sums=["n"], mins=["lo"], maxs=["hi"])
        .df.collect()
    }
    want = {r.o_orderpriority: (r.n, r.lo, r.hi) for r in st(orders).collect()}
    assert got == want


def test_median_verb_matches_sorted_truth(spark, sf_dir):
    """Frame.median reproduces the interpolated median a full sort gives."""
    from bangdatapipeline_spark.pipeline import Frame
    from bangdatapipeline_spark.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    got = {
        r.o_orderpriority: (r.n, r.median)
        for r in Frame(orders)
        .median("o_totalprice", by="o_orderpriority")
        .df.collect()
    }
    cents = {}
    for r in orders.select(
        "o_orderpriority", F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("c")
    ).collect():
        cents.setdefault(r.o_orderpriority, []).append(r.c)
    for g, vals in cents.items():
        vals.sort()
        n = len(vals)
        want = (vals[(n - 1) // 2] + vals[n // 2]) / 200.0
        assert got[g] == (n, want), (g, got[g], (n, want))


def test_zorder_write_keeps_null_dimension_rows(spark, tmp_path):
    """r10 review: NULL x/y rows must survive the z-order write (they
    coalesce onto sentinel cell -1 and land in file 0) — the histogram
    sort must not crash on a None cell, and the mapping join must not
    drop them."""
    from bangdatapipeline_spark.pipeline import Frame

    df = spark.createDataFrame(
        [(i, i % 7 if i % 5 else None, (i * 3) % 11) for i in range(1000)],
        "id long, xv int, yv int",
    )
    out = str(tmp_path / "zorder_nulls")
    Frame(df).to_parquet_zorder(out, F.col("xv"), F.col("yv"), n_files=4)
    back = spark.read.parquet(out)
    assert back.count() == 1000
    assert back.filter(F.col("xv").isNull()).count() == 200


def test_zorder_write_skewed_heavy_cell_keeps_small_cells_apart(spark, tmp_path):
    """r11 review: a z-cell heavy enough to cross several quantile
    thresholds must push the surplus thresholds BACKWARD onto earlier
    cells instead of collapsing them — hist like [(0,5),(1,5),(2,90)]
    at n_files=4 used to produce ONE file; cells 0 and 1 must keep
    their own files (3 files total: 5, 5, 90 rows)."""
    from bangdatapipeline_spark.pipeline import Frame

    # x in {0,1,2}, y=0 → z = morton2(x, 0) spreads x's bits to even
    # positions (x=2 → z=4), so cells are {0, 1, 4}: distinct and
    # MONOTONE in x, which is all the histogram structure needs;
    # 5+5+90 rows
    rows = [(i, 0, 0) for i in range(5)]
    rows += [(i, 1, 0) for i in range(5, 10)]
    rows += [(i, 2, 0) for i in range(10, 100)]
    df = spark.createDataFrame(rows, "id long, xv int, yv int")
    out = str(tmp_path / "zorder_skew")
    Frame(df).to_parquet_zorder(out, F.col("xv"), F.col("yv"), n_files=4)
    back = spark.read.parquet(out)
    assert back.count() == 100
    sizes = sorted(
        r["n"]
        for r in back.groupBy(F.input_file_name())
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert sizes == [5, 5, 90], sizes
