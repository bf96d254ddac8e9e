"""Invariant tests for the layout-maintenance and data-quality operators
(operators/layout_ops.py, operators/dataquality.py, the ts_lttb key).

The hash-vs-oracle equivalence is covered by test_correctness.py; these
pin the *semantic* invariants the oracles can't state: bin-packing bounds,
zone-map soundness, OPTIMIZE file mechanics + idempotence, orphan
detection on corrupted input, hot-key share arithmetic, calibration bin
partitioning, and LTTB endpoint retention.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bangdatapipeline_spark.registry import load_all

REG = load_all()


# ---------------------------------------------------------------- layout
def test_compaction_bins_are_bounded(spark, sf_dir):
    """Each bin's total is < target + its own largest file (the FFD
    running-sum guarantee) and every file lands in exactly one bin."""
    from bangdatapipeline_spark.operators.layout_ops import _COMPACT_TARGET

    rows = REG["layout_compaction_plan"].fn(spark, sf_dir).collect()
    assert rows
    by_bin: dict[tuple, list] = {}
    for r in rows:
        by_bin.setdefault((r.source, r.bin_id), []).append(r)
    for (_, bin_id), members in by_bin.items():
        total = sum(m.size_chars for m in members)
        largest = max(m.size_chars for m in members)
        assert total == members[0].bin_total
        assert len(members) == members[0].files_in_bin
        # exclusive-prefix binning: a bin only overflows by less than the
        # file that crossed the boundary
        assert total < _COMPACT_TARGET + largest
        assert bin_id >= 0
    # bin ids start at 0 and never exceed total/target (a jumbo file can
    # skip intermediate ids — it occupies several bins' worth of space —
    # so contiguity is NOT an invariant, only the range bound is)
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, members in by_src.items():
        total = sum(m.size_chars for m in members)
        assert min(m.bin_id for m in members) == 0, src
        assert max(m.bin_id for m in members) <= total // _COMPACT_TARGET, src


def test_zonemap_skip_is_sound_and_prunes_dates(spark, sf_dir):
    """skip=true implies zero matching rows (soundness — a pruned file
    can never hide a match), and the date-clustered layout actually
    prunes most files for the date predicate while the uncorrelated
    price predicate prunes none."""
    rows = REG["layout_zonemap_skip"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.skip_date:
            assert r.n_match_date == 0
        if r.skip_price:
            assert r.n_match_price == 0
        assert r.min_date <= r.max_date
        assert r.min_cents <= r.max_cents
    n_skip_date = sum(1 for r in rows if r.skip_date)
    n_skip_price = sum(1 for r in rows if r.skip_price)
    # layout clustered on date => most quarter-files prune for a 1-year
    # predicate; price is uncorrelated with file id => nothing prunes
    assert n_skip_date >= len(rows) - 5
    assert n_skip_price == 0


def test_txn_optimize_compacts_and_second_run_is_noop(spark, sf_dir):
    """OPTIMIZE mechanics on the real TxnTable: the multi-partition
    ingest leaves >1 file in at least one bucket, compact() reduces each
    fragmented bucket to one file, rows are preserved exactly, and a
    second compact() is a skipped no-op (idempotent maintenance)."""
    import os
    import shutil
    import tempfile
    import uuid

    from bangdatapipeline_spark.sources.txn_table import TxnTable
    from bangdatapipeline_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    n_src = docs.count()
    path = os.path.join(tempfile.gettempdir(), f"txn_opt_test_{uuid.uuid4().hex[:8]}")
    try:
        table = TxnTable.create(
            spark, path, docs.repartition(8, "doc_id"), key_col="doc_id", n_buckets=4
        )
        snap0 = table.snapshot()
        per_bucket: dict[int, int] = {}
        for e in snap0:
            per_bucket[e["bucket"]] = per_bucket.get(e["bucket"], 0) + 1
        assert max(per_bucket.values()) > 1  # small-file ingest, as designed
        stats = table.compact()
        assert not stats["skipped"]
        assert stats["files_after"] < stats["files_before"]
        snap1 = table.snapshot()
        per_bucket1: dict[int, int] = {}
        for e in snap1:
            per_bucket1[e["bucket"]] = per_bucket1.get(e["bucket"], 0) + 1
        assert all(v == 1 for v in per_bucket1.values())
        assert table.read().count() == n_src
        # distinct doc ids survive (no dup/loss through the rewrite)
        assert table.read().select("doc_id").distinct().count() == n_src
        again = table.compact()
        assert again["skipped"] is True
    finally:
        shutil.rmtree(path, ignore_errors=True)


# ------------------------------------------------------------- dataquality
def test_referential_integrity_clean_and_detects_injected_orphans(spark, sf_dir):
    """TPC-H data is FK-closed (0 orphans everywhere); breaking the
    parent side must surface exactly the broken keys."""
    from bangdatapipeline_spark.tables import load_table

    rows = {r.relation: r for r in REG["dq_referential_integrity"].fn(spark, sf_dir).collect()}
    assert len(rows) == 7
    for r in rows.values():
        assert r.n_orphan_rows == 0 and r.n_orphan_keys == 0
        assert r.n_child > 0 and r.n_keys > 0

    # injected corruption: drop region 0 from the parent, nation rows
    # referencing it become orphans
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_regionkey") != 0)
    keys = nation.groupBy(F.col("n_regionkey").alias("k")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    orph = keys.join(region.select(F.col("r_regionkey").alias("k")).distinct(), "k", "left_anti")
    got = orph.agg(F.sum("cnt").alias("rows"), F.count(F.lit(1)).alias("keys")).collect()[0]
    expect_rows = nation.filter(F.col("n_regionkey") == 0).count()
    assert got["keys"] == 1 and got["rows"] == expect_rows > 0


def test_hot_keys_shares_and_ranks(spark, sf_dir):
    rows = REG["dq_hot_keys"].fn(spark, sf_dir).collect()
    by_col: dict[str, list] = {}
    for r in rows:
        by_col.setdefault(r.col_name, []).append(r)
    assert set(by_col) == {"events.user_id", "events.event_type", "lineitem.l_partkey"}
    for col, members in by_col.items():
        members.sort(key=lambda r: r.rnk)
        assert [m.rnk for m in members] == list(range(1, len(members) + 1))
        # counts are non-increasing with rank; shares consistent
        for a, b in zip(members, members[1:]):
            assert a.cnt >= b.cnt
        for m in members:
            assert 0 < m.share_ppm <= 1_000_000
            assert m.hot_x_ppm >= m.share_ppm  # n_keys >= 1
    # event_type has 5 keys -> each of the top-5 is ~1/5 of the table,
    # hotness ~ 1e6 (uniform); user_id/partkey are near-uniform too but
    # much smaller shares
    et = by_col["events.event_type"]
    assert all(m.share_ppm > 100_000 for m in et)


def test_calibration_bins_partition_all_rows(spark, sf_dir):
    from bangdatapipeline_spark.tables import load_table

    rows = REG["eval_calibration_bins"].fn(spark, sf_dir).collect()
    n_emb = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n for r in rows) == n_emb
    assert all(0 <= r.bin <= 9 for r in rows)
    for r in rows:
        assert 0 <= r.n_pos <= r.n
        assert r.pos_ppm == r.n_pos * 1_000_000 // r.n
    # mean scores strictly increase with bin (equal-width bins over score)
    srt = sorted(rows, key=lambda r: r.bin)
    for a, b in zip(srt, srt[1:]):
        assert a.mean_score_int < b.mean_score_int


# ------------------------------------------------------------------ lttb
def test_lttb_keeps_endpoints_and_bounds_output(spark, sf_dir):
    from bangdatapipeline_spark.operators.timeseries import _LTTB_K
    from bangdatapipeline_spark.tables import load_table

    out = REG["ts_lttb_downsample"].fn(spark, sf_dir)
    rows = out.collect()
    ev = load_table(spark, sf_dir, "events")
    bounds = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for b in bounds:
        picks = sorted(by_user[b.user_id], key=lambda r: r.bucket)
        # one pick per non-empty bucket, at most K
        assert 1 <= len(picks) <= _LTTB_K
        assert len(picks) == len({p.bucket for p in picks})
        assert len(picks) == min(_LTTB_K, b.n)
        # endpoint retention: first pick is the series' first point,
        # last pick the last point
        assert picks[0].ts == b.t0
        assert picks[-1].ts == b.t1


@pytest.mark.parametrize(
    "key",
    [
        "layout_compaction_plan",
        "layout_zonemap_skip",
        "txn_optimize_table",
        "dq_referential_integrity",
        "dq_hot_keys",
        "eval_calibration_bins",
        "ts_lttb_downsample",
    ],
)
def test_new_keys_nonvacuous_at_smoke_sf(spark, key):
    """Every new key returns >0 rows at sf0.001 too (the degenerate-at-
    small-sf failure class from VERDICT round 2/3)."""
    assert REG[key].fn(spark, "/root/testdata/sf0.001").count() > 0


def test_file_bloom_soundness_and_skipping(spark, sf_dir):
    """A Bloom filter never false-negatives (n_missed == 0 for every
    probe), pass-count bounds match count from above, and the two
    certainly-absent probe keys demonstrate real skipping (they can only
    pass via false positives, bounded well below all-files)."""
    rows = REG["layout_file_bloom"].fn(spark, sf_dir).collect()
    assert len(rows) == 7
    for r in rows:
        assert r.n_missed == 0, f"bloom false-negative on {r.probe_key}"
        assert r.n_pass_bloom >= r.n_match
        assert r.n_false_pos == r.n_pass_bloom - r.n_match
    absent = [r for r in rows if r.probe_key >= 1_000_000_000]
    assert len(absent) == 2
    for r in absent:
        assert r.n_match == 0
        # fp-rate sanity: an absent key must skip most files
        assert r.n_pass_bloom <= max(1, r.n_files // 4)


def test_keep_best_quality_picks_cluster_max(spark, sf_dir):
    """The kept doc per cluster has the maximal integer quality (min
    doc_id on ties) among the cluster's members, and cluster shapes match
    dedup_clusters exactly."""
    kept = {
        r.cluster_id: r
        for r in REG["dedup_keep_best_quality"].fn(spark, sf_dir).collect()
    }
    labels = REG["dedup_clusters"].fn(spark, sf_dir).collect()
    docs = {
        r.doc_id: r.q_ppm
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id",
            F.expr(
                "size(array_distinct(split(text, ' '))) * 1000000L"
                " div size(split(text, ' '))"
            ).alias("q_ppm"),
        )
        .collect()
    }
    by_cluster: dict[int, list] = {}
    for r in labels:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    assert set(kept) == set(by_cluster)
    for cid, members in by_cluster.items():
        k = kept[cid]
        assert k.cluster_size == len(members) == members[0].cluster_size
        assert k.n_dropped == len(members) - 1
        best = min(((-docs[m.doc_id], m.doc_id) for m in members))
        assert (k.kept_doc, k.kept_q_ppm) == (best[1], -best[0])


def test_freshness_lag_arithmetic(spark, sf_dir):
    """Exactly one feed has lag 0 (the freshest), lags are non-negative,
    and is_stale matches the threshold comparison row by row."""
    from bangdatapipeline_spark.operators.dataquality import _FRESH_STALE_MIN

    rows = REG["dq_freshness"].fn(spark, sf_dir).collect()
    assert rows
    lags = [r.lag_minutes for r in rows]
    assert min(lags) == 0
    for r in rows:
        assert r.lag_minutes >= 0
        assert r.is_stale == (r.lag_minutes > _FRESH_STALE_MIN)


def test_concurrency_peak_bounds(spark, sf_dir):
    """Per day: 1 <= peak <= active sessions, and peak can never exceed
    the number of distinct users (a user has at most one live session at
    a time under the gap rule)."""
    rows = REG["ts_concurrency_peak"].fn(spark, sf_dir).collect()
    assert len(rows) == 30  # the testdata spans January 2024
    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    for r in rows:
        assert 1 <= r.peak_concurrent <= r.n_active_sessions
        assert r.peak_concurrent <= n_users


def test_partition_prune_actually_prunes(spark, sf_dir):
    """The date-range scan over the partitioned copy must open ONLY the
    5 matching day-directories (of 30): PartitionFilters present in the
    scan and inputFiles == 5 (one file per partition by construction)."""
    import os
    import shutil
    import tempfile
    import uuid

    from bangdatapipeline_spark.operators.layout_ops import (
        _PRUNE_HI,
        _PRUNE_LO,
    )
    from bangdatapipeline_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    path = os.path.join(tempfile.gettempdir(), f"prune_t_{uuid.uuid4().hex[:8]}")
    try:
        (
            ev.repartition(F.col("event_date"))
            .write.mode("overwrite")
            .partitionBy("event_date")
            .parquet(path)
        )
        part = spark.read.parquet(path).filter(
            F.col("event_date").between(_PRUNE_LO, _PRUNE_HI)
        )
        plan = part._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        expected = part.count()
        assert expected > 0
        # behavioral proof: drop every NON-matching day directory after the
        # file index is built; if the scan opened any pruned partition it
        # would now throw FileNotFoundException (ignoreMissingFiles=false),
        # so an identical re-count proves only the 5 matching directories
        # are ever read.
        kept = 0
        for entry in os.listdir(path):
            if not entry.startswith("event_date="):
                continue
            day = entry.split("=", 1)[1]
            if _PRUNE_LO <= day <= _PRUNE_HI:
                kept += 1
            else:
                shutil.rmtree(os.path.join(path, entry))
        assert kept == 5
        assert part.count() == expected
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_golden_record_survivorship(spark, sf_dir):
    """Every entity merges >= 2 records, the golden name belongs to the
    lowest member id, member_ids is the sorted audit trail containing
    entity_id itself, and block attributes are constant across members."""
    rows = REG["er_golden_record"].fn(spark, sf_dir).collect()
    assert rows
    from bangdatapipeline_spark.operators.curation import _er_dirty

    names = {
        r.rid: (r.name, r.c_nationkey, r.c_mktsegment, r.cents)
        for r in _er_dirty(spark, sf_dir).collect()
    }
    for r in rows:
        members = [int(x) for x in r.member_ids.split(",")]
        assert r.n_records == len(members) >= 2
        assert members == sorted(members)
        assert members[0] == r.entity_id
        assert names[r.entity_id][0] == r.golden_name
        for m in members:
            assert names[m][1] == r.nation
            assert names[m][2] == r.segment
            assert names[m][3] == r.cents


def test_shingle_novelty_conservation(spark, sf_dir):
    """Novelty conserves: summed novel shingles across docs equals the
    corpus's distinct shingle count; the min-doc_id document of the
    corpus is 100% novel; ppm bounds hold."""
    rows = REG["text_shingle_novelty"].fn(spark, sf_dir).collect()
    assert rows
    from bangdatapipeline_spark.operators.dedup_near import _hashed_shingles

    distinct_shingles = (
        _hashed_shingles(spark, sf_dir)
        .select(F.explode("hs").alias("h"))
        .distinct()
        .count()
    )
    assert sum(r.n_novel for r in rows) == distinct_shingles
    first = min(rows, key=lambda r: r.doc_id)
    assert first.n_novel == first.n_shingles
    assert first.novelty_ppm == 1_000_000
    for r in rows:
        assert 0 <= r.n_novel <= r.n_shingles
        assert r.novelty_ppm == r.n_novel * 1_000_000 // r.n_shingles


def test_volume_anomaly_lattice_and_guards(spark, sf_dir):
    """First _VOL_TRAIL days per feed never flag (incomplete window);
    med2/mad4 are null only on the very first day; flagged rows really
    deviate by more than K * MAD in the x4 lattice."""
    from bangdatapipeline_spark.operators.dataquality import _VOL_K, _VOL_TRAIL

    rows = REG["dq_volume_anomaly"].fn(spark, sf_dir).collect()
    assert len(rows) == 150  # 5 feeds x 30 days
    by_feed: dict[str, list] = {}
    for r in rows:
        by_feed.setdefault(r.event_type, []).append(r)
    for feed, members in by_feed.items():
        members.sort(key=lambda r: r.day)
        assert members[0].med2 is None and members[0].mad4 is None
        for i, r in enumerate(members):
            if i < _VOL_TRAIL:
                assert not r.is_anomaly
            if r.is_anomaly:
                assert abs(r.n * 4 - r.med2 * 2) > _VOL_K * r.mad4
