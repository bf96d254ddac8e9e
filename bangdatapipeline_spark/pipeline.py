"""Fluent pipeline facade — the reference's user-facing workflow, Spark-first.

The reference (SURVEY.md §3.1) is used as an eager call chain:
``fetch(batch) → flatten → per-column processors → merge metadata → pivot →
export``. This module gives that exact workflow shape on the lazy engine: a
``Pipeline`` session facade (ingest/cache/load) and a thin ``Frame`` wrapper
whose verbs are the registered operators' building blocks. Every verb
returns a new ``Frame`` over an UNEXECUTED DataFrame — the user writes the
same eager-looking chain, but the whole chain compiles to ONE Catalyst plan
and executes once at the terminal verb (``to_parquet`` / ``to_csv`` /
``df``), so Catalyst sees — and optimizes — the entire pipeline: filters
written last still push down to the scan, and a recode feeding an export
never materializes an intermediate.

The wrapper adds NO execution machinery of its own (no collect, no caching
policy): it is deliberately a naming layer over DataFrame so a reference
user gets their vocabulary (``recode``, ``merge``, ``widen``, ``dedup``)
while staying 100% inside the Spark plan. Anything not covered by a verb is
reachable via ``.df`` — the wrapper is an on-ramp, not a cage.
"""

from __future__ import annotations

import bisect
from collections.abc import Callable, Mapping

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from bangdatapipeline_spark import sources
from bangdatapipeline_spark.tables import load_table


def _hash_steering(spark: SparkSession, n: int) -> dict[int, int]:
    """For each partition id ``f`` in ``0..n-1``, find an int ``m`` with
    ``pmod(hash(m), n) == f`` — i.e. a value that HashPartitioning routes
    to exactly partition ``f``. Probing is done with Spark's own ``F.hash``
    (Murmur3, seed 42 — the identical function HashPartitioning applies),
    over int-typed candidates because Murmur3 of int and long differ.
    The per-residue min is taken JVM-side (groupBy.min), so the collect
    is at most ``n`` rows per chunk (metadata, never data — holds even
    at the ~100k files of a 100 TB write); each chunk misses a given
    residue with probability ~e**-64, so one chunk all but always
    suffices."""
    found: dict[int, int] = {}
    lo = 0
    while len(found) < n:
        rows = (
            spark.range(lo, lo + 64 * n)
            .select(
                F.col("id").cast("int").alias("m"),
                F.pmod(F.hash(F.col("id").cast("int")), F.lit(n)).alias("p"),
            )
            .groupBy("p")
            .agg(F.min("m").alias("m"))
            .collect()
        )
        for r in rows:
            found.setdefault(r["p"], r["m"])
        lo += 64 * n
    return found


class Pipeline:
    """Session facade: ingestion + table access (the reference's
    ``BangDataPipeline`` object, minus the HTTP client — ingestion starts
    from fetched JSON files, which is where the offline contract begins)."""

    def __init__(self, spark: SparkSession, sf_dir: str | None = None):
        self.spark = spark
        self.sf_dir = sf_dir

    def ingest_json(self, path: str, cache_parquet: str | None = None,
                    schema=None) -> "Frame":
        """JSON batch → (optionally parquet-cached) Frame; the reference's
        fetch-cache-parse step, minus the HTTP GET."""
        df = sources.ingest_json(self.spark, path, schema=schema)
        if cache_parquet is not None:
            sources.canonicalize_parquet(df, cache_parquet)
            df = self.spark.read.parquet(cache_parquet)
        return Frame(df)

    def table(self, name: str) -> "Frame":
        """One of the ten benchmark tables at the session's sf_dir."""
        if self.sf_dir is None:
            raise ValueError("Pipeline(sf_dir=...) required for table()")
        return Frame(load_table(self.spark, self.sf_dir, name))


class Frame:
    """Lazy DataFrame wrapper with the reference's ETL vocabulary."""

    def __init__(self, df: DataFrame):
        self.df = df

    # -- row / column selection -------------------------------------------
    def filter(self, cond: Column | str) -> "Frame":
        return Frame(self.df.filter(cond))

    def select(self, *cols) -> "Frame":
        return Frame(self.df.select(*cols))

    def rename(self, mapping: Mapping[str, str]) -> "Frame":
        return Frame(self.df.withColumnsRenamed(dict(mapping)))

    def derive(self, **cols: Column) -> "Frame":
        """Computed columns (reference: derived survey columns)."""
        return Frame(self.df.withColumns(dict(cols)))

    # -- the reference's "processor" mechanism ----------------------------
    def recode(self, **procs: Callable[[Column], Column]) -> "Frame":
        """Per-column processors: each callable maps the existing column
        expression to its recoded expression — column-level Catalyst
        expressions, NOT Python row functions, so recodes stay JVM-side
        (SURVEY.md §2.12: udf_scalar is the escape hatch when a recode
        genuinely needs Python)."""
        return Frame(
            self.df.withColumns({c: fn(F.col(c)) for c, fn in procs.items()})
        )

    # -- reshaping ---------------------------------------------------------
    def flatten(self, array_col: str, prefix: str | None = None) -> "Frame":
        """Explode an array-of-structs column into child rows with the
        struct fields promoted (the reference's json_normalize step)."""
        out = self.df.withColumn(array_col, F.explode(array_col))
        struct_fields = out.select(f"{array_col}.*").columns
        alias = prefix or array_col
        cols = [c for c in out.columns if c != array_col] + [
            F.col(f"{array_col}.{f}").alias(f"{alias}_{f}") for f in struct_fields
        ]
        return Frame(out.select(*cols))

    def merge(self, other: "Frame | DataFrame", on, how: str = "inner") -> "Frame":
        other_df = other.df if isinstance(other, Frame) else other
        return Frame(self.df.join(other_df, on, how))

    def widen(self, index: list[str], key: str, values: list[str],
              agg: Column | None = None) -> "Frame":
        """Long→wide pivot with an EXPLICIT key list (stable columns —
        SURVEY.md §2.9 pivot_wide)."""
        return Frame(
            self.df.groupBy(*index).pivot(key, values)
            .agg(agg if agg is not None else F.count(F.lit(1)))
        )

    # -- cleaning ----------------------------------------------------------
    def dedup(self, keys: list[str], order_by: list[Column]) -> "Frame":
        """Keep-first dedup with an explicit, DETERMINISTIC ordering (the
        dropDuplicates keeper is partition-dependent; this one is not)."""
        w = Window.partitionBy(*keys).orderBy(*order_by)
        return Frame(
            self.df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    def fillna(self, values: Mapping[str, object]) -> "Frame":
        """Per-column null replacement (pandas ``fillna`` vocabulary)."""
        return Frame(self.df.fillna(dict(values)))

    def dropna(self, subset: list[str] | None = None,
               how: str = "any") -> "Frame":
        """Drop rows with nulls (pandas ``dropna`` vocabulary)."""
        return Frame(self.df.dropna(how=how, subset=subset))

    def split(self, key: str, frac_train: float = 0.8,
              frac_val: float = 0.1) -> "Frame":
        """Deterministic md5-gate train/val/test assignment column
        (partition-invariant; same recipe as the sample_split operator)."""
        gate = F.substring(F.md5(F.col(key).cast("string")), 1, 8)

        def cut(f: float) -> str:
            # 'g' sorts above every hex digit: a fraction >= 1 must map to
            # a cut ABOVE all gates — format(16**8, "08x") would be the
            # NINE-char "100000000", which sorts lexicographically BELOW
            # most 8-char gates and silently mis-assigns the bucket.
            return "g" if f >= 1.0 else format(int(f * 16**8), "08x")
        return Frame(
            self.df.withColumn(
                "split",
                F.when(gate < cut(frac_train), "train")
                .when(gate < cut(frac_train + frac_val), "val")
                .otherwise("test"),
            )
        )

    def value_counts(self, col: str, normalize: bool = False) -> "Frame":
        """Per-value frequency table (pandas ``value_counts``): count per
        distinct value, descending with the value as tie-break; optional
        relative frequencies. One map-side-combined aggregation."""
        out = self.df.groupBy(col).agg(F.count("*").alias("count"))
        if normalize:
            total = out.agg(F.sum("count").alias("__t"))
            out = out.crossJoin(F.broadcast(total)).select(
                col,
                "count",
                F.round(F.col("count") / F.col("__t"), 6).alias("frac"),
            )
        return Frame(out.orderBy(F.col("count").desc(), F.col(col).asc()))

    def melt(self, ids: list[str], values: list[str],
             var_name: str = "variable", value_name: str = "value") -> "Frame":
        """Wide→long unpivot (pandas ``melt`` vocabulary)."""
        return Frame(self.df.unpivot(ids, values, var_name, value_name))

    def describe(self, cols: list[str] | None = None) -> "Frame":
        """Numeric summary (pandas ``describe`` shape): one row per column
        with count / mean / stddev / min / max — computed for ALL columns
        in one scan + one tiny stack, the same plan shape as ``profile``."""
        from pyspark.sql.types import NumericType

        numeric = [
            f.name for f in self.df.schema.fields
            if isinstance(f.dataType, NumericType)
        ]
        cols = cols or numeric
        bad = [c for c in cols if c not in numeric]
        if bad:
            raise ValueError(f"describe(): non-numeric columns {bad}")

        def _ref(name: str) -> Column:
            return F.col("`" + name.replace("`", "``") + "`")

        aggs: list[Column] = []
        for i, c in enumerate(cols):
            src = _ref(c).cast("double")
            aggs += [
                F.count(src).alias(f"__d{i}_n"),
                F.round(F.avg(src), 6).alias(f"__d{i}_mean"),
                F.round(F.stddev_samp(src), 6).alias(f"__d{i}_sd"),
                F.round(F.min(src), 6).alias(f"__d{i}_min"),
                F.round(F.max(src), 6).alias(f"__d{i}_max"),
            ]
        one = self.df.agg(*aggs)
        stack_args: list[Column] = [F.lit(len(cols))]
        for i, c in enumerate(cols):
            stack_args += [
                F.lit(c),
                F.col(f"__d{i}_n"),
                F.col(f"__d{i}_mean"),
                F.col(f"__d{i}_sd"),
                F.col(f"__d{i}_min"),
                F.col(f"__d{i}_max"),
            ]
        return Frame(
            one.select(
                F.stack(*stack_args).alias(
                    "col_name", "count", "mean", "stddev", "min", "max"
                )
            )
        )

    def profile(self, cols: list[str] | None = None) -> "Frame":
        """One-pass data-quality profile: per column, row/null/distinct
        counts and stringified min/max (one scan for ALL columns — the
        audit step before trusting a new data drop).

        Supported column types: atomic (numeric / string / boolean /
        date / timestamp / binary) and arrays of atomics. Map-typed
        columns are rejected up front (countDistinct cannot hash them).
        Column names are never interpolated into SQL text — the unpivot
        is built from typed ``F.stack``/``F.lit`` expressions, so names
        containing backticks, quotes, or dots are safe.
        """
        from pyspark.sql.types import MapType

        cols = cols or self.df.columns
        dtypes = {f.name: f.dataType for f in self.df.schema.fields}
        unknown = [c for c in cols if c not in dtypes]
        if unknown:
            raise ValueError(f"profile(): unknown columns {unknown}")
        unsupported = [c for c in cols if isinstance(dtypes[c], MapType)]
        if unsupported:
            raise ValueError(
                f"profile(): map-typed columns not profilable {unsupported}; "
                "project map_keys/map_values first"
            )
        def _ref(name: str) -> Column:
            # exact-name reference via standard identifier escaping
            # (double embedded backticks, wrap in backticks)
            return F.col("`" + name.replace("`", "``") + "`")

        aggs: list[Column] = [F.count("*").alias("__n")]
        for i, c in enumerate(cols):
            src = _ref(c)
            aggs += [
                F.count(src).alias(f"__c{i}_nn"),
                F.countDistinct(src).alias(f"__c{i}_nd"),
                F.min(src).cast("string").alias(f"__c{i}_mn"),
                F.max(src).cast("string").alias(f"__c{i}_mx"),
            ]
        one = self.df.agg(*aggs)
        stack_args: list[Column] = [F.lit(len(cols))]
        for i, c in enumerate(cols):
            stack_args += [
                F.lit(c),
                F.col(f"__c{i}_nn"),
                F.col(f"__c{i}_nd"),
                F.col(f"__c{i}_mn"),
                F.col(f"__c{i}_mx"),
            ]
        out = one.select(
            F.stack(*stack_args).alias(
                "col_name", "nn", "n_distinct", "min_val", "max_val"
            ),
            one["__n"].alias("n_rows"),
        ).select(
            "col_name", "n_rows",
            (F.col("n_rows") - F.col("nn")).alias("n_nulls"),
            "n_distinct", "min_val", "max_val",
        )
        return Frame(out)

    # -- terminal verbs ----------------------------------------------------
    def to_parquet(self, path: str, partition_by: list[str] | None = None) -> None:
        sources.canonicalize_parquet(self.df, path, partition_by=partition_by)

    def to_parquet_upsert(self, path: str, partition_by: list[str]) -> None:
        """Partition-level idempotent upsert (dynamic partition overwrite):
        re-running a backfill replaces only the partitions it writes."""
        sources.upsert_partitions(self.df, path, partition_by)

    def to_csv(self, out_dir: str) -> None:
        sources.export_csv(self.df, out_dir)

    def to_parquet_zorder(
        self,
        path: str,
        x: Column,
        y: Column,
        bits: int = 8,
        n_files: int = 16,
        mode: str = "overwrite",
    ) -> None:
        """Z-order-clustered parquet write: interleave the low ``bits``
        bits of two already-bucketized integer dimension expressions into
        a Morton code, range-partition and sort the data by it, and write
        — so every output file's parquet footer carries TIGHT min/max
        stats on BOTH dimensions and a reader's predicate on EITHER one
        prunes most files (the lakehouse OPTIMIZE ZORDER primitive; the
        per-file bounding-box evidence is the ``layout_zorder`` query).

        ``x`` / ``y`` must already be non-negative ints below 2**bits
        (e.g. ``(col % 256)``, day-index mod 256) — the caller owns the
        bucketization because only it knows each dimension's domain. The
        z column is dropped before writing; it exists only to order the
        data.

        The file cut points are DETERMINISTIC, not sampled:
        ``repartitionByRange`` draws its range bounds from a reservoir
        sample whose seed comes from RDD lineage ids, so the same write
        in a different session history produces different (sometimes
        looser) per-file z-spans. Instead this writer (1) computes the
        EXACT equal-frequency z cut points from a full z histogram — one
        map-side-combined groupBy over a lattice of at most 2**16 cells
        (z is coarsened by a shift when ``2*bits > 16``), so the driver
        collect is bounded by the lattice, never by the data — and
        (2) routes each z-run to its own shuffle partition by hash
        steering: for each file id ``f`` a small probe job finds an int
        ``m`` with ``pmod(hash(m), n) == f`` (Spark's HashPartitioning
        is ``pmod(murmur3(expr, seed=42), n)`` — the same function as
        ``F.hash``), so ``repartition(n, steer)`` places bucket ``f`` in
        partition ``f`` by construction. One deterministic hash shuffle
        + per-partition sort — the same I/O as the sampled range shuffle,
        with reproducible, exactly-balanced files. A cell heavy enough to
        cross several quantile thresholds pushes the surplus thresholds
        backward onto the nearest earlier cells (r11: naive dedup merged
        small leading cells into the heavy cell's file, widening bboxes),
        so skew costs at most the thresholds that have no earlier cell
        left, never a neighbour's file.

        Scale: every driver-side structure is bounded by the z LATTICE
        (<= 2**16 cells) or by ``n_files`` — never by the data. Rows
        meet the cut points through one broadcast hash join against the
        (cell -> steer) mapping table, O(1) per row regardless of
        ``n_files`` (a per-row WHEN-chain over the bounds would be
        O(n_files) per row — wrong at the ~100k files a 100 TB write
        produces).
        """
        from bangdatapipeline_spark.operators.curation import morton2

        spark = self.df.sparkSession
        z = morton2(x.cast("long"), y.cast("long"), bits)
        coded = self.df.withColumn("__z", z)

        # Exact equal-frequency cut points on the (coarsened) z lattice.
        # NULL x/y make __z NULL: coalesce those rows onto sentinel cell
        # -1 so they (a) survive the mapping join, (b) cluster together
        # in the first file (parquet min/max stats ignore nulls anyway).
        shift = max(0, 2 * bits - 16)
        cell = F.coalesce(F.shiftright(F.col("__z"), shift), F.lit(-1))
        hist = sorted(
            (r["cell"], r["n"])
            for r in coded.groupBy(cell.alias("cell"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()  # bounded by the z lattice (<= 65536 rows), not data
        )
        total = sum(n for _, n in hist)
        raw: list[int] = []  # one entry per crossed quantile threshold
        cum, nxt = 0, 1
        for c, n in hist:
            cum += n
            while nxt < n_files and cum * n_files >= nxt * total:
                raw.append(c)
                nxt += 1
        # Distinctify: one heavy cell crossing several thresholds yields
        # duplicate raw bounds. Naive dedup over-collapses files (r10
        # review: hist [(0,5),(1,5),(2,90)] at n_files=4 collapsed to ONE
        # file where cells 0/1 could keep their own) — instead push
        # surplus thresholds BACKWARD onto the nearest earlier unused
        # cells. Walk raw bounds last-to-first keeping assigned cells
        # strictly decreasing; the max cell is never a bound (it would
        # close an empty last file). A threshold with no earlier cell
        # left is genuinely unsatisfiable and is dropped.
        cells = [c for c, _ in hist[:-1]]  # candidate bound cells, sorted
        bounds = []  # built decreasing, reversed below
        for b in reversed(raw):
            hi = bounds[-1] if bounds else None  # smallest assigned so far
            # largest candidate cell <= b and < hi
            i = bisect.bisect_right(cells, b if hi is None else min(b, hi - 1)) - 1
            if i >= 0:
                bounds.append(cells[i])
        bounds.reverse()  # bounds[i] = last z-cell of file i, increasing
        n_buckets = len(bounds) + 1

        # (cell -> hash-steer value) mapping, broadcast-joined onto rows.
        steer_of = _hash_steering(spark, n_buckets)
        mapping, b_idx = [], 0
        for c, _n in hist:
            while b_idx < len(bounds) and c > bounds[b_idx]:
                b_idx += 1
            mapping.append((c, steer_of[b_idx]))
        map_df = spark.createDataFrame(mapping, "__cell long, __steer int")
        # LEFT join + fallback steer: `coded` is evaluated twice (the
        # histogram job, then the write job) without a checkpoint; if the
        # source is nondeterministic or changes between the jobs, a cell
        # unseen by the histogram must still be WRITTEN (into file 0,
        # slightly widening its bbox) — an inner join would silently drop
        # those rows from a writer.
        fallback = steer_of[0]
        (
            coded.withColumn("__cell", cell.cast("long"))
            .join(F.broadcast(map_df), "__cell", "left")
            .withColumn("__steer", F.coalesce("__steer", F.lit(fallback)))
            .repartition(n_buckets, F.col("__steer"))
            .sortWithinPartitions("__z")
            .drop("__z", "__cell", "__steer")
            .write.mode(mode)
            .parquet(path)
        )

    def bloom_semi(self, dim: "Frame | DataFrame", on: str, dim_key: str | None = None,
                   bits: int = 4096) -> "Frame":
        """Bloom-filter semi-join: keep rows whose ``on`` key probably
        appears in ``dim``'s ``dim_key`` column — the runtime-filter
        pattern of ``join_bloom_prefilter`` as a reusable verb. The dim
        side collapses to ONE broadcast row of set bit positions; the
        probe is a JVM-side array_contains conjunction in the scan stage,
        so the fact side never shuffles. False positives are possible
        (rate ~ (k·n/bits)^k); follow with a real join when exactness
        matters — the gate only shrinks what that join reads.
        """
        from bangdatapipeline_spark.operators import joins as _j

        other = dim.df if isinstance(dim, Frame) else dim
        dk = dim_key or on
        dim_bits = other.select(
            F.explode(
                F.array(*_j._bloom_bits_spark(F.col(dk), bits))
            ).alias("bit")
        ).agg(F.collect_set("bit").alias("__bloom"))
        probe = _j._bloom_bits_spark(F.col(on), bits)
        cond = F.lit(True)
        for p in probe:
            cond = cond & F.array_contains(F.col("__bloom"), p)
        return Frame(
            self.df.crossJoin(F.broadcast(dim_bits)).filter(cond).drop("__bloom")
        )

    def merge_state(self, delta: "Frame | DataFrame", keys: list[str],
                    sums: list[str] = (), mins: list[str] = (),
                    maxs: list[str] = ()) -> "Frame":
        """Fold a delta batch of aggregate STATE into this state frame —
        the materialized-view-maintenance merge of ``incremental_agg_merge``
        as a verb. Both frames must already be in mergeable state form
        (one row per key); every listed column merges with its
        decomposable combiner (sum/min/max), so the result equals the
        state a full recompute would produce. The shuffle moves only
        state rows — never raw facts.
        """
        other = delta.df if isinstance(delta, Frame) else delta
        merged = self.df.unionByName(other).groupBy(*keys).agg(
            *[F.sum(c).alias(c) for c in sums],
            *[F.min(c).alias(c) for c in mins],
            *[F.max(c).alias(c) for c in maxs],
        )
        return Frame(merged)

    def median(self, col: str, by: str, scale: int = 100,
               width: int = 100000) -> "Frame":
        """EXACT per-group median of a numeric column without a global
        sort — the ``exact_median2`` two-phase selection kernel as a
        facade verb (pandas ``groupby(by)[col].median()`` vocabulary).
        ``scale`` lifts the value onto an integer lattice (100 = cent
        precision) so the selection and the final halving are exact;
        ``width`` is the phase-1 histogram bucket size. Returns
        ``(by, n, median)`` with ``median`` back in input units.
        """
        from bangdatapipeline_spark.operators.aggregates import exact_median2

        v = self.df.select(
            F.col(by).alias("grp"),
            F.round(F.col(col) * scale, 0).cast("bigint").alias("v"),
        )
        m = exact_median2(v, width=width)
        return Frame(
            m.select(
                F.col("grp").alias(by),
                "n",
                (F.col("m2") / F.lit(2.0 * scale)).alias("median"),
            )
        )
