"""Token-budget sharding for training-batch assembly: assign each
document to a fixed-token-capacity shard by its position in the
corpus-wide running token count — the step that turns a filtered
corpus into equal-work training shards (each shard feeds one data
loader; capacity = tokens per shard file).

Semantics (deterministic, engine-portable): documents are laid out in
``id_col`` order; doc d starts at offset(d) = sum of token counts of
all ids < d; shard(d) = floor(offset(d) / capacity). A document is
never split — shards overflow by at most one document, the standard
"pack by starting offset" contract (greedy concat-and-chunk used by
LLM data loaders, minus intra-doc splitting).

Scale shape: the naive form is ONE global window cumsum — a single
task at 100 TB. This implementation is the classic two-pass
distributed prefix sum instead:

1. bucket = floor(id / bucket_size): an embarrassingly-parallel
   projection (no shuffle) that respects id order across buckets;
2. per-bucket token totals (map-side-combined groupBy, n_buckets
   rows) -> running bucket offsets via a window over the TINY totals
   frame (n_buckets rows ~ corpus/bucket_size — driver-safe by
   construction, e.g. 10^10 docs / 10^6 = 10^4 rows);
3. broadcast-join the offsets back and cumsum WITHIN each bucket —
   a window partitioned by bucket, so every partition sorts only its
   own bucket's rows; no task ever sees the whole corpus.

The only corpus-wide movement is the one shuffle that co-locates each
bucket; the window inside it is bounded by bucket_size rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def prefix_sum_start(
    df: DataFrame,
    size_col: str,
    id_col: str,
    bucket_size: int = 1 << 20,
    key_col: str | None = None,
) -> DataFrame:
    """The reusable two-pass distributed prefix sum: returns
    (id_col, _sz, _start) where _start = sum of ``size_col`` over all
    rows earlier in the layout order. Consumers:
    :func:`token_shard_assign` (token-capacity shards) and
    sources/webdataset.wds_shard_plan (tar-byte shards + offsets).

    Layout order: ``id_col`` order by default — then ``id_col`` must
    be numeric (the bucket split is trunc(id/bucket_size); truncation
    is monotone, so buckets are contiguous order ranges; ids need not
    be dense, gaps only make buckets uneven, never wrong). For
    non-numeric ids pass a numeric ``key_col`` (e.g. xxhash64 of the
    id): the layout becomes (key, id) order — deterministic even
    through hash collisions — and the bucket split runs on the key
    (size the buckets to the KEY range: a full 64-bit hash needs
    bucket_size ~ 1<<50 for ~16k buckets; the double division's
    precision loss is harmless because rounding is monotone, a fuzzy
    boundary only moves rows between adjacent buckets)."""
    key = key_col or id_col
    base = df.select(
        F.col(id_col),
        *([F.col(key_col)] if key_col else []),
        F.col(size_col).cast("long").alias("_sz"),
        (F.col(key).cast("long") / F.lit(int(bucket_size)))
        .cast("long")
        .alias("_b"),
    )
    # The totals branch re-reads `base` (Catalyst prunes id from it,
    # so the subtrees differ and ReuseExchange cannot kick in), but it
    # partial-aggregates MAP-SIDE and shuffles only n_buckets rows —
    # cheaper than repartitioning the corpus a second time to share
    # the exchange (measured: the shared-exchange form shuffles the
    # full corpus twice). Feed a slim materialized (id, tokens) frame,
    # the natural shape — token counts are computed once upstream and
    # reused by many consumers — and the double read is two cheap
    # two-column scans.
    totals = base.groupBy("_b").agg(F.sum("_sz").alias("_bt"))
    w_off = (
        Window.orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.select(
        "_b", (F.sum("_bt").over(w_off) - F.col("_bt")).alias("_boff")
    )
    w_in = (
        Window.partitionBy("_b")
        .orderBy(*([key_col, id_col] if key_col else [id_col]))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.join(F.broadcast(offsets), "_b")
        .select(
            F.col(id_col),
            F.col("_sz"),
            (F.col("_boff") + F.sum("_sz").over(w_in) - F.col("_sz")).alias(
                "_start"
            ),
        )
    )


def token_shard_assign(
    df: DataFrame,
    token_col: str,
    id_col: str,
    capacity: int,
    bucket_size: int = 1 << 20,
) -> DataFrame:
    """Returns (id, tokens, shard) with shard = floor(start/capacity)
    under the corpus-wide id-ordered layout (see
    :func:`prefix_sum_start` for the two-pass scale shape and the
    numeric-id precondition)."""
    return prefix_sum_start(df, token_col, id_col, bucket_size).select(
        F.col(id_col),
        F.col("_sz").alias("tokens"),
        (F.col("_start") / F.lit(int(capacity))).cast("long").alias("shard"),
    )


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    seed: str = "epoch-0",
    shard_size: int | None = None,
    n_hex: int = 4,
) -> DataFrame:
    """Deterministic epoch-level training shuffle: a seed-keyed global
    permutation position per row (plus optionally the loader shard it
    lands in), WITHOUT a global sort task.

    Training loops reshuffle the corpus between epochs; at 100 TB that
    cannot be an orderBy(rand()) (nondeterministic, irreproducible)
    nor a single-task rank. Position = rank of
    md5(seed || ':' || id) — a new seed is a new, reproducible
    permutation, and any engine (the DuckDB oracle included) computes
    the identical order. Same md5 trick as stratified_sample/
    cluster_safe_split, so one hash family runs the whole
    sample/split/shuffle story.

    Scale shape (the aspect_batch_assign two-pass prefix count): the
    first ``n_hex`` hex chars of the key are its bucket — hex-string
    lexicographic order equals the numeric prefix order, so buckets
    are contiguous rank ranges; per-bucket counts (16^n_hex rows) ->
    running offsets over that tiny frame -> broadcast back; each
    window partition sorts only its own bucket (~corpus/16^n_hex
    rows; n_hex=4 puts 10^10 rows at ~150k/bucket).

    Returns (id, epoch_pos[, shard = epoch_pos // shard_size]).

    Unlike the seed reader's zipWithIndex pattern, nothing here
    depends on scan order or partitioning: key and bucket are pure
    functions of the id VALUE, so post-shuffle or sampled inputs are
    fine; ids must be unique (ties fall back to id order)."""
    key = F.md5(
        F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string"))
    )
    base = df.select(
        F.col(id_col),
        key.alias("_ek"),
        F.conv(F.substring(key, 1, n_hex), 16, 10)
        .cast("long")
        .alias("_b"),
    )
    counts = base.groupBy("_b").agg(F.count(F.lit(1)).alias("_c"))
    w_off = (
        Window.orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = counts.select(
        "_b", (F.sum("_c").over(w_off) - F.col("_c")).alias("_off")
    )
    w_in = Window.partitionBy("_b").orderBy("_ek", id_col)
    out = (
        base.join(F.broadcast(offsets), "_b")
        .withColumn(
            "epoch_pos",
            F.col("_off") + F.row_number().over(w_in) - F.lit(1),
        )
        .select(F.col(id_col), F.col("epoch_pos"))
    )
    if shard_size is not None:
        out = out.withColumn(
            "shard",
            (F.col("epoch_pos") / F.lit(int(shard_size))).cast("long"),
        )
    return out


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    out_col: str = "_z",
    bounds: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """Morton/Z-order key over 2-4 numeric columns: the multi-dim
    clustering key behind Iceberg/Delta ``OPTIMIZE ZORDER BY`` — rows
    close in z are close in EVERY listed dimension, so per-file
    min/max stats stay tight on all of them at once and a predicate
    on ANY dimension prunes files. A lexicographic sort gives that
    only for its leading column; at 100 TB the difference is reading
    2^file_bits files vs a handful for a selective second-dim filter
    (quantified in tests/test_zorder.py).

    Shape: ONE bounded map-side min/max aggregation (2*len(cols)
    partial cells, a single collected row — the ivf/sq "train stats
    driver-side, apply distributed" recipe), then the key is a PURE
    PROJECTION: each column min-max-scales to a ``bits``-bit integer
    and the integers bit-interleave into one int64. No shuffle; the
    expression stays inside scan codegen. Pass ``bounds`` to freeze
    the scale (incremental appends must reuse the ORIGINAL layout's
    bounds or z-neighborhoods drift between batches — same frozen-
    quantizer contract as IvfIndex.append); out-of-bounds values
    clamp to the edge bucket.

    Engine-portable by construction: scaled_d =
    floor(least(greatest((x-mn)/denom*(2^bits-1), 0), 2^bits-1)) in
    IEEE doubles, identical term order in the DuckDB oracle, so the
    KEY (not just the ordering) is bit-identical across engines.
    ``bits*len(cols)`` must fit an int64 (<= 62)."""
    ndims = len(cols)
    if not 2 <= ndims <= 4:
        raise ValueError("zorder_key needs 2-4 columns")
    if bits * ndims > 62:
        raise ValueError("bits*len(cols) must be <= 62")
    top = float((1 << bits) - 1)
    if bounds is None:
        aggs = []
        for c in cols:
            aggs.append(F.min(F.col(c).cast("double")).alias(f"_mn_{c}"))
            aggs.append(F.max(F.col(c).cast("double")).alias(f"_mx_{c}"))
        row = df.agg(*aggs).collect()[0]
        if any(row[f"_mn_{c}"] is None for c in cols):
            raise ValueError(
                "zorder_key: empty input (or all-null column) and no "
                "explicit bounds= given — pass bounds to key an "
                "empty/append frame against an existing layout"
            )
        bounds = {c: (row[f"_mn_{c}"], row[f"_mx_{c}"]) for c in cols}
    z = F.lit(0).cast("long")
    for d, c in enumerate(cols):
        mn, mx = (float(bounds[c][0]), float(bounds[c][1]))
        denom = (mx - mn) if mx > mn else 1.0
        scaled = F.floor(
            F.least(
                F.greatest(
                    (F.col(c).cast("double") - F.lit(mn))
                    / F.lit(denom)
                    * F.lit(top),
                    F.lit(0.0),
                ),
                F.lit(top),
            )
        ).cast("long")
        sc = f"_s_{d}"
        df = df.withColumn(sc, scaled)
        for b in range(bits):
            z = z + (
                F.shiftright(F.col(sc), b)
                .bitwiseAND(F.lit(1).cast("long"))
                * F.lit(1 << (b * ndims + d)).cast("long")
            )
    return df.withColumn(out_col, z).drop(
        *[f"_s_{d}" for d in range(ndims)]
    )


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    file_bits: int = 6,
    bounds: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """Cluster rows into z-contiguous "files": _file = the top
    ``file_bits`` bits of the z-key (equal-WIDTH z ranges — a pure
    function of the row, so the file assignment is deterministic and
    oracle-checkable; production layouts that need equal-SIZE files
    use repartitionByRange on _z instead — sampled bounds, same
    pruning bboxes, just not replayable across engines). One shuffle
    (hash on _file) + a within-partition sort; the z-key projection
    itself adds none."""
    zspan = bits * len(cols)
    if file_bits > zspan:
        raise ValueError("file_bits exceeds z width")
    keyed = zorder_key(df, cols, bits, bounds=bounds).withColumn(
        "_file", F.shiftright(F.col("_z"), zspan - file_bits)
    )
    return keyed.repartition(1 << file_bits, F.col("_file")).sortWithinPartitions(
        "_file", "_z"
    )


def zorder_manifest(
    df_laid: DataFrame,
    cols: list[str],
    file_col: str = "_file",
) -> DataFrame:
    """The Iceberg-manifest analog for a z-ordered table: per-file row
    count + min/max of every clustered column — the stats a scan
    planner prunes against. Map-side-combined groupBy over at most
    2^file_bits groups; the result is planner-sized (KBs), never
    corpus-sized."""
    aggs = [F.count(F.lit(1)).alias("cnt")]
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return df_laid.groupBy(F.col(file_col).alias("file")).agg(*aggs)


def prune_manifest(
    manifest: DataFrame,
    predicates: dict[str, tuple[float, float]],
) -> DataFrame:
    """Files a box predicate must read: keep file f iff
    [min_c, max_c] intersects [lo_c, hi_c] for EVERY predicated
    column (min/max stats can only prove absence — the standard
    Iceberg/Parquet row-group skipping rule). Runs on the tiny
    manifest; the payoff is the corpus-sized scan it avoids."""
    cond = F.lit(True)
    for c, (lo, hi) in predicates.items():
        cond = cond & (F.col(f"max_{c}") >= F.lit(lo)) & (
            F.col(f"min_{c}") <= F.lit(hi)
        )
    return manifest.filter(cond)


def pruned_scan(
    df_laid: DataFrame,
    manifest: DataFrame,
    predicates: dict[str, tuple[float, float]],
    file_col: str = "_file",
) -> DataFrame:
    """The planner rule prune_manifest exists for, as an executable
    operator: restrict the scan to the files a box predicate can
    touch (broadcast semi-join on the tiny pruned manifest — at 100
    TB this is the partition-pruning step that keeps whole z-range
    files unread), then apply the exact row-level predicate inside
    the surviving files. Sound AND complete by construction: min/max
    intersection never drops a file containing a match (soundness is
    prune_manifest's rule; completeness is the row filter) — pytest
    asserts equality with the naive full-scan filter."""
    kept = prune_manifest(manifest, predicates).select(
        F.col("file").alias(file_col)
    )
    out = df_laid.join(F.broadcast(kept), file_col, "semi")
    for c, (lo, hi) in predicates.items():
        out = out.filter((F.col(c) >= F.lit(lo)) & (F.col(c) <= F.lit(hi)))
    return out
