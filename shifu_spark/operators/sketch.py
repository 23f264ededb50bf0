"""Probabilistic sketches with DETERMINISTIC, oracle-checkable hashing.

Count-Min (Cormode & Muthukrishnan 2005): d independent hash rows of
width w; point estimate = min over rows of the hit counter. The sketch
BUILD is a bounded groupBy (d·w counters regardless of data size) — the
constant-memory heavy-hitter / frequency primitive for 100 TB streams
where an exact per-key groupBy's state would be unbounded.

Hashing here is the repo's standard md5-threshold machinery (row i's
hash = fold of the first 4 hex nibbles of md5('cms{i}|' || key)), so the
sketch contents are a pure function of the data — identical across
engines, reruns and partitionings, and mirrored exactly by the DuckDB
oracle (F.rand/xxhash layouts are not). Spark's native HLL
(approx_count_distinct) covers distinct counting; this adds the
frequency-sketch family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4
CMS_WIDTH = 32

_HEX = "0123456789abcdef"


def _require_canonical_key(df: DataFrame, key_col: str) -> None:
    """Reject FLOAT/DOUBLE sketch keys loudly — see functions/keys.py
    (the shared guard for every md5-content-keyed primitive)."""
    from shifu_spark.functions.keys import require_canonical_key

    require_canonical_key(df, key_col, what="sketch key")


def _nibble_fold_sql(h_sql: str, width: int) -> str:
    """16-bit value from the first 4 hex nibbles of ``h_sql`` modulo
    ``width`` — spelled in the SQL subset both engines parse identically
    (position(x IN y), substr)."""
    terms = " + ".join(
        f"(position(substr({h_sql}, {j + 1}, 1) IN '{_HEX}') - 1) * {16 ** (3 - j)}"
        for j in range(4)
    )
    return f"(({terms}) % {width})"


def cms_bucket_sql(key_sql: str, i: int, width: int = CMS_WIDTH) -> str:
    """Row-``i`` bucket for a key expression (engine-shared SQL; the
    md5/concat spelling below parses in both Spark SQL and DuckDB)."""
    h = f"md5(concat('cms{i}|', cast({key_sql} AS string)))"
    return _nibble_fold_sql(h, width)


def cms_bucket_expr(key_col: str, i: int, width: int = CMS_WIDTH) -> Column:
    return F.expr(cms_bucket_sql(key_col, i, width))


def cms_build_df(
    df: DataFrame, key_col: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """Build the sketch: (row_i, bucket, cnt) — at most depth·width rows.

    ONE corpus pass: the d bucket ids compute in-row (posexplode of a
    d-slot array), then a bounded groupBy; the shuffle carries at most
    depth·width·n_tasks partial rows — constant in data size. That
    bound is the whole point of the sketch at scale."""
    _require_canonical_key(df, key_col)
    # a NULL key inserts NOTHING (the count_distinct/count-of-values
    # convention both engines share); md5(NULL) would otherwise emit
    # NULL-bucket rows that count as real sketch mass
    df = df.where(F.col(key_col).isNotNull())
    buckets = F.array(*[cms_bucket_expr(key_col, i, width) for i in range(depth)])
    return (
        df.select(F.posexplode(buckets).alias("row_i", "bucket"))
        .groupBy("row_i", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate_df(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point estimates for ``keys``: min over rows of the matching
    counter (the classic CMS upper bound: estimate >= true count,
    overestimate only from collisions). The sketch side is
    depth·width-sized, so it BROADCASTS; missing counters read as 0."""
    _require_canonical_key(keys, key_col)
    probes = keys.select(
        F.col(key_col),
        F.posexplode(
            F.array(*[cms_bucket_expr(key_col, i, width) for i in range(depth)])
        ).alias("row_i", "bucket"),
    )
    joined = probes.join(F.broadcast(cms), ["row_i", "bucket"], "left").select(
        key_col, F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    return joined.groupBy(key_col).agg(F.min("cnt").alias("cms_estimate"))


# ---------------------------------------------------------------------------
# Bloom filter (positions-as-relation form)
# ---------------------------------------------------------------------------

BLOOM_BITS = 256
BLOOM_K = 3


def bloom_pos_sql(key_sql: str, i: int, bits: int = BLOOM_BITS) -> str:
    """Bit position i for a key (same md5 nibble-fold machinery)."""
    h = f"md5(concat('bloom{i}|', cast({key_sql} AS string)))"
    return _nibble_fold_sql(h, bits)


def bloom_build_df(df: DataFrame, key_col: str, bits: int = BLOOM_BITS, k: int = BLOOM_K) -> DataFrame:
    """Build a Bloom filter as its SET BIT POSITIONS (one column ``pos``,
    at most ``bits`` rows — the same constant-size bound as the packed
    form; a production impl packs these into longs with bit_or, which
    is a physical layout detail, not a semantic one). One pass:
    in-row k positions -> posexplode -> bounded distinct."""
    _require_canonical_key(df, key_col)
    df = df.where(F.col(key_col).isNotNull())  # NULL key inserts nothing
    poss = F.array(*[F.expr(bloom_pos_sql(key_col, i, bits)) for i in range(k)])
    return (
        df.select(F.explode(poss).alias("pos")).distinct()
    )


def bloom_probe_df(
    bloom: DataFrame, keys: DataFrame, key_col: str, bits: int = BLOOM_BITS, k: int = BLOOM_K
) -> DataFrame:
    """Membership probe: hit iff ALL k positions are set. The filter side
    is <= ``bits`` rows, so it broadcasts; no-FN / possible-FP is the
    Bloom contract (pinned in tests)."""
    _require_canonical_key(keys, key_col)
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(*[F.expr(bloom_pos_sql(key_col, i, bits)) for i in range(k)])
        ).alias("pos"),
    )
    hitcount = (
        probes.join(F.broadcast(bloom.withColumn("_set", F.lit(1))), "pos", "left")
        .groupBy(key_col)
        .agg((F.count(F.lit(1)) == F.sum(F.coalesce(F.col("_set"), F.lit(0)))).alias("bloom_hit"))
    )
    return hitcount


# ---------------------------------------------------------------------------
# HyperLogLog (raw estimator, deterministic md5 hashing)
# ---------------------------------------------------------------------------

HLL_M = 64  # registers (p = 6)
HLL_ALPHA = 0.709  # standard alpha for m = 64


def _rho_case_sql(w_sql: str, width_bits: int = 32) -> str:
    """rho(w) = leading zeros of the ``width_bits``-wide value + 1 —
    a pure comparison CASE chain (no logs), identical in both engines.
    w = 0 maps to width_bits + 1 (all-zero suffix convention)."""
    branches = " ".join(
        f"WHEN {w_sql} >= {1 << (width_bits - 1 - z)} THEN {z + 1}"
        for z in range(width_bits)
    )
    return f"(CASE {branches} ELSE {width_bits + 1} END)"


def hll_register_sql(key_sql: str) -> str:
    """Register index: 6 bits of md5('hllr|' || key)."""
    h = f"md5(concat('hllr|', cast({key_sql} AS string)))"
    return _nibble_fold_sql(h, HLL_M)


def hll_rho_sql(key_sql: str) -> str:
    """rho of a 32-bit value from md5('hllw|' || key) (independent salt
    so register and rho are independent hashes)."""
    h = f"md5(concat('hllw|', cast({key_sql} AS string)))"
    # BIGINT multipliers: the 32-bit fold exceeds INT32 range and
    # Spark's ANSI integer arithmetic overflows loudly otherwise
    terms = " + ".join(
        f"(position(substr({h}, {j + 1}, 1) IN '{_HEX}') - 1) * CAST({16 ** (7 - j)} AS BIGINT)"
        for j in range(8)
    )
    return _rho_case_sql(f"({terms})")


def hll_registers_df(df: DataFrame, key_col: str) -> DataFrame:
    """(reg, max_rho): the HLL register table — at most HLL_M rows out of
    a single pass + bounded groupBy (the constant-state distinct-count
    sketch; Spark's own approx_count_distinct is the same structure with
    engine-private hashing — this one is oracle-mirrorable)."""
    _require_canonical_key(df, key_col)
    return (
        df.where(F.col(key_col).isNotNull())  # NULL key inserts nothing
        .select(
            F.expr(hll_register_sql(key_col)).alias("reg"),
            F.expr(hll_rho_sql(key_col)).alias("rho"),
        )
        .groupBy("reg")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate_expr(registers: DataFrame) -> DataFrame:
    """One-row raw-HLL estimate: alpha·m² / Σ 2^-M_j (absent registers
    contribute 2^0 = 1). Every 2^-M term is an exact dyadic rational, so
    the sum is order-independent and the estimate is bit-identical on
    any engine. Raw estimator only (no small/large-range corrections —
    those need ln(), which is not engine-portable; size the register
    count so n >> 2.5·m instead)."""
    m = HLL_M
    # 2^-rho via a literal array lookup, NOT pow(): libm pow is not
    # guaranteed correctly rounded on every engine; the literals are
    # exact dyadic doubles, so the <=64-term sum is exact and
    # order-independent (lsb 2^-33, magnitude < 2^6 -> 39 bits < 53)
    inv_pow2 = F.array(*[F.lit(2.0 ** -k) for k in range(1, 35)])
    present = registers.agg(
        F.sum(F.element_at(inv_pow2, F.col("max_rho"))).alias("present_sum"),
        F.count(F.lit(1)).alias("n_regs"),
    )
    return present.select(
        F.round(
            F.lit(HLL_ALPHA * m * m)
            / (F.col("present_sum") + (F.lit(m) - F.col("n_regs"))),
            4,
        ).alias("hll_estimate"),
        F.col("n_regs").cast("long").alias("n_registers_hit"),
    )


def hll_merge(registers_a: DataFrame, registers_b: DataFrame) -> DataFrame:
    """Union two HLL register tables: register-wise MAX — the
    MERGEABILITY that makes sketches work distributed (partial sketches
    from any partitioning / any day / any source union losslessly;
    max is idempotent, commutative, associative). Output is a valid
    register table for :func:`hll_estimate_expr`."""
    return (
        registers_a.unionByName(registers_b)
        .groupBy("reg")
        .agg(F.max("max_rho").alias("max_rho"))
    )
