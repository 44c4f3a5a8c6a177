"""Engine-native Bloom filter: broadcastable bitset build + codegen probe.

The 100 TB decontamination problem: the exact benchmark-overlap join
(queries/training_data.q_decontaminate_overlap) broadcasts the eval
split's distinct n-gram *strings* — fine at thousands of grams, but a
large benchmark suite (millions of grams × ~50 bytes) outgrows a
comfortable broadcast long before the corpus does.  A Bloom filter
compresses the membership test to ~2 bytes per key (16 bits/key, 3
hashes ≈ 0.5% false positives): the corpus-side scan probes the
bitset inside whole-stage codegen and only the (rare) maybe-hits
proceed to the exact confirm join, whose input is now a sliver of the
corpus.

False positives are removed by the confirm join; false negatives are
impossible (every inserted element sets all its bits), so the
two-phase plan is *lossless*: its final output is bit-identical to the
exact join's — which is exactly how the driver's DuckDB oracle checks
it (the oracle runs the plain exact join; no bloom math needs a
cross-engine mirror).

Spark details: positions come from seeded ``xxhash64`` (deterministic
across runs; engine-internal only — see bloom_positions); the bitset auto-sizes to the key
count (next power of two ≥ 16 bits/key) and rides to executors as a
single-row broadcast frame (``crossJoin(broadcast(...))`` — a 2 MB
array row at a million keys, vs a 50 MB string set); the probe is
``shiftright(element_at(words, pos/64), pos%64) & 1`` — pure JVM
codegen, no UDF, no shuffle of the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


#: Hash count; with 16 bits/key the FP rate is ~(1-e^-3/5.3)^3 ≈ 0.5%.
BLOOM_K = 3

#: Floor bitset size (8 KB) — below this the array row is noise.
MIN_BITS = 1 << 16

#: Target bits per distinct key when auto-sizing.
BITS_PER_KEY = 16


def bloom_positions(col: Column, nbits: int) -> list[Column]:
    """The K bit positions of a string value (deterministic, seeded).

    Kirsch-Mitzenmacher double hashing: position_i = (h1 + i·h2) mod
    nbits — two hash evaluations produce all K positions (probing cost
    is per-gram × corpus-size, so each saved hash matters), with the
    same asymptotic FP rate as K independent hashes.

    xxhash64, not the md5-based hash64: bloom positions only need
    build/probe consistency WITHIN the engine (the final output is
    oracle-checked via the exact confirm join, never the positions),
    and xxhash64 is ~10× cheaper per gram — measured 123 s → see
    SCALING.md at the 100× decade.  Both hashes reduce mod nbits
    BEFORE combining so the BIGINT arithmetic cannot overflow under
    ANSI mode.
    """
    h1 = F.pmod(F.xxhash64(col, F.lit(0xB10)), F.lit(nbits))
    h2 = F.pmod(F.xxhash64(col, F.lit(0xB11)), F.lit(nbits))
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(nbits)) for i in range(BLOOM_K)]


def build_bloom(
    keys: DataFrame, key_col: str, nbits: int | None = None
) -> tuple[list[int], int]:
    """(bitset words, nbits): distinct bit positions of ``keys``.

    Auto-sizes to the next power of two ≥ 16 × distinct keys (so FP
    stays ~0.5% however large the benchmark suite grows).  Driver
    traffic is ≤ K × distinct-keys ints — the build side is small by
    contract (benchmark suites, stop lists, block lists); the heavy
    corpus side never reaches the driver.
    """
    import numpy as np

    if nbits is None:
        n = keys.count()
        nbits = MIN_BITS
        while nbits < BITS_PER_KEY * n:
            nbits <<= 1
    pos_cols = bloom_positions(F.col(key_col), nbits)
    # Arrow-columnar driver hand-off (toPandas), not row collect: at a
    # million-key benchmark suite this is ~3M int64s — a numpy array,
    # built into the bitset with vectorized bit ops.
    pos = (
        keys.select(F.explode(F.array(*pos_cols)).alias("p"))
        .distinct()
        .toPandas()["p"]
        .to_numpy()
        .astype(np.uint64)
    )
    words = np.zeros(nbits // 64, dtype=np.uint64)
    np.bitwise_or.at(
        words,
        (pos >> np.uint64(6)).astype(np.int64),
        np.left_shift(np.uint64(1), pos & np.uint64(63)),
    )
    return [int(w) for w in words], nbits


def with_bloom_probe(
    df: DataFrame,
    words: list[int],
    nbits: int,
    col: Column,
    out_col: str = "_maybe",
) -> DataFrame:
    """Adds a boolean column: all K bits of ``col`` set in the bitset?

    The bitset arrives as a one-row broadcast frame (array<long>), so
    its size is bounded by the broadcast limit, not the expression-tree
    size — a million-key filter is a 2 MB row, not 32k literals.
    Python ints ≥ 2^63 re-wrap into negative two's-complement longs
    (bit-identical payload).
    """
    spark = df.sparkSession
    signed = [w if w < (1 << 63) else w - (1 << 64) for w in words]
    bits = spark.createDataFrame([(signed,)], "_bloom array<long>")
    probe = None
    for pos in bloom_positions(col, nbits):
        word = F.element_at(
            F.col("_bloom"), (F.floor(pos / F.lit(64)) + 1).cast("int")
        )
        bit = (pos % F.lit(64)).cast("int")
        term = _shiftright_col(word, bit).bitwiseAND(
            F.lit(1).cast("long")
        ) == F.lit(1).cast("long")
        probe = term if probe is None else (probe & term)
    return (
        df.crossJoin(F.broadcast(bits))
        .withColumn(out_col, probe)
        .drop("_bloom")
    )


def _shiftright_col(value: Column, amount: Column) -> Column:
    """shiftright(value, amount) with a *column* shift amount.

    ``F.shiftright`` only accepts a Python int; the underlying SQL
    function takes arbitrary expressions, so call it positionally.
    """
    from pyspark.sql.functions import call_function

    return call_function("shiftright", value, amount)
