"""Engine-native Bloom filter: broadcastable bitset build + codegen probe.

The 100 TB decontamination problem: the exact benchmark-overlap join
(queries/training_data.q_decontaminate_overlap) broadcasts the eval
split's distinct n-gram *strings* — fine at thousands of grams, but a
large benchmark suite (millions of grams × ~50 bytes) outgrows a
comfortable broadcast long before the corpus does.  A Bloom filter
compresses the membership test to a fixed bitset (here 2^16 bits =
8 KB at ~1% false-positive rate for 10k grams): the corpus-side scan
probes the bitset inside whole-stage codegen and only the (rare)
maybe-hits proceed to the exact confirm join, whose input is now a
sliver of the corpus.

False positives are removed by the confirm join; false negatives are
impossible (every inserted element sets all its bits), so the
two-phase plan is *lossless*: its final output is bit-identical to the
exact join's — which is exactly how the driver's DuckDB oracle checks
it (the oracle runs the plain exact join; no bloom math needs a
cross-engine mirror).

Spark details: positions come from the md5-based ``hash64`` family
(deterministic across runs/engines); the bitset folds into a 1024-long
array literal (same plan-size class as the LSH hyperplane literals);
the probe is ``shiftright(element_at(words, pos/64), pos%64) & 1`` via
``F.expr`` — pure JVM codegen, no UDF, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash64

#: Bitset geometry: 2^16 bits / 3 hash functions ≈ 1% FP at 10k keys.
BLOOM_BITS = 1 << 16
BLOOM_K = 3
_WORDS = BLOOM_BITS // 64


def bloom_positions(col: Column) -> list[Column]:
    """The K bit positions of a string value (deterministic, seeded)."""
    return [hash64(col, seed=f"bloom{i}") % BLOOM_BITS for i in range(BLOOM_K)]


def build_bloom(keys: DataFrame, key_col: str) -> list[int]:
    """Collect the distinct bit positions of ``keys`` into a bitset.

    Driver traffic is ≤ K × distinct-keys ints (the build side is
    small by contract — benchmark suites, stop lists, block lists);
    the heavy corpus side never reaches the driver.
    """
    pos_cols = bloom_positions(F.col(key_col))
    pos = (
        keys.select(F.explode(F.array(*pos_cols)).alias("p"))
        .distinct()
        .collect()
    )
    words = [0] * _WORDS
    for r in pos:
        p = int(r["p"])
        words[p >> 6] |= 1 << (p & 63)
    return words


def bloom_might_contain(words: list[int], col: Column) -> Column:
    """Boolean probe: all K bits set?  Pure codegen over a literal array.

    Python ints in ``words`` use bit 63; Spark longs are signed, so
    values ≥ 2^63 are re-wrapped into negative two's-complement longs
    (bit-identical payload).
    """
    arr = F.array(
        *[F.lit(w if w < (1 << 63) else w - (1 << 64)).cast("long") for w in words]
    )
    probe = None
    for pos in bloom_positions(col):
        word = F.element_at(arr, (F.floor(pos / F.lit(64)) + 1).cast("int"))
        bit = (pos % F.lit(64)).cast("int")
        term = _shiftright_col(word, bit).bitwiseAND(
            F.lit(1).cast("long")
        ) == F.lit(1).cast("long")
        probe = term if probe is None else (probe & term)
    return probe


def _shiftright_col(value: Column, amount: Column) -> Column:
    """shiftright(value, amount) with a *column* shift amount.

    ``F.shiftright`` only accepts a Python int; the underlying SQL
    function takes arbitrary expressions, so call it positionally.
    """
    from pyspark.sql.functions import call_function

    return call_function("shiftright", value, amount)
