"""Document fingerprinting: order-sensitive rolling hash, SimHash, MinHash.

All three use the same engine-portable token hash so the DuckDB oracle can
reproduce them exactly with integer arithmetic:

    h(tok) = (len(tok)*2654435761 + ascii(first)*40503 + ascii(last)) mod 2^31

(2654435761 = Knuth's multiplicative constant.) MinHash additionally uses the
classic universal-hash family h_i(x) = (a_i*x + b_i) mod p with fixed seeded
(a_i, b_i) — pure integer math, identical everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

KNUTH = 2654435761
MOD31 = 2**31
MERSENNE31 = (1 << 31) - 1  # hash values < 2^31 ⇒ a*h < 2^62, no int64 overflow
N_MINHASH = 64
LSH_BANDS = 16  # 16 bands × 4 rows: P(candidate | J=0.9) ≈ 1 - 6e-8
LSH_ROWS = 4
SIMHASH_BITS = 16


def minhash_coeffs() -> list[tuple[int, int]]:
    """Fixed (a, b) pairs from a seeded LCG (deterministic, no RNG state)."""
    coeffs, x = [], 88172645463325252
    for _ in range(N_MINHASH):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (x % (MERSENNE31 - 1)) + 1
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = x % MERSENNE31
        coeffs.append((a, b))
    return coeffs


MINHASH_COEFFS = minhash_coeffs()


def token_hash_expr(tok: Column) -> Column:
    """Engine-portable token hash (see module docstring)."""
    return (
        F.length(tok).cast("long") * F.lit(KNUTH)
        + F.ascii(F.substring(tok, 1, 1)).cast("long") * F.lit(40503)
        + F.ascii(tok.substr(F.length(tok), F.lit(1))).cast("long")
    ) % F.lit(MOD31)


def token_hash_sql(tok: str) -> str:
    return (
        f"(length({tok})::BIGINT * {KNUTH} + ascii({tok}[1:1])::BIGINT * 40503"
        f" + ascii({tok}[length({tok}):length({tok})])::BIGINT) % {MOD31}"
    )


def rolling_fingerprint_expr(tokens: Column) -> Column:
    """Order-sensitive polynomial fingerprint:
    sum over positions i (0-based) of (i+1) * h(tok_i), exact in int64."""
    return F.aggregate(
        F.transform(tokens, lambda x, i: (i + F.lit(1)).cast("long") * token_hash_expr(x)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def rolling_fingerprint_sql(tokens_sql: str) -> str:
    """DuckDB twin — NB DuckDB lambda index i is 1-based (Spark is 0-based)."""
    th = token_hash_sql("x")
    return (
        f"list_sum(list_transform({tokens_sql}, (x, i) -> i::BIGINT * ({th})))::BIGINT"
    )


def shingles_expr(tokens: Column, k: int = 3) -> Column:
    """Distinct word k-shingles as strings (joined by single space)."""
    n = F.size(tokens)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, k)),
        )
    )


def shingles_sql(tokens_sql: str, k: int = 3) -> str:
    """DuckDB twin of `shingles_expr` (1-based list slicing)."""
    assert k == 3, "oracle twin written for k=3"
    t = tokens_sql
    return (
        f"list_distinct(list_transform(range(1, greatest(len({t}) - 2, 1) + 1), "
        f"i -> {t}[i] || ' ' || coalesce({t}[i+1], '') || ' ' || coalesce({t}[i+2], '')))"
    )


def _universal_hash(a: int, b: int):
    """Single-arg lambda factory (pyspark infers HOF arity from signature)."""
    return lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(MERSENNE31)


def minhash_sig_expr(shingle_hashes: Column) -> Column:
    """64 min-hashes over an array<long> of shingle hashes → array<long>."""
    mins = [
        F.array_min(F.transform(shingle_hashes, _universal_hash(a, b)))
        for a, b in MINHASH_COEFFS
    ]
    return F.array(*mins)


def band_keys_expr(sig: Column) -> Column:
    """LSH band keys: array of 'band_idx:h1_h2_h3_h4' strings."""
    keys = []
    for band in range(LSH_BANDS):
        parts = [F.lit(str(band))] + [
            sig[band * LSH_ROWS + r].cast("string") for r in range(LSH_ROWS)
        ]
        keys.append(F.concat_ws("_", *parts))
    return F.array(*keys)


def _bit_step(b: int):
    """Two-arg fold lambda factory: acc + (±1 by bit b of h), for h ≥ 0
    ((h & 2^b) > 0 ⟺ (h // 2^b) % 2 == 1, the oracle's formulation)."""
    mask = F.lit(1 << b)
    return lambda acc, h: acc + F.when(
        h.bitwiseAND(mask) > 0, F.lit(1).cast("long")
    ).otherwise(F.lit(-1).cast("long"))


def simhash_expr(tokens: Column, bits: int = SIMHASH_BITS) -> Column:
    """SimHash over token hashes: per bit, sum ±1 by the bit of h(tok);
    bit set iff the sum is positive. Exact integer math."""
    hashes = F.transform(tokens, token_hash_expr)
    val = F.lit(0).cast("long")
    for b in range(bits):
        bit_sum = F.aggregate(hashes, F.lit(0).cast("long"), _bit_step(b))
        val = val + F.when(bit_sum > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0))
    return val


def simhash_sql(tokens_sql: str, bits: int = SIMHASH_BITS) -> str:
    th = token_hash_sql("x")
    terms = []
    for b in range(bits):
        bit_sum = (
            f"list_sum(list_transform({tokens_sql}, "
            f"x -> ((({th}) // {2**b}) % 2) * 2 - 1))"
        )
        terms.append(f"(CASE WHEN {bit_sum} > 0 THEN {2**b} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")::BIGINT"
