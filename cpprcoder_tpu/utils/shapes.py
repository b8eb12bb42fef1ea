"""Shape bucketing: jit compiles per static shape, so dynamic sizes are
rounded up to a coarse bucket grid (3-bit-mantissa floats) to bound the
number of compilations while wasting ≤ ~12% padding."""

from __future__ import annotations


def bucket(n: int, minimum: int = 16) -> int:
    """Smallest value ≥ n of the form m·2^e with m in [8, 16)."""
    n = max(int(n), minimum)
    if n <= 16:
        return 16
    e = n.bit_length() - 4  # so that m = n >> e is in [8, 16)
    m = (n + (1 << e) - 1) >> e
    return m << e
