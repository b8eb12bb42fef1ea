"""Static frequency-table construction.

Normalizes a 256-bin histogram to an exact power-of-two total with every
present symbol getting frequency ≥ 1. This generalizes the reference's two
schemes (clamp-and-scale at cpprcoder.h:543-571 and the steal-from-richest
fixup at cppans.h:138-178) into one largest-remainder rounding that is
deterministic and vectorizable on host and device.
"""

from __future__ import annotations

import numpy as np


def normalize_freqs(counts: np.ndarray, total_bits: int) -> np.ndarray:
    """Scale 256 counts so they sum to exactly 2**total_bits.

    Deterministic largest-remainder rounding: floor-scale, force present
    symbols to ≥ 1, then distribute the remaining deficit/surplus one unit at
    a time by largest fractional remainder (ties broken by lower symbol), and
    if over-allocated, steal from the richest entries (never below 1).
    """
    counts = np.asarray(counts, dtype=np.uint64)
    total = 1 << total_bits
    n = int(counts.sum())
    if n == 0:
        return np.zeros(256, dtype=np.uint32)
    present = counts > 0
    # floor scaling
    scaled = (counts * total) // n
    rem = (counts * total) % n
    freqs = scaled.astype(np.int64)
    freqs[present & (freqs == 0)] = 1
    deficit = total - int(freqs.sum())
    if deficit > 0:
        # give +1 to the `deficit` symbols with the largest remainders
        # (stable order: remainder desc, symbol asc)
        order = np.lexsort((np.arange(256), -rem.astype(np.int64)))
        give = [s for s in order if present[s]][:deficit]
        freqs[give] += 1
    elif deficit < 0:
        # steal from the richest symbols, one unit at a time, never below 1
        need = -deficit
        while need > 0:
            order = np.argsort(-freqs, kind="stable")
            for s in order:
                if need == 0:
                    break
                if freqs[s] > 1:
                    freqs[s] -= 1
                    need -= 1
            else:  # pragma: no cover - cannot happen while total ≥ 256
                raise ValueError("cannot normalize: total too small")
    if freqs.max() == total:
        # single distinct symbol: cap at total-1 so the value fits in u16
        # headers; the stolen unit goes to the next symbol (never coded, so
        # the only cost is 1/total of wasted code space).
        s = int(np.argmax(freqs))
        freqs[s] -= 1
        freqs[(s + 1) % 256] += 1
    assert int(freqs.sum()) == total
    return freqs.astype(np.uint32)


def exclusive_cumsum(freqs: np.ndarray) -> np.ndarray:
    """cum[s] = sum of freqs[:s]; 256 entries (matches calcCumulatives,
    cpprcoder.h:573-583)."""
    c = np.zeros(256, dtype=np.uint32)
    np.cumsum(freqs[:-1], out=c[1:], dtype=np.uint32)
    return c
