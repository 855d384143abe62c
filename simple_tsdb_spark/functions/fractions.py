"""Exact integer-grid threshold validation.

The round-10 integer-finals doctrine replaces every float threshold
comparison with an exact cross-multiplication on the parts-per-million
grid (``10^6 · num >= ppm · den``).  That grid is only exact when the
caller's threshold actually SITS on it: ``int(round(x * 1e6))`` would
silently coarsen a sub-ppm threshold (e.g. ``1e-7`` → 0, disabling the
filter entirely) and change firing semantics with no error.  The
validators here raise instead — the same contract
``plans.analytics._exact_fraction`` pins for TPC-H Q11's share test.
"""

from __future__ import annotations

from fractions import Fraction

PPM = 1_000_000


def exact_ppm(x: float, *, name: str = "threshold") -> int:
    """``x`` as an exact parts-per-million integer.

    Raises ``ValueError`` when ``float(x)`` is not exactly ``k / 10^6``
    for an integer ``k`` (after the usual shortest-decimal reading: the
    double nearest 0.001 IS 1000 ppm; 1e-7 or 1/3 is not on the grid).
    """
    f = Fraction(float(x)).limit_denominator(PPM)
    k = f * PPM
    if k.denominator != 1 or float(f) != float(x):
        raise ValueError(
            f"{name}={x!r} is not exactly a multiple of 1e-6; the exact "
            "integer ppm cross-multiplied comparison requires thresholds "
            "on the 1e-6 grid (sub-ppm values would be silently coarsened)"
        )
    return int(k)
