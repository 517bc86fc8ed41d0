"""Deterministic transcendentals — bit-identical ``ln`` on every engine.

THE problem (VERDICT r9 "What's wrong" #1, three driver rounds of hash-only
reds): IEEE-754 requires +, −, ×, ÷ and sqrt to be CORRECTLY ROUNDED, so
any two engines that execute the same sequence of those ops on the same
doubles produce the same bits.  ``ln``/``exp``/``pow`` carry no such
guarantee — they are libm/build-dependent, and a sub-ulp difference between
Spark's JVM ``ln`` and the driver's DuckDB build crosses a
``floor(x·10⁶+0.5)`` tick, moving an integer-scaled score by 1 and hashing
every downstream row red while rows/ranks stay identical.  Grid-rounding
the ln output (the r9 mitigation) shrinks the hazard window but cannot
close it: the pre-round double is still env-computed.

The fix: never call the engine's ``ln``.  :func:`det_ln` evaluates the
logarithm AS a fixed sequence of correctly-rounded IEEE ops, generated
from ONE shared coefficient list in three forms — a Spark ``Column``
expression, a DuckDB SQL string, and a plain-Python float function — so
all three produce bit-identical doubles on any standards-conforming
engine, at any scale factor, with no data-dependent literals:

1. invert:  ``s = ±1``, ``y = x`` or ``1/x`` so ``y ≥ 1``       (÷ exact-rounded)
2. reduce:  ``e = bit_length(floor(y)) − 1`` (= ⌊log₂ y⌋, EXACT integer ops:
   for y ≥ 1, floor(y) shares y's binade since 2^e is an integer),
   ``m = y / 2^e ∈ [1, 2)``                         (÷ by a power of 2: EXACT)
3. series:  ``t = (m−1)/(m+1) ∈ [0, 1/3]``, ``ln m = 2·t·P(t²)`` where
   ``P(u) = Σ_{k<18} u^k/(2k+1)`` evaluated by Horner with literal
   coefficients (truncation ≈ (1/3)³⁷ ≈ 2e-18, far below double ulp)
4. assemble: ``ln x = s · (e·LN2 + 2·t·P(t²))``

Every step is +, −, ×, ÷ on doubles (correctly rounded ⇒ identical), exact
integer bit work, or a literal parsed from its shortest round-trip repr
(⇒ identical bits).  Accuracy vs true ln is a few ulp — irrelevant for
oracle equality (both sides run THIS function) and far inside every
caller's rounding grid.

Also here: the pow-hazard helpers.  ``pow(x, 0.5)`` in an oracle must be
``sqrt(x)`` (sqrt IS correctly rounded; libm ``pow`` at 0.5 is not
guaranteed to match it), and ``pow(2.0, k)`` for integer k must be an
integer shift — see :func:`exact_pow2_sql`.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "det_ln",
    "det_ln_sql",
    "det_ln_py",
    "exact_pow2",
    "exact_pow2_sql",
    "double_literal_sql",
    "LN2",
]

# ln(2) as a double literal — repr() round-trips to the same bits that
# DuckDB / Spark parse from this decimal spelling.
LN2 = 0.6931471805599453

# atanh-series coefficients 1/(2k+1), k = 0..17: truncation error at the
# worst-case t = 1/3 is ~(1/3)^37/37 ≈ 6e-20 relative — below double ulp.
_COEFFS = [1.0 / (2 * k + 1) for k in range(18)]


def _dlit(x: float) -> str:
    """Spell a double literal for DuckDB SQL so it parses to the SAME bits
    CPython/JVM hold: DuckDB parses a bare ≥16-significant-digit decimal
    literal as DECIMAL and its decimal→double cast is NOT correctly
    rounded (observed: ``0.9999999999999999`` → ``1.0``, while strtod
    gives the double just below 1).  ``CAST('<repr>' AS DOUBLE)`` goes
    through the correctly-rounded string→double path on every engine."""
    return f"CAST('{x!r}' AS DOUBLE)"


#: public alias — oracle builders use this for any literal whose repr has
#: ≥16 significant digits (e.g. ``0.30000000000000004``).
double_literal_sql = _dlit


def _let(value: Column, body) -> Column:
    """Single-element-array ``transform`` as a let-binding (the
    ``operators/text._let`` idiom, duplicated here to keep ``functions/``
    import-light): ``value`` is evaluated once per row and ``body``
    receives the bound column."""
    return F.element_at(F.transform(F.array(value), body), 1)


def det_ln(x: Column) -> Column:
    """``ln(x)`` for ``x > 0`` as a fixed sequence of correctly-rounded
    IEEE ops — bit-identical to :func:`det_ln_sql` (DuckDB) and
    :func:`det_ln_py` (CPython) on any conforming engine.  See the module
    docstring for the construction; ``x ≤ 0`` is undefined (callers guard,
    exactly as they must for the engine ``ln``).

    VALID DOMAIN: roughly ``2^-63 < x < 2^63``.  The binade reduction takes
    ``floor(y)`` (``y = x`` or ``1/x``) through a BIGINT cast, which
    overflows INT64 outside that range with ENGINE-DIVERGENT behavior —
    Spark's double→long cast saturates to Long.MaxValue (garbage result),
    DuckDB raises a conversion error, CPython alone stays correct.  Clamp
    arguments into the domain first (see ``operators/corpus._GUMBEL_CLAMP``);
    the bit-identity sweep in tests/test_detmath.py covers 2^±62."""

    def outer(xv: Column) -> Column:
        sign = F.when(xv < F.lit(1.0), F.lit(-1.0)).otherwise(F.lit(1.0))
        y = F.when(xv < F.lit(1.0), F.lit(1.0) / xv).otherwise(xv)

        def with_y(yv: Column) -> Column:
            e = F.length(F.bin(F.floor(yv).cast("long"))) - F.lit(1)
            pow2e = F.call_function(
                "shiftleft", F.lit(1).cast("long"), e.cast("int")
            ).cast("double")
            m = yv / pow2e

            def with_m(mv: Column) -> Column:
                t = (mv - F.lit(1.0)) / (mv + F.lit(1.0))

                def with_t(tv: Column) -> Column:
                    u = tv * tv

                    def with_u(uv: Column) -> Column:
                        p = F.lit(_COEFFS[-1])
                        for c in reversed(_COEFFS[:-1]):
                            p = F.lit(c) + uv * p
                        return e.cast("double") * F.lit(LN2) + F.lit(
                            2.0
                        ) * tv * p

                    return _let(u, with_u)

                return _let(t, with_t)

            return _let(m, with_m)

        return sign * _let(y, with_y)

    return _let(x.cast("double"), outer)


def det_ln_sql(expr: str) -> str:
    """DuckDB mirror of :func:`det_ln` — the identical op sequence spelled
    as SQL (single-element ``list_transform`` lambdas as let-bindings,
    ``printf('%b')`` for the exact bit-length, ``<<`` for the exact power
    of two).  Splice the SAME argument expression both engines compute so
    the input double is already bit-identical.  Same valid domain as
    :func:`det_ln` (``2^-63 < x < 2^63`` — outside it the BIGINT cast
    RAISES on DuckDB while Spark saturates silently)."""
    horner = _dlit(_COEFFS[-1])
    for c in reversed(_COEFFS[:-1]):
        horner = f"({_dlit(c)} + __dlu * {horner})"
    core = (
        f"list_transform([CASE WHEN __dlx < 1.0 THEN 1.0 / __dlx ELSE __dlx END], __dly -> "
        f"list_transform([length(printf('%b', CAST(floor(__dly) AS BIGINT))) - 1], __dle -> "
        f"list_transform([__dly / CAST((CAST(1 AS BIGINT) << __dle) AS DOUBLE)], __dlm -> "
        f"list_transform([(__dlm - 1.0) / (__dlm + 1.0)], __dlt -> "
        f"list_transform([__dlt * __dlt], __dlu -> "
        f"CAST(__dle AS DOUBLE) * {_dlit(LN2)} + 2.0 * __dlt * {horner}"
        f")[1])[1])[1])[1])[1]"
    )
    return (
        f"list_transform([CAST(({expr}) AS DOUBLE)], __dlx -> "
        f"(CASE WHEN __dlx < 1.0 THEN -1.0 ELSE 1.0 END) * ({core}))[1]"
    )


def det_ln_py(x: float) -> float:
    """CPython mirror of :func:`det_ln` — Python floats are IEEE doubles
    with correctly-rounded arithmetic, so this returns the same bits the
    Spark/DuckDB forms compute.  Used by frozen-model compilers
    (``bm25_query_model``) whose driver-side literals must match the
    engine replay exactly.  Stay inside ``2^-63 < x < 2^63`` (Python ints
    don't overflow, so THIS form alone is correct outside it — which is
    exactly why callers must not rely on it: the engine mirrors aren't)."""
    sign = -1.0 if x < 1.0 else 1.0
    y = 1.0 / x if x < 1.0 else float(x)
    e = int(math.floor(y)).bit_length() - 1
    m = y / float(1 << e)
    t = (m - 1.0) / (m + 1.0)
    u = t * t
    p = _COEFFS[-1]
    for c in reversed(_COEFFS[:-1]):
        p = c + u * p
    return sign * (float(e) * LN2 + 2.0 * t * p)


def exact_pow2(k: Column) -> Column:
    """``2^k`` for integer column ``0 ≤ k ≤ 62`` as an EXACT integer shift
    cast to double — libm ``pow(2.0, k)`` is usually exact but carries no
    guarantee."""
    return F.call_function(
        "shiftleft", F.lit(1).cast("long"), k.cast("int")
    ).cast("double")


def exact_pow2_sql(expr: str) -> str:
    """DuckDB mirror of :func:`exact_pow2`."""
    return f"CAST((CAST(1 AS BIGINT) << ({expr})) AS DOUBLE)"
