"""Engine-portable numeric kernels (the float cousin of text.poly_hash).

The repo's oracle discipline needs doubles that agree BIT-FOR-BIT
between the JVM (Spark) and DuckDB. IEEE-754 guarantees that for
+, -, *, / and decimal-literal parsing — but NOT for libm
transcendentals: Java's ``Math.log`` and DuckDB's C-library ``log``
are each allowed sub-ulp slack and can disagree in the last bit, so a
query whose output hash folds thousands of ``ln`` evaluations would be
probabilistically red. The fix is the same one poly_hash uses for
strings: pin the SEMANTICS to a portable formula built only from
guaranteed-exact operations, and declare that formula — not libm —
the operator's contract.

``pln_sql`` emits ONE dialect-common SQL string (valid verbatim in
both Spark SQL and DuckDB) computing

    pln(k) = e*ln2 + 2*t*P(t^2)          for integer k >= 1,

where e = bitlength(k)-1 (via ``length(bin(k)) - 1`` — exact integer
path, no float log), m = k / 2^e in [1, 2) (division by an exact
power of two: exact), t = (m-1)/(m+1) in [0, 1/3), and P is the
atanh-series Horner polynomial 1 + u/3 + u^2/5 + ... + u^9/19
(u = t^2). Every literal is ``CAST(… AS DOUBLE)`` — bare decimal
literals parse as DECIMAL in both engines and DECIMAL division
truncates differently (measured: ~1e-9 drift), which is why the casts
are load-bearing. Truncation starts at the dropped 2t*u^10/21 term,
~9e-12 absolute at the t -> 1/3 interval edge (k = 2^n - 1, the worst
inputs — a sqrt(2)-centered range reduction would shrink t to 0.172
but costs an extra portable branch; not worth it at this accuracy);
measured against ``math.log`` over k in 1..200000 plus values near
2^53: worst RELATIVE error 1.68e-12 (at k=127), and Spark-vs-DuckDB
BIT-MISMATCHES: 0 — bit-identity, the load-bearing contract, is
unconditional on accuracy.

Domain: 1 <= k < 2^53 (k must convert to double exactly; bigger
counts would round before the polynomial ever runs). That bound is
per-COUNT, not per-product — the point of log-space scoring is that
no cross-product of counts is ever materialized.
"""

from __future__ import annotations

#: Correctly-rounded double literal of ln(2); parsed identically by
#: Spark, DuckDB, and Python strtod.
LN2_LITERAL = "0.6931471805599453"

#: atanh-series denominators, Horner order (innermost first).
_ATANH_DENOMS = (17, 15, 13, 11, 9, 7, 5, 3)


def _d(s: str) -> str:
    return f"CAST({s} AS DOUBLE)"


def pln_sql(inner: str) -> str:
    """Dialect-common SQL for pln(inner); ``inner`` must be an integer
    expression >= 1 (and < 2^53). The returned string is valid in both
    Spark SQL (``F.expr``) and DuckDB — using the SAME text on both
    sides makes bit-identity a construction property, not a test
    outcome. Intended for TINY relations (vocab tables, 1-row totals):
    the expression inlines ``inner`` ~80x, so feed it a materialized
    column, never a per-row fold."""
    e = f"(length(bin({inner})) - 1)"
    m = f"({_d(inner)} / pow({_d('2')}, {e}))"
    t = f"(({m} - {_d('1')}) / ({m} + {_d('1')}))"
    u = f"({t} * {t})"
    p = f"({_d('1')}/{_d('19')})"
    for den in _ATANH_DENOMS:
        p = f"({_d('1')}/{_d(str(den))} + {u} * {p})"
    p = f"({_d('1')} + {u} * {p})"
    return (
        f"(CAST({e} AS DOUBLE) * CAST({LN2_LITERAL} AS DOUBLE)"
        f" + {_d('2')} * {t} * {p})"
    )


def pln_py(k: int) -> float:
    """Pure-Python mirror of pln_sql — the same IEEE op sequence on
    Python floats (which are IEEE doubles), so it is bit-identical to
    both engines; used by the mirror tests."""
    if k < 1:
        raise ValueError(f"pln domain is k >= 1, got {k}")
    if k >= 1 << 53:
        raise ValueError(f"pln domain is k < 2^53, got {k}")
    e = k.bit_length() - 1
    m = float(k) / pow(2.0, float(e))
    t = (m - 1.0) / (m + 1.0)
    u = t * t
    p = 1.0 / 19.0
    for den in _ATANH_DENOMS:
        p = 1.0 / float(den) + u * p
    p = 1.0 + u * p
    return float(e) * float(LN2_LITERAL) + 2.0 * t * p
