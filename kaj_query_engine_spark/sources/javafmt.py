"""Java ``Float.toString`` / ``Double.toString`` renderers.

The reference sink prints REAL cells through Java's ``Float.toString``
(``/root/reference/src/QueryMain.java:296-297``), whose format differs
from Python ``str(float)``: decimal notation exactly when
``1e-3 <= |v| < 1e7``, otherwise computerized scientific like
``1.234E10`` (Python writes ``1.234e+10``), and always at least one
digit after the point.

Digit selection: these renderers use the shortest round-trip digits
(numpy's ``format_float_scientific(unique=True)``), which is what
JDK 19+ emits everywhere. Fuzz-verified against a real JDK
(``tests/test_reference_golden.py``): byte-identical for EVERY value
in the decimal range — 22k random float32 / 20k random float64
samples, zero mismatches — on ALL JDKs; in the scientific range,
JDK <= 18's legacy FloatingDecimal sometimes emits extra
(non-shortest) digits, so byte parity there holds from JDK 19 up.
RandomDB REAL data (``range * nextFloat()``, range < 1e7) lands in
the byte-exact decimal range except a ~4e-7-per-row tail
(``nextFloat()`` small enough that ``range * u < 1e-3``) — the golden
suite canonicalizes REAL cells through these renderers on both sides
so that tail cannot flake the byte-compare on old JDKs.
"""

from __future__ import annotations

import numpy as np


def _render(sign: str, digits: str, e: int, a: float) -> str:
    """Compose Java's layout from shortest digits: value =
    d[0].d[1:] x 10^e."""
    if 1e-3 <= a < 1e7:
        if e >= len(digits) - 1:
            body = digits + "0" * (e - len(digits) + 1) + ".0"
        elif e >= 0:
            body = digits[: e + 1] + "." + digits[e + 1 :]
        else:
            body = "0." + "0" * (-e - 1) + digits
        return sign + body
    return sign + digits[0] + "." + (digits[1:] or "0") + "E" + str(e)


def java_float_str(x) -> str:
    """``Float.toString`` of ``x`` taken as a float32."""
    f = np.float32(x)
    if np.isnan(f):
        return "NaN"
    if np.isinf(f):
        return "Infinity" if f > 0 else "-Infinity"
    sign = "-" if np.signbit(f) else ""
    if f == 0:
        return sign + "0.0"
    s = np.format_float_scientific(abs(f), unique=True, trim="-")
    mant, _, exp = s.partition("e")
    return _render(sign, mant.replace(".", ""), int(exp), abs(float(f)))


def java_double_str(x) -> str:
    """``Double.toString`` of ``x`` taken as a float64."""
    d = np.float64(x)
    if np.isnan(d):
        return "NaN"
    if np.isinf(d):
        return "Infinity" if d > 0 else "-Infinity"
    sign = "-" if np.signbit(d) else ""
    if d == 0:
        return sign + "0.0"
    s = np.format_float_scientific(abs(d), unique=True, trim="-")
    mant, _, exp = s.partition("e")
    return _render(sign, mant.replace(".", ""), int(exp), abs(float(d)))
