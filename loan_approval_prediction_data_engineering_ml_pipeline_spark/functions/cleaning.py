"""Scalar cleaning expressions — the reference's ad-hoc row functions
re-expressed as Catalyst column expressions (SURVEY.md §2.6). No Python
UDFs are needed for parity: every reference cleaning step is built-in.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def domain_rewrite(col: Column | str, mapping: dict[str, str]) -> Column:
    """F1: conditional string rewrite ('3+' -> '3', LP.ipynb:679)."""
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for old, new in mapping.items():
        expr = F.when(c == old, new) if expr is None else expr.when(c == old, new)
    return expr.otherwise(c) if expr is not None else c


def cast_with_null_fallback(col: Column | str, dtype: str = "double") -> Column:
    """F2/F5: cast that yields null on unparseable input, matching the
    reference's own inference path (clean_dependents_input, app.py:42-48).

    ``try_cast``, not ``cast``: Spark 4 runs ANSI mode by default, where a
    plain cast of malformed input *throws*. try_cast pins the null-on-
    error semantic regardless of the session's ANSI setting."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast(dtype)


def label_encode(col: Column | str, mapping: dict[str, int]) -> Column:
    """F3: dict-map label encode (Loan_Status {'Y':1,'N':0}, LP.ipynb:814);
    unmatched values -> null, as pandas .map does."""
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for k, v in mapping.items():
        expr = F.when(c == k, v) if expr is None else expr.when(c == k, v)
    return expr


def clean_dependents(col: Column | str) -> Column:
    """The app.py:42-48 defensive parse: '3+' -> 3, else int(x), else null
    (try_cast: null-on-error even under ANSI mode)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c == "3+", F.lit(3)).otherwise(c.try_cast("int"))


def nan_to_null(col: Column | str) -> Column:
    """F6: float-NaN -> SQL NULL (the reference's np.nan -> None scrub,
    MY.ipynb:37-41; Spark needs it only for literal NaN doubles)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.nanvl(c, F.lit(None).cast("double"))
