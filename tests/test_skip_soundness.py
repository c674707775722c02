"""Property test: data-skipping may never prune a file containing a
matching row (the ADVICE r6 soundness class — Decimal stat rounding and
cross-type coercion edges). Pure-Python harness: the generated
comparisons are exactly the ones `_coerced` declares order-sound
(same-type, Python's numeric tower, date↔timestamp pairings), where
Python's ordering equals Spark's cast semantics, so the property is
faithful without a SparkSession; everything `_coerced` maps to _KEEP is
trivially sound (the file is kept)."""

from __future__ import annotations

import datetime
import json
from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from loan_approval_prediction_data_engineering_ml_pipeline_spark.sources.versioned import (
    _SKIP_OPS,
    _file_may_match,
    _json_safe,
)

_INTS = st.integers(-10**6, 10**6)
_FLOATS = st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False)
_DECIMALS = st.decimals(
    min_value=Decimal("-9999.99"), max_value=Decimal("9999.99"), places=2
)
_STRINGS = st.text(alphabet="abc09 ", min_size=0, max_size=6)
_DATES = st.dates(datetime.date(1990, 1, 1), datetime.date(2030, 12, 31))
_DATETIMES = st.datetimes(
    datetime.datetime(1990, 1, 1), datetime.datetime(2030, 12, 31)
)

# (column-value strategy, literal strategy) pairs _coerced treats as
# order-sound; the property must hold for every one of them
_COMPARABLE = [
    (_INTS, _INTS),
    (_FLOATS, _FLOATS),
    (_INTS, _FLOATS),
    (_FLOATS, _DECIMALS),  # the ADVICE r6 Decimal-rounding class
    (_DECIMALS, _DECIMALS),
    (_DECIMALS, _FLOATS),
    (_STRINGS, _STRINGS),
    (_DATES, _DATES),
    (_DATES, _DATETIMES),  # midnight-coercion class (kept only at 00:00)
    (_DATETIMES, _DATES),
    (_DATETIMES, _DATETIMES),
]


def _spark_semantics_match(value, op: str, lit) -> bool:
    """Spark's comparison outcome for the generated pairings: dates
    promote to midnight timestamps when compared against timestamps;
    decimal-vs-double coerces BOTH sides to double (the ADVICE r7
    boundary class — Decimal('0.1') vs float 0.1 is EQUAL under Spark);
    int/float and Decimal/int compare exactly; strings compare
    lexicographically."""
    if isinstance(value, datetime.datetime) or isinstance(lit, datetime.datetime):
        if isinstance(value, datetime.date) and not isinstance(
            value, datetime.datetime
        ):
            value = datetime.datetime.combine(value, datetime.time())
        if isinstance(lit, datetime.date) and not isinstance(lit, datetime.datetime):
            lit = datetime.datetime.combine(lit, datetime.time())
    if isinstance(value, float) and isinstance(lit, Decimal):
        lit = float(lit)
    elif isinstance(lit, float) and isinstance(value, Decimal):
        value = float(value)
    return {
        "==": value == lit,
        "!=": value != lit,
        "<": value < lit,
        "<=": value <= lit,
        ">": value > lit,
        ">=": value >= lit,
    }[op]


@settings(max_examples=400, deadline=None)
@given(data=st.data())
def test_pruning_never_drops_a_matching_row(data):
    col_strat, lit_strat = data.draw(st.sampled_from(_COMPARABLE))
    values = data.draw(st.lists(col_strat, min_size=1, max_size=8))
    op = data.draw(st.sampled_from(_SKIP_OPS))
    lit = data.draw(lit_strat)
    # stats exactly as a commit records them: directional _json_safe on
    # min/max, then a JSON round-trip (the manifest storage domain)
    fstats = json.loads(
        json.dumps(
            {
                "rows": len(values),
                "min": {"c": _json_safe(min(values), toward="down")},
                "max": {"c": _json_safe(max(values), toward="up")},
                "nulls": {"c": 0},
            }
        )
    )
    any_match = any(_spark_semantics_match(v, op, lit) for v in values)
    kept = _file_may_match(fstats, [("c", op, lit)])
    if any_match:
        assert kept, (
            f"file with matching row pruned: values={values!r} {op} {lit!r} "
            f"stats={fstats['min']}/{fstats['max']}"
        )


@settings(max_examples=150, deadline=None)
@given(
    values=st.lists(_DATETIMES, min_size=1, max_size=6),
    op=st.sampled_from(_SKIP_OPS),
    lit=_DATETIMES,
    offset_h=st.integers(-14, 14),
)
def test_tz_aware_literal_always_keeps(values, op, lit, offset_h):
    """ADVICE r7 class: a tz-aware timestamp literal's ordering against
    naive stored stats depends on the session timezone, and isoformat
    would embed the offset suffix into the lexicographic comparison —
    _coerced must map it to _KEEP so the file is always retained."""
    lit = lit.replace(tzinfo=datetime.timezone(datetime.timedelta(hours=offset_h)))
    fstats = json.loads(
        json.dumps(
            {
                "rows": len(values),
                "min": {"c": _json_safe(min(values), toward="down")},
                "max": {"c": _json_safe(max(values), toward="up")},
                "nulls": {"c": 0},
            }
        )
    )
    assert _file_may_match(fstats, [("c", op, lit)])


@settings(max_examples=150, deadline=None)
@given(
    values=st.lists(_DECIMALS, min_size=1, max_size=6),
    op=st.sampled_from(_SKIP_OPS),
    lit=_DECIMALS,
)
def test_decimal_stats_widening_is_tight_enough(values, op, lit):
    """Focused regression for the float-rounding class: Decimal columns
    with Decimal literals, stats through the float-serializing JSON
    path. Soundness (never drop a match) is the invariant; the one-ulp
    widening also must not blow the range open (skips still happen)."""
    fstats = json.loads(
        json.dumps(
            {
                "rows": len(values),
                "min": {"c": _json_safe(min(values), toward="down")},
                "max": {"c": _json_safe(max(values), toward="up")},
                "nulls": {"c": 0},
            }
        )
    )
    any_match = any(_spark_semantics_match(v, op, lit) for v in values)
    kept = _file_may_match(fstats, [("c", op, lit)])
    if any_match:
        assert kept
    # tightness: a literal more than one whole unit outside the range
    # must still prune for the == case (the widening is ulp-scale)
    if op == "==" and (lit < min(values) - 1 or lit > max(values) + 1):
        assert not kept
