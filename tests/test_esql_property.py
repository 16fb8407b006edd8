"""Property-based check of the ES|QL expression compiler: randomly
generated arithmetic/boolean/conditional expressions must evaluate
identically in the compiled Catalyst plan and a direct Python
evaluator over the same rows."""
from __future__ import annotations

import math

import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
except ImportError:                                  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from elasticsearch_osmosis_plugin_spark.operators.esql import esql

ROWS = [(1, 2.5), (-3, 0.5), (7, -1.25), (0, 4.0), (12, -6.5)]


def num_expr(depth):
    """-> strategy of (esql_text, python_fn) numeric expressions over
    integer column x and double column y."""
    leaf = st.one_of(
        st.integers(-9, 9).map(lambda v: (str(v), lambda x, y, v=v: v)),
        st.just(("x", lambda x, y: x)),
        st.just(("y", lambda x, y: y)),
    )
    if depth <= 0:
        return leaf

    sub = num_expr(depth - 1)

    def combine(op):
        def mk(pair):
            (ta, fa), (tb, fb) = pair
            if op == "+":
                return (f"({ta} + {tb})",
                        lambda x, y: fa(x, y) + fb(x, y))
            if op == "-":
                return (f"({ta} - {tb})",
                        lambda x, y: fa(x, y) - fb(x, y))
            return (f"({ta} * {tb})",
                    lambda x, y: fa(x, y) * fb(x, y))
        return st.tuples(sub, sub).map(mk)

    unary = sub.map(lambda p: (f"ABS({p[0]})",
                               lambda x, y, f=p[1]: abs(f(x, y))))
    case = st.tuples(bool_expr(0), sub, sub).map(
        lambda t: (f"CASE({t[0][0]}, {t[1][0]}, {t[2][0]})",
                   lambda x, y, c=t[0][1], a=t[1][1], b=t[2][1]:
                   a(x, y) if c(x, y) else b(x, y)))
    return st.one_of(leaf, combine("+"), combine("-"), combine("*"),
                     unary, case)


def bool_expr(depth):
    cmp_ops = {
        "==": lambda a, b: a == b, "!=": lambda a, b: a != b,
        "<": lambda a, b: a < b, "<=": lambda a, b: a <= b,
        ">": lambda a, b: a > b, ">=": lambda a, b: a >= b,
    }
    base = st.tuples(num_expr(max(depth - 1, 0)),
                     st.sampled_from(sorted(cmp_ops)),
                     num_expr(max(depth - 1, 0))).map(
        lambda t: (f"({t[0][0]} {t[1]} {t[2][0]})",
                   lambda x, y, fa=t[0][1], op=cmp_ops[t[1]], fb=t[2][1]:
                   op(fa(x, y), fb(x, y))))
    if depth <= 0:
        return base
    sub = bool_expr(depth - 1)
    both = st.tuples(sub, sub, st.sampled_from(["AND", "OR"])).map(
        lambda t: (f"({t[0][0]} {t[2]} {t[1][0]})",
                   lambda x, y, fa=t[0][1], fb=t[1][1], k=t[2]:
                   (fa(x, y) and fb(x, y)) if k == "AND"
                   else (fa(x, y) or fb(x, y))))
    neg = sub.map(lambda p: (f"NOT {p[0]}",
                             lambda x, y, f=p[1]: not f(x, y)))
    return st.one_of(base, both, neg)


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(ROWS, "x long, y double")


def _close(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, bool) or isinstance(b, bool):
        return bool(a) == bool(b)
    return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-9)


@settings(max_examples=60, deadline=None)
@given(num_expr(3))
def test_numeric_expressions_match_python(spark, frame, expr):
    text, fn = expr
    got = [r["v"] for r in
           esql(spark, f"FROM t | EVAL v = {text} | KEEP v | SORT v "
                       "NULLS FIRST", {"t": frame}).collect()]
    want = sorted((fn(x, y) for x, y in ROWS), key=float)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert _close(g, w), (text, got, want)


@settings(max_examples=60, deadline=None)
@given(bool_expr(2))
def test_boolean_expressions_match_python(spark, frame, expr):
    text, fn = expr
    got = esql(spark, f"FROM t | WHERE {text} | STATS n = COUNT(*)",
               {"t": frame}).collect()[0]["n"]
    want = sum(1 for x, y in ROWS if fn(x, y))
    assert got == want, text
