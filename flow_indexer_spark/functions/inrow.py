"""In-row expression helpers: common-subexpression binding for lambda
bodies.

Spark evaluates a higher-order function's INPUT once per row, but any
outer (non-lambda-variable) expression referenced inside the lambda BODY
is inlined and re-evaluated per element — there is no hoisting across
the lambda boundary. An expression like::

    F.transform(idx, lambda i: F.element_at(tokens(text), i))

re-runs the whole split/filter per index: O(len^2) per row instead of
O(len). Measured on the bigram builder at sf0.1: 7.3 s -> 0.7 s for one
count over 5,000 docs once the token array was bound.

:func:`bind` is the collapse-proof fix: it wraps the expensive
expression as the single element of an array that becomes a
``transform``'s input — evaluated exactly once per row by construction
(Catalyst cannot inline it back into the body, unlike a projected alias
column which CollapseProject may re-inline) — and hands it to the
builder as a cheap lambda-variable reference.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, functions as F


def bind(expr: Column, build: Callable[[Column], Column]) -> Column:
    """Evaluate ``expr`` once per row and pass it as a lambda variable to
    ``build``. Works for any element type (scalar or array): the value
    rides as the single element of a one-element array."""
    return F.get(F.transform(F.array(expr), build), 0)
