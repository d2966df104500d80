"""Expression-level let-binding for higher-order-function bodies.

The Catalyst cost model this exists for (verify SKILL.md; measured twice
in this repo): a NON-ATTRIBUTE expression referenced inside a per-element
lambda is RE-EVALUATED on every element — higher-order functions evaluate
their *arguments* once per row, but their lambda *bodies* are interpreted
per element, and any full subtree referenced there (a tokenization, an
``array_sort``) runs again each time. That turns linear array builders
quadratic: ``transform(sequence(0, n), i -> slice(TOKS_EXPR, i+1, k))``
re-tokenizes the document once per shingle offset (measured ~19× slower at
1000-token docs, and growing with doc length). Staging the array in its
own projection fixes the normal path but NOT the pushed-down copy:
``InferFiltersFromGenerate`` + filter pushdown re-inline the staged
expression below the projection boundary (measured: hung a 5000-doc
partition in a plain ``explode``'s inferred filter).

``let`` closes both holes at the expression level: bind the subtree as a
single-element ``transform`` lambda variable, so every reference inside
the body — however deeply nested in per-element lambdas, and wherever the
optimizer moves the expression — is a NamedLambdaVariable lookup, and the
bound subtree evaluates exactly once per row.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let(bound: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``bound`` once per row and pass it to ``body`` as a lambda
    variable: ``let(x, f) == f(x)`` by value, but ``x`` is computed exactly
    once no matter how many times (or how deep inside per-element lambdas)
    ``body`` references it. Implemented as a single-element
    ``transform(array(bound), body)`` — the wrapper array costs one struct
    per row. A NULL ``bound`` is passed to ``body`` as NULL (same
    null-propagation a direct reference would see)."""
    return F.element_at(F.transform(F.array(bound), body), 1)
