"""Expression let-binding for Catalyst.

Column expressions have no local variables: when CollapseProject or
predicate pushdown inlines a derived column, every reference duplicates
the whole expression tree — and each copy is re-evaluated at runtime
(codegen subexpression elimination only dedupes within one operator, and
giant duplicated trees fall out of codegen entirely). For expensive
scalars (``from_json`` of a WAT envelope, the eTLD+1 when-chain, URL
parses) this turned the extraction hot path into re-parsing the same
JSON hundreds of times per row (measured: 627 ``from_json`` copies in
one executed plan; 6× wall-clock).

``bind_once`` wraps the expression as ``shuffle(array(col))[0]`` — a
single-element shuffle is the identity, but ``shuffle`` is
nondeterministic, and nondeterministic aliases are exactly what Catalyst
refuses to inline or push predicates through. Downstream operators then
reference the column as a plain attribute: one evaluation per row, at
the Project that defines it. (A ``rand() > -1`` guard does NOT work —
the optimizer constant-folds provably-true comparisons on rand's value
range and the barrier silently vanishes.)

Contract: cheap filters that SHOULD reach the storage scan must be
applied *before* the binding Project — nothing pushes through it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bind_once(col: Column) -> Column:
    return F.element_at(F.shuffle(F.array(col)), 1)
