"""Whole-stage-codegen staging barrier.

Catalyst's ``CollapseProject`` merges adjacent projections by textual
substitution: a column computed in one ``select`` and referenced k
times in the next is inlined k times into a single fused expression
tree.  For cheap expressions that is exactly right (one codegen stage,
no materialization); for the repo's big integer-exact trees — the
page-generator mention arithmetic, the hexgrid cube-rounding cascade —
the substitution is *exponential in pipeline depth*, and once the
fused tree passes Janino's 64 KB per-method bytecode limit Spark
silently falls back to interpreted expression evaluation
(`ERROR CodeGenerator ... Code grows beyond 64 KB`).  Correct, still
JVM-side, but the constant factor is paid on exactly the scan stages
where 100-TB hours go (round-3 exit sweep: 12 such fallbacks,
flagship included — BENCH/SWEEP_r03c.log).

``stage(df, *cols)`` is the fix: a projection whose outputs are
attributes of a ``Generate(Inline(array(struct(...))))`` node.
Generate is not a Project, so ``CollapseProject`` cannot merge through
it — every aliased expression is evaluated exactly once per row and
downstream stages reference a cheap attribute.  The barrier is still
row-local scan-stage work (Inline of a 1-element array emits exactly
one row per input row, pipelined, nothing materialized, no shuffle,
no exchange), and both sides of the barrier whole-stage-codegen
independently.

Cost model and a hard limit (measured, not theoretical): the whole
``array(struct(...))`` payload is ONE expression, and a single
expression codegens into a single Java method that ``splitExpressions``
cannot cut — a barrier whose payload tree is itself huge (e.g. the
full page-generator prose, ~1.4 MB of generated code) trades the
collapse problem for an unsplittable-method problem.  Use ``stage``
only when every struct field's own tree is modest (the hexgrid
fractional-axial step: ~35 nodes/field).  For large producers,
prefer plain chained ``select``s and lean on Catalyst's cost-aware
``CollapseProject`` (Spark 3.2+): a non-cheap expression referenced
MORE THAN ONCE by the consumer is never re-inlined, so aliasing the
big tree once and referencing it >= 2 times downstream keeps the
plan split AND lets ProjectExec split per-column methods
(sources/generate.py documents the worked example).  A producer
referenced exactly once WILL be inlined — if that single fused copy
is too big, shrink the expression itself by hoisting its
multi-referenced subtrees into an earlier projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stage(df: DataFrame, *cols: Column | str) -> DataFrame:
    """Project ``cols`` through a Generate barrier so each expression
    is computed exactly once and ``CollapseProject`` cannot re-inline
    it into downstream expression trees.

    Every non-string column must carry an ``.alias`` (struct fields
    name the output columns).  Equivalent to ``df.select(*cols)`` in
    values, schema, and row order.
    """
    named = [F.col(c) if isinstance(c, str) else c for c in cols]
    return df.select(F.inline(F.array(F.struct(*named))))
