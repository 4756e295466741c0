"""Computation-graph visualization.

The reference renders the autograd graph with graphviz (reference:
visualize.py:8-55, vendored from functional-zoo). The JAX analogue renders a
jaxpr — the traced computation — as Graphviz dot text, plus a compact
parameter-tree summary. No graphviz runtime dependency: we emit dot source;
render it with any dot tool if installed.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import numpy as np


def make_dot(fn: Callable, *example_args, max_nodes: int = 400, **kwargs) -> str:
    """Trace ``fn`` and return Graphviz dot source of its jaxpr (one node per
    primitive equation, edges along data flow). Analogue of the reference's
    ``make_dot(loss)`` autograd rendering (reference: visualize.py:8)."""
    jaxpr = jax.make_jaxpr(fn, **kwargs)(*example_args)
    lines = [
        "digraph jaxpr {",
        '  node [shape=box, style=filled, fillcolor="lightblue", fontsize=10];',
    ]
    names: dict[str, str] = {}

    def nid(var) -> str:
        key = str(id(var))
        if key not in names:
            names[key] = f"v{len(names)}"
        return names[key]

    for i, invar in enumerate(jaxpr.jaxpr.invars):
        lines.append(
            f'  {nid(invar)} [label="in{i}\\n{invar.aval.str_short()}", '
            'fillcolor="palegreen"];'
        )
    for i, eqn in enumerate(jaxpr.jaxpr.eqns[:max_nodes]):
        eid = f"e{i}"
        lines.append(f'  {eid} [label="{eqn.primitive.name}"];')
        for v in eqn.invars:
            if hasattr(v, "aval") and str(id(v)) in names:
                lines.append(f"  {nid(v)} -> {eid};")
        for v in eqn.outvars:
            lines.append(
                f'  {nid(v)} [label="{v.aval.str_short()}", fillcolor="white"];'
            )
            lines.append(f"  {eid} -> {nid(v)};")
    if len(jaxpr.jaxpr.eqns) > max_nodes:
        lines.append(f'  trunc [label="... {len(jaxpr.jaxpr.eqns) - max_nodes} more eqns"];')
    for i, outvar in enumerate(jaxpr.jaxpr.outvars):
        if hasattr(outvar, "aval") and str(id(outvar)) in names:
            lines.append(f'  {nid(outvar)} [fillcolor="lightsalmon"];')
    lines.append("}")
    return "\n".join(lines)


def param_summary(params: Any) -> str:
    """Human-readable parameter-tree table (analogue of printing the
    reference nn.Module, train_script.py:34-36)."""
    rows = []
    total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        total += n
        rows.append(f"  {name:<24} {str(tuple(leaf.shape)):<20} {n:>10,}")
    header = f"{'parameter':<26} {'shape':<20} {'count':>10}"
    return "\n".join([header, *rows, f"  {'total':<24} {'':<20} {total:>10,}"])
