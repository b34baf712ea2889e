"""Analytic FLOP counting from a traced jaxpr.

XLA's `lowered.cost_analysis()` is the first choice for MFU reporting, but
it returns None on some backends (the sandbox's relay-attached TPU client
among them). This walks the jaxpr instead and counts matmul/conv FLOPs with
the same 2x-MAC convention XLA uses, recursing into scan (x trip count),
while/cond bodies, pjit, custom-diff wrappers, and pallas_call grids.

Elementwise/reduction ops are NOT counted, so the result is a lower bound —
for matmul-dominated models (this one) it lands within a few percent of
XLA's own estimate (pinned by tests/test_flops.py against
cost_analysis on the CPU backend).
"""

from __future__ import annotations

import jax


def _prod(xs) -> int:
    out = 1
    for x in xs:
        out *= int(x)
    return out


def _dot_general_flops(eqn) -> int:
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    lhs = eqn.invars[0].aval.shape
    rhs = eqn.invars[1].aval.shape
    batch = _prod(lhs[i] for i in lb)
    k = _prod(lhs[i] for i in lc)
    m = _prod(lhs[i] for i in range(len(lhs)) if i not in set(lc) | set(lb))
    n = _prod(rhs[i] for i in range(len(rhs)) if i not in set(rc) | set(rb))
    return 2 * batch * m * n * k


def _conv_flops(eqn) -> int:
    dn = eqn.params["dimension_numbers"]
    rhs = eqn.invars[1].aval.shape
    out = eqn.outvars[0].aval.shape
    # rhs_spec[0] is the output-feature dim; everything else in the kernel
    # (spatial x Cin/feature_group_count) multiplies into every output
    # element, so grouping is already reflected in the kernel shape.
    c_out = rhs[dn.rhs_spec[0]]
    macs_per_out = _prod(rhs) // c_out
    return 2 * _prod(out) * macs_per_out


# Higher-order primitives → (param key holding the sub-jaxpr, multiplier fn).
def _sub_jaxprs(eqn):
    """Yield (jaxpr, multiplier) pairs for a higher-order primitive."""
    name = eqn.primitive.name
    p = eqn.params
    if name == "scan":
        yield p["jaxpr"], int(p["length"])
    elif name == "while":
        # Trip count is dynamic; count one iteration (lower bound) plus the
        # condition once. NMS/fori loops here are FLOP-free anyway.
        yield p["body_jaxpr"], 1
        yield p["cond_jaxpr"], 1
    elif name == "cond":
        branches = p["branches"]
        # Upper-bound a data-dependent branch choice by the costliest branch.
        costs = [(_jaxpr_flops(b.jaxpr), b) for b in branches]
        if costs:
            yield max(costs, key=lambda c: c[0])[1], 1
    elif name in ("pjit", "jit"):
        yield p["jaxpr"], 1
    elif name in ("custom_jvp_call", "custom_vjp_call",
                  "custom_jvp_call_jaxpr", "custom_vjp_call_jaxpr"):
        sub = p.get("call_jaxpr") or p.get("fun_jaxpr")
        if sub is not None:
            yield sub, 1
    elif name in ("remat", "remat2", "checkpoint", "core_call", "closed_call",
                  "custom_transpose_call", "xla_call"):
        sub = p.get("jaxpr") or p.get("call_jaxpr")
        if sub is not None:
            yield sub, 1
    elif name == "pallas_call":
        gm = p.get("grid_mapping")
        grid = getattr(gm, "grid", ()) if gm is not None else ()
        try:
            mult = _prod(int(g) for g in grid) or 1
        except (TypeError, ValueError):  # dynamic grid dim
            mult = 1
        yield p["jaxpr"], mult
    elif name == "shard_map":
        yield p["jaxpr"], 1


def _as_jaxpr(j):
    return getattr(j, "jaxpr", j)  # ClosedJaxpr → Jaxpr


def _jaxpr_flops(jaxpr) -> int:
    total = 0
    for eqn in _as_jaxpr(jaxpr).eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += _dot_general_flops(eqn)
        elif name == "conv_general_dilated":
            total += _conv_flops(eqn)
        else:
            for sub, mult in _sub_jaxprs(eqn):
                total += mult * _jaxpr_flops(sub)
    return total


def estimate_flops(fn, *args, **kwargs) -> float:
    """Matmul+conv FLOPs of one call of `fn(*args)` (2x-MAC convention).

    Traces with jax.make_jaxpr — no compilation, works on any backend.
    """
    jaxpr = jax.make_jaxpr(fn)(*args, **kwargs)
    return float(_jaxpr_flops(jaxpr))
