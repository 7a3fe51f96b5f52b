"""Analytic model-FLOP counting by walking a function's jaxpr.

XLA's compiled cost_analysis() counts HLO-level FLOPs, which over-counts
transposed convolutions (implemented via input dilation: the dilated zeros
are billed as real MACs — ~stride x inflation on upsampling stacks). MFU by
convention uses the minimal algorithmic FLOPs, so we count primitives
ourselves:

  - dot_general: 2 * batch * M * N * K
  - conv_general_dilated: 2 * out_elems * (Cin/groups) * prod(kernel_spatial)
      / prod(lhs_dilation)   (only 1/prod(lhs_dilation) of taps are nonzero)

Control flow is handled recursively: scan multiplies by trip count, while_loop
is unbounded (counted once per iteration bound unknown -> body counted once,
flagged), pjit/custom_*/remat descend into the inner jaxpr.
"""
from __future__ import annotations

import math
from typing import Any

import jax
import numpy as np


def _prod(xs) -> int:
    out = 1
    for x in xs:
        out *= int(x)
    return out


def _dot_general_flops(eqn) -> int:
    dims = eqn.params["dimension_numbers"]
    (lc, rc), (lb, rb) = dims
    lhs = eqn.invars[0].aval.shape
    rhs = eqn.invars[1].aval.shape
    batch = _prod(lhs[i] for i in lb)
    k = _prod(lhs[i] for i in lc)
    m = _prod(lhs[i] for i in range(len(lhs)) if i not in lc and i not in lb)
    n = _prod(rhs[i] for i in range(len(rhs)) if i not in rc and i not in rb)
    return 2 * batch * m * n * k


def _conv_flops(eqn) -> int:
    dn = eqn.params["dimension_numbers"]
    groups = int(eqn.params.get("feature_group_count", 1))
    lhs_dilation = eqn.params.get("lhs_dilation") or ()
    rhs_shape = eqn.invars[1].aval.shape
    out_shape = eqn.outvars[0].aval.shape
    kernel_spatial = _prod(rhs_shape[i] for i in dn.rhs_spec[2:])
    in_ch = int(rhs_shape[dn.rhs_spec[1]])  # per-group input channels
    out_elems = _prod(out_shape)
    flops = 2 * out_elems * in_ch * kernel_spatial
    dil = _prod(lhs_dilation) if lhs_dilation else 1
    # input dilation (transposed conv): only every dil-th tap is nonzero
    return max(flops // max(dil, 1), 1)


def _jaxpr_flops(jaxpr) -> int:
    total = 0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += _dot_general_flops(eqn)
        elif name == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif name == "scan":
            inner = _jaxpr_flops(eqn.params["jaxpr"].jaxpr)
            total += inner * int(eqn.params["length"])
        elif name == "while":
            # trip count is data-dependent; count the body once (lower bound)
            total += _jaxpr_flops(eqn.params["body_jaxpr"].jaxpr)
        elif name == "cond":
            branches = [_jaxpr_flops(b.jaxpr) for b in eqn.params["branches"]]
            total += max(branches) if branches else 0
        else:
            for key in ("jaxpr", "call_jaxpr"):
                sub = eqn.params.get(key) if hasattr(eqn, "params") else None
                if sub is not None:
                    total += _jaxpr_flops(getattr(sub, "jaxpr", sub))
                    break
    return total


def count_flops(fn, *args, **kwargs) -> int:
    """Analytic matmul/conv FLOPs of one call of fn(*args, **kwargs)."""
    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    return _jaxpr_flops(closed.jaxpr)
