"""Analytic FLOP counting by jaxpr traversal.

XLA's `compiled.cost_analysis()` under-reports through the axon relay
backend (observed ~15x low on the train step), so MFU numbers are
computed from first principles instead: walk the jaxpr and count
2*MACs for every `conv_general_dilated` and `dot_general`, recursing
into scan/while/cond/pjit sub-jaxprs (scan bodies multiply by trip
count). Elementwise FLOPs are ignored — on TPU they are not the
resource MFU measures.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import numpy as np


def _dot_general_flops(eqn) -> float:
  lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
  (lhs_contract, _), (lhs_batch, _) = eqn.params['dimension_numbers']
  batch = math.prod(lhs.shape[d] for d in lhs_batch)
  contract = math.prod(lhs.shape[d] for d in lhs_contract)
  lhs_rest = math.prod(lhs.shape) // max(batch * contract, 1)
  rhs_rest = math.prod(rhs.shape) // max(batch * contract, 1)
  return 2.0 * batch * contract * lhs_rest * rhs_rest


def _conv_flops(eqn) -> float:
  out = eqn.outvars[0].aval
  rhs = eqn.invars[1].aval  # kernel
  dn = eqn.params['dimension_numbers']
  # Kernel: spatial dims x in-features-per-group; the kernel's input dim
  # is already in/groups, so kernel_elems/out_features IS the per-output
  # MAC count — no further division by the group count.
  kernel_elems = math.prod(rhs.shape)
  out_features = rhs.shape[dn.rhs_spec[0]]
  macs_per_output = kernel_elems / max(out_features, 1)
  return 2.0 * math.prod(out.shape) * macs_per_output


def _jaxpr_flops(jaxpr) -> float:
  total = 0.0
  for eqn in jaxpr.eqns:
    prim = eqn.primitive.name
    if prim == 'dot_general':
      total += _dot_general_flops(eqn)
    elif prim == 'conv_general_dilated':
      total += _conv_flops(eqn)
    elif prim == 'scan':
      body = eqn.params['jaxpr'].jaxpr
      total += eqn.params['length'] * _jaxpr_flops(body)
    elif prim == 'while':
      # Trip count unknown statically; count one body iteration.
      total += _jaxpr_flops(eqn.params['body_jaxpr'].jaxpr)
    elif prim == 'cond':
      branches = [b.jaxpr for b in eqn.params['branches']]
      total += max((_jaxpr_flops(b) for b in branches), default=0.0)
    else:
      for key in ('jaxpr', 'call_jaxpr'):
        sub = eqn.params.get(key) if hasattr(eqn, 'params') else None
        if sub is not None:
          total += _jaxpr_flops(sub.jaxpr if hasattr(sub, 'jaxpr') else sub)
          break
  return total


def count_flops(fn, *args, **kwargs) -> float:
  """Returns matmul+conv FLOPs (2*MACs) of one `fn(*args)` call."""
  jaxpr = jax.make_jaxpr(fn, **kwargs)(*args)
  return _jaxpr_flops(jaxpr.jaxpr)
