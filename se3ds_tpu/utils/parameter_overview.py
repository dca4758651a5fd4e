"""Parameter overview tables (reference utils/parameter_overview.py)."""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional

import jax
import numpy as np


def flatten_dict(input_dict: Dict[str, Any], *, prefix: str = '',
                 delimiter: str = '/') -> Dict[str, Any]:
  output = {}
  for key, value in input_dict.items():
    nested_key = f'{prefix}{delimiter}{key}' if prefix else key
    if isinstance(value, dict):
      output.update(flatten_dict(value, prefix=nested_key,
                                 delimiter=delimiter))
    else:
      output[nested_key] = value
  return output


def count_parameters(params) -> int:
  return sum(int(np.prod(np.shape(v)))
             for v in jax.tree_util.tree_leaves(params))


def get_params(params):
  """Returns (names, values) for a parameter tree, sorted by name
  (reference parameter_overview.py:50-54, which sorts a tf.Module's
  trainable variables; here any pytree / nested dict works)."""
  if isinstance(params, dict):
    flat = flatten_dict(params)
  else:
    flat = {str(i): v for i, v in
            enumerate(jax.tree_util.tree_leaves(params))}
  names = sorted(flat)
  return names, [np.asarray(flat[n]) for n in names]


def get_parameter_overview(params, include_stats: bool = True,
                           max_lines: Optional[int] = None) -> str:
  """ASCII table of name/shape/size[/mean/std] + total count."""
  if isinstance(params, dict):
    flat = flatten_dict(params)
  else:
    flat = {str(i): v for i, v in
            enumerate(jax.tree_util.tree_leaves(params))}
  names = sorted(flat)
  values = [np.asarray(flat[n]) for n in names]

  class _Column:

    def __init__(self, name, vals):
      self.name = name
      self.values = vals
      self.width = max([len(v) for v in vals + [name]] or [len(name)])

  columns = [
      _Column('Name', names),
      _Column('Shape', [str(v.shape) for v in values]),
      _Column('Size', [f'{int(np.prod(v.shape)):,}' for v in values]),
  ]
  if include_stats:
    columns.extend([
        _Column('Mean', [f'{v.mean():.3}' if v.size else '-'
                         for v in values]),
        _Column('Std', [f'{v.std():.3}' if v.size else '-'
                        for v in values]),
    ])
  var_line = '|' + ''.join(f' {{: <{c.width}s}} |' for c in columns)
  sep_line = var_line.replace(' ', '-').replace('|', '+')
  lines = [sep_line.format(*[''] * len(columns)),
           var_line.format(*[c.name for c in columns]),
           sep_line.format(*[''] * len(columns))]
  for i in range(len(names)):
    if max_lines and len(lines) >= max_lines - 3:
      lines.append('[...]')
      break
    lines.append(var_line.format(*[c.values[i] for c in columns]))
  lines.append(sep_line.format(*[''] * len(columns)))
  lines.append('Total: {:,}'.format(count_parameters(params)))
  return '\n'.join(lines)


def log_parameter_overview(params, msg: Optional[str] = None):
  table = get_parameter_overview(params)
  lines = ([msg] if msg else []) + table.split('\n')
  log = logging.getLogger('se3ds_tpu')
  for i in range(0, len(lines), 80):
    log.info('\n%s', '\n'.join(lines[i:i + 80]))
