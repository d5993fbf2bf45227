"""YAML import/export of scalar parameter/solution mappings.

Matches the reference file layout (``chsimpy/parameters.py:69-101``,
``chsimpy/solution.py:69-96``): an explicit-start document tagged
``!Parameters`` / ``!Solution`` with one scalar per line.  Implemented on
PyYAML; reading accepts both our files and reference-written ones (including
the ``!numpy.float64`` and ``!ndarray`` tags — the latter parsed with
``ast.literal_eval``, never ``eval``, fixing the reference's unsafe loader,
``chsimpy/utils.py:61-64``).
"""

from __future__ import annotations

import ast

import numpy as np
import yaml as _yaml


class _RefLoader(_yaml.SafeLoader):
    pass


def _construct_mapping_tag(loader, node):
    return loader.construct_mapping(node, deep=True)


def _construct_npfloat(loader, node):
    return float(loader.construct_scalar(node))


def _construct_ndarray(loader, node):
    text = loader.construct_scalar(node).replace('\n', '')
    return np.array(ast.literal_eval(text))


for tag in ('!Parameters', '!Solution'):
    _RefLoader.add_constructor(tag, _construct_mapping_tag)
_RefLoader.add_constructor('!numpy.float64', _construct_npfloat)
_RefLoader.add_constructor('!ndarray', _construct_ndarray)


def import_scalars(fname: str) -> dict:
    with open(fname, 'r') as f:
        data = _yaml.load(f, Loader=_RefLoader)
    if not isinstance(data, dict):
        raise ValueError(f"{fname}: expected a YAML mapping")
    return data


class _TagDumper(_yaml.SafeDumper):
    pass


def export_scalars(fname: str, mapping: dict, tag: str) -> None:
    clean = {}
    for k, v in sorted(mapping.items()):
        if isinstance(v, np.floating):
            v = float(v)
        elif isinstance(v, np.integer):
            v = int(v)
        elif isinstance(v, tuple):
            v = list(v)
        clean[k] = v
    body = _yaml.dump(clean, Dumper=_TagDumper, default_flow_style=False,
                      width=1000)
    with open(fname, 'w') as f:
        f.write(f"--- !{tag}\n")
        f.write(body)
