"""A fidelity stub of uproot's WRITING API for bridge tests.

uproot is not installable in this environment (zero egress), so the ROOT
bridges (tools/convert_root.py in, tools/convert_wf_to_root.py out) meet the
real library for the first time in production. This stub narrows that risk by
enforcing the real ``uproot.writing.WritableDirectory`` call-shape and input
constraints instead of accepting anything:

- ``uproot.recreate(path)`` -> writable directory, usable as a context
  manager (matches uproot 5.x).
- ``f[name] = dict`` writes a TTree. Enforced like real uproot:
  * the dict must be non-empty (real uproot raises on an empty mapping
    because it cannot infer a tree),
  * keys must be strings (branch names),
  * every branch must have the SAME number of entries (uproot raises
    ValueError "branches must have the same lengths"),
  * a branch is either a numpy array (first axis = entries; trailing axes =
    fixed-size leaf dims) or a list/tuple of per-entry variable-length numpy
    arrays (what real uproot accepts only when ``awkward`` is importable —
    the stub records the jagged structure the way awkward would).
- ``f[name] = (values, edges[, edges2...])`` writes a TH1/TH2 from
  np.histogram-style output. Enforced: len(edges) == values.shape[axis] + 1
  per axis, edges strictly increasing.
- ``f.mktree(name, branch_types)`` + ``tree.extend(arrays)`` — the chunked
  writing path (uproot's recommended API for big trees). Enforced: extend's
  keys must exactly match the declared branch types, lengths equal.

Tests assert through ``FakeWritableFile.written`` / ``.trees`` exactly as
before; the added value is that an API misuse in the bridge now fails HERE
instead of on the first machine with real uproot.
"""
from __future__ import annotations

import sys
import types

import numpy as np


def _entry_len(branch, name):
    if isinstance(branch, np.ndarray):
        if branch.ndim == 0:
            raise TypeError(
                f"branch {name!r}: scalars cannot be written; uproot needs "
                "an array with an entry axis")
        return branch.shape[0], False
    if isinstance(branch, (list, tuple)):
        for row in branch:
            if not isinstance(row, np.ndarray) or row.ndim != 1:
                raise TypeError(
                    f"branch {name!r}: jagged input must be a sequence of "
                    "1-D numpy arrays (real uproot routes this through "
                    "awkward.from_iter)")
        return len(branch), True
    raise TypeError(
        f"branch {name!r}: unsupported type {type(branch).__name__}; real "
        "uproot accepts numpy arrays, awkward arrays, or sequences of "
        "arrays (with awkward installed)")


def _validate_tree(mapping, where):
    if not mapping:
        raise ValueError(
            f"cannot write an empty dict to {where!r}: real uproot cannot "
            "infer a TTree with zero branches")
    lengths = {}
    jagged = {}
    for name, branch in mapping.items():
        if not isinstance(name, str):
            raise TypeError(f"branch names must be str, got {name!r}")
        n, is_jagged = _entry_len(branch, name)
        lengths[name] = n
        jagged[name] = is_jagged
    if len(set(lengths.values())) > 1:
        raise ValueError(
            f"cannot write TTree {where!r}: branches must have the same "
            f"lengths, got {lengths}")
    return jagged


def _validate_hist(value, where):
    values = np.asarray(value[0])
    all_edges = value[1:]
    if values.ndim != len(all_edges):
        raise ValueError(
            f"histogram {where!r}: {values.ndim}-D values need "
            f"{values.ndim} edge arrays, got {len(all_edges)}")
    for axis, edges in enumerate(all_edges):
        edges = np.asarray(edges)
        if edges.ndim != 1 or edges.shape[0] != values.shape[axis] + 1:
            raise ValueError(
                f"histogram {where!r} axis {axis}: need "
                f"{values.shape[axis] + 1} bin edges, got {edges.shape}")
        if not np.all(np.diff(edges) > 0):
            raise ValueError(
                f"histogram {where!r} axis {axis}: bin edges must be "
                "strictly increasing")


class FakeWritableTree:
    """The object ``mktree`` returns; accepts chunked ``extend`` calls."""

    def __init__(self, name, branch_types):
        if not branch_types:
            raise ValueError("mktree needs at least one branch type")
        self.name = name
        self.branch_types = dict(branch_types)
        self.chunks = []

    def extend(self, arrays):
        if set(arrays) != set(self.branch_types):
            raise ValueError(
                f"extend must provide exactly the declared branches "
                f"{sorted(self.branch_types)}, got {sorted(arrays)}")
        _validate_tree(arrays, self.name)
        self.chunks.append({k: np.asarray(v) if isinstance(v, np.ndarray)
                            else v for k, v in arrays.items()})


class FakeWritableFile:
    def __init__(self, path=""):
        self.path = path
        self.written = {}
        self.jagged = {}     # tree name -> {branch: bool}
        self.trees = {}      # mktree-created trees
        self._closed = False

    def __setitem__(self, key, value):
        if self._closed:
            raise OSError("file is closed")
        if isinstance(value, dict):
            self.jagged[key] = _validate_tree(value, key)
        elif isinstance(value, tuple):
            _validate_hist(value, key)
        else:
            raise TypeError(
                f"cannot write {type(value).__name__} to {key!r}: the stub "
                "models dict->TTree and (values, edges...)->TH1 only")
        self.written[key] = value

    def mktree(self, name, branch_types, title=""):
        tree = FakeWritableTree(name, branch_types)
        self.trees[name] = tree
        self.written[name] = tree
        return tree

    def close(self):
        self._closed = True

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()
        return False


def install_stub(monkeypatch):
    """Install the stub as sys.modules['uproot']; returns {path: file}."""
    files = {}

    def recreate(path, **kwargs):
        f = FakeWritableFile(str(path))
        files[str(path)] = f
        return f

    stub = types.ModuleType("uproot")
    stub.recreate = recreate
    stub.__stub__ = True
    monkeypatch.setitem(sys.modules, "uproot", stub)
    return files
