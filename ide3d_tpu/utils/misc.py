"""Small runtime utilities (the reference's torch_utils/misc.py analogues that still
make sense in a functional JAX codebase)."""

from __future__ import annotations

from typing import Iterable, Optional, Sequence


class EasyDict(dict):
    """Attribute-access dict (contract: dnnlib/util.py:46)."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value

    def __delattr__(self, name):
        del self[name]


def assert_shape(x, ref_shape: Sequence[Optional[int]]):
    """Shape assertion with None wildcards (contract: torch_utils/misc.py:82).
    Static-only: runs at trace time, free at runtime."""
    if x.ndim != len(ref_shape):
        raise AssertionError(f"Wrong number of dims: got {x.ndim}, expected {len(ref_shape)}")
    for i, (size, ref) in enumerate(zip(x.shape, ref_shape)):
        if ref is not None and size != ref:
            raise AssertionError(f"Wrong size for dim {i}: got {size}, expected {ref}")


def named_params(tree, prefix: str = "") -> Iterable[tuple]:
    """Flatten a params dict into (dotted_name, leaf) pairs — the naming convention
    the torch-pickle importer maps against (torch_utils/misc.py:151)."""
    if isinstance(tree, dict):
        for k in sorted(tree.keys()):
            yield from named_params(tree[k], f"{prefix}{k}." if prefix or k else k)
    else:
        yield prefix.rstrip("."), tree
