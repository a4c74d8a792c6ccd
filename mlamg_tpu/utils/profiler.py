"""Nested wall-clock section profiler (role of ns/lib/profiler.py:4-52)
plus hooks into jax.profiler for device traces.

Usage:
    Profiler.enabled = True
    with Profiler("model inferencing"):
        ...
    Profiler.print_tree()
"""

from __future__ import annotations

import time
from contextlib import contextmanager

import jax


class _Node:
    __slots__ = ("label", "total", "count", "children")

    def __init__(self, label):
        self.label = label
        self.total = 0.0
        self.count = 0
        self.children: dict = {}


class Profiler:
    """Context-manager tree profiler, globally gated by ``Profiler.enabled``."""

    enabled = False
    _root = _Node("root")
    _stack = [_root]

    def __init__(self, label: str, block: bool = True):
        self.label = label
        self.block = block  # block_until_ready semantics for device work

    def __enter__(self):
        if not Profiler.enabled:
            return self
        parent = Profiler._stack[-1]
        node = parent.children.get(self.label)
        if node is None:
            node = _Node(self.label)
            parent.children[self.label] = node
        Profiler._stack.append(node)
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if not Profiler.enabled:
            return False
        node = Profiler._stack.pop()
        node.total += time.perf_counter() - self._t0
        node.count += 1
        return False

    @classmethod
    def reset(cls):
        cls._root = _Node("root")
        cls._stack = [cls._root]

    @classmethod
    def print_tree(cls, file=None):
        def rec(node, depth):
            for child in node.children.values():
                print(
                    f'{"  " * depth}{child.label}: {child.total * 1e3:.2f} ms'
                    f" (x{child.count})",
                    file=file,
                )
                rec(child, depth + 1)

        rec(cls._root, 0)

    @staticmethod
    @contextmanager
    def device_trace(logdir: str):
        """Capture a jax.profiler trace viewable in XProf/TensorBoard."""
        jax.profiler.start_trace(logdir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()
