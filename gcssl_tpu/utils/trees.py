"""Pytree helpers: parameter counting and human-readable summaries
(the reference prints raw param counts at cgan_train_enhanced.py:234-235)."""

from __future__ import annotations

import numpy as np

import jax


def count_params(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def tree_summary(tree, max_depth: int = 2) -> str:
    """Indented per-subtree parameter counts down to max_depth."""
    lines: list[str] = []

    def walk(node, name, depth):
        n = count_params(node)
        lines.append(f"{'  ' * depth}{name}: {n:,}")
        if depth < max_depth and isinstance(node, dict):
            for k in sorted(node):
                walk(node[k], k, depth + 1)

    walk(tree, "total", 0)
    return "\n".join(lines)
