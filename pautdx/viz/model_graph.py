"""Model-structure diagram as Graphviz DOT text (dependency-free).

The reference renders its model diagram with the graphviz package
(`signals/GNN_training_multi_v2.py:81-125`); here the diagram is derived
from the flax variable tree (which IS the module tree) and emitted as DOT
text — render with any graphviz install, or read as-is.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _count(tree) -> int:
    if isinstance(tree, dict):
        return sum(_count(v) for v in tree.values())
    return int(np.prod(np.shape(tree))) if np.shape(tree) else 1


def model_dot(params: Dict, name: str = "model", max_depth: int = 2) -> str:
    """Flax ``params`` tree -> DOT digraph of modules down to
    ``max_depth``, annotated with parameter counts."""
    lines = [f'digraph "{name}" {{',
             "  rankdir=TB; node [shape=box, fontsize=10];",
             f'  root [label="{name}\\n{_count(params):,} params"];']
    idx = [0]

    def walk(tree, parent: str, depth: int):
        if depth >= max_depth or not isinstance(tree, dict):
            return
        for key, sub in tree.items():
            if not isinstance(sub, dict):
                continue
            idx[0] += 1
            node = f"n{idx[0]}"
            lines.append(
                f'  {node} [label="{key}\\n{_count(sub):,} params"];')
            lines.append(f"  {parent} -> {node};")
            walk(sub, node, depth + 1)

    walk(params, "root", 0)
    lines.append("}")
    return "\n".join(lines)


def save_model_dot(params: Dict, path: str, name: str = "model",
                   max_depth: int = 2) -> str:
    dot = model_dot(params, name=name, max_depth=max_depth)
    with open(path, "w") as f:
        f.write(dot)
    return dot
