"""Fluent builders for tree-shaped optimizer structures.

Port of the reference's ``TreeBuilder`` trait
(``dolomite/src/utils.rs:1-97``): ``begin(node)`` descends into a new
child, ``leaf(node)`` appends a childless child, ``end()`` closes the
current node — the final ``end()`` (closing the root) returns the built
tree.  The reference instantiates it for ``Pattern`` and
``OptExpression``; ``PatternBuilder`` / ``OptExprBuilder`` below are
those two instantiations.
"""

from __future__ import annotations

from typing import Any, Callable, List, Tuple

from .pattern import Pattern
from .rule import OptExpression, OptExprNode

__all__ = ["TreeBuilder", "PatternBuilder", "OptExprBuilder"]


class TreeBuilder:
    """Generic nested-tree builder.

    ``make(node, children)`` constructs one tree level (the analog of the
    Rust ``Tree: From<(Node, Vec<Tree>)>`` bound).  The root node is
    given at construction; ``end()`` returns ``self`` while inner nodes
    remain open and the finished tree when it closes the root — matching
    the reference where only the RootBuilder's ``end`` yields the tree
    (``utils.rs:61-77``)."""

    def __init__(self, make: Callable[[Any, List[Any]], Any], root: Any):
        self._make = make
        self._stack: List[Tuple[Any, List[Any]]] = [(root, [])]

    def begin(self, node: Any) -> "TreeBuilder":
        """Open a child node; subsequent begin/leaf calls attach under it
        until the matching ``end()`` (``utils.rs:9-25``)."""
        self._stack.append((node, []))
        return self

    def leaf(self, node: Any) -> "TreeBuilder":
        """Append a childless child to the current node (``utils.rs:27-34``)."""
        self._add_child(self._make(node, []))
        return self

    def end(self):
        """Close the current node (``utils.rs:36,88-97``).  Closing the
        root returns the finished tree."""
        node, children = self._stack.pop()
        tree = self._make(node, children)
        if not self._stack:
            return self._finish(tree)
        self._add_child(tree)
        return self

    # -- hooks ----------------------------------------------------------
    def _add_child(self, tree: Any) -> None:
        if not self._stack:
            raise ValueError("builder already closed")
        self._stack[-1][1].append(tree)

    def _finish(self, tree: Any):
        return tree


class PatternBuilder(TreeBuilder):
    """``TreeBuilder`` over ``Pattern`` nodes: each node is a tuple of
    operator classes (isinstance match).  Leaves get ``children=None``
    (wildcard below, ``pattern.rs:27-77``); ``leaf_any()`` is the
    ``any`` matcher (``pattern.rs:79-81``)."""

    def __init__(self, *root_types: type):
        super().__init__(self._make_pattern, root_types)

    @staticmethod
    def _make_pattern(node, children):
        if node is None:
            predicate = lambda _op: True  # noqa: E731
        else:
            types = node if isinstance(node, tuple) else (node,)
            predicate = lambda op, _t=types: isinstance(op, _t)  # noqa: E731
        return Pattern(predicate, tuple(children) if children else None)

    def begin(self, *op_types: type) -> "PatternBuilder":
        return super().begin(op_types)

    def leaf(self, *op_types: type) -> "PatternBuilder":
        return super().leaf(op_types)

    def leaf_any(self) -> "PatternBuilder":
        return super().leaf(None)


class OptExprBuilder(TreeBuilder):
    """``TreeBuilder`` over ``OptExprNode``: nodes are operators,
    ``leaf_handle(h)`` references an existing subtree/group (the
    ``OptExpression`` instantiation at ``utils.rs:4-6`` via
    ``opt_expr.rs``).  The final ``end()`` returns an ``OptExpression``."""

    def __init__(self, root_operator):
        super().__init__(self._make_node, root_operator)

    @staticmethod
    def _make_node(node, children):
        if isinstance(node, OptExprNode):  # pre-built handle leaf
            return node
        return OptExprNode(operator=node, inputs=list(children))

    def leaf_handle(self, handle) -> "OptExprBuilder":
        self._add_child(OptExprNode(handle=handle))
        return self

    def _finish(self, tree):
        return OptExpression(tree)
