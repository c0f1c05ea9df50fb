"""Rule patterns.

Reference: ``dolomite/src/rules/pattern.rs:27-77`` — a pattern is a
function predicate over an operator plus optional child patterns;
``children=None`` means "leaf wildcard over inputs" (the rule does not
look below this node).  ``pattern.rs:79-81`` provides the ``any`` matcher.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Tuple

from ..operators.logical import Operator

__all__ = ["Pattern", "pattern_of", "any_pattern"]


@dataclass(frozen=True)
class Pattern:
    predicate: Callable[[Operator], bool]
    children: Optional[Tuple["Pattern", ...]] = None  # None = wildcard leaf

    def matches_operator(self, op: Operator) -> bool:
        return bool(self.predicate(op))


def pattern_of(*op_types: type, children: Optional[Tuple[Pattern, ...]] = None) -> Pattern:
    """Pattern matching by operator class."""
    return Pattern(lambda op: isinstance(op, op_types), children)


def any_pattern() -> Pattern:
    """Match any operator, don't descend (ref ``pattern.rs:79-81``)."""
    return Pattern(lambda _op: True, None)
