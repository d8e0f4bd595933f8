"""Math-validation-rule DSL: safe expression evaluation.

Reimplements the reference's rule evaluator semantics
(reference: app/backend/services/ai/validation.py:157-241) on a small
``ast``-walking interpreter instead of the `simpleeval` dependency:

- a rule is ``<left> == <right>``; each side is an arithmetic expression
  over field names with an allowlisted function set
  {sum, round, abs, min, max, sqrt, log, log10, pow, len};
- an UNKNOWN name on either side => rule is SKIPPED (passes) — the reference
  treats missing operands as "cannot evaluate, trust the data";
- both sides exactly 0 => pass;
- tolerance: ``abs(L-R) <= max(1%*|L|, 1%*|R|, 0.02)``;
- failure message format: ``Math validation failed: <rule>
  (left=L, right=R, diff=D)`` with 2dp values (validation.py:233-240).
"""

from __future__ import annotations

import ast
import math
from typing import Any

from ..schema import _ALLOWED_FUNCS as _SCHEMA_FUNC_NAMES, extract_rule_identifiers

_ALLOWED_FUNCS: dict[str, Any] = {
    "sum": sum,
    "round": round,
    "abs": abs,
    "min": min,
    "max": max,
    "sqrt": math.sqrt,
    "log": math.log,
    "log10": math.log10,
    "pow": pow,
    "len": len,
}
# single-source guard: the name set schema.filter_rules exempts from
# field-reference checks must equal the callables this evaluator accepts,
# or rules silently drop / silently skip (review finding)
if set(_ALLOWED_FUNCS) != set(_SCHEMA_FUNC_NAMES):
    raise RuntimeError(
        "rule-evaluator/schema function allowlists diverged: "
        f"{set(_ALLOWED_FUNCS) ^ set(_SCHEMA_FUNC_NAMES)}"
    )

# simpleeval-style power guard (the library this module replaces enforces
# MAX_POWER; without it `10**10**10` allocates a multi-GB integer inside a
# map_batches worker before any exception can fire — review finding)
_MAX_POW_OPERAND = 4_000_000


def _safe_pow(a, b):  # noqa: ANN001, ANN202
    if abs(a) > _MAX_POW_OPERAND or abs(b) > _MAX_POW_OPERAND:
        raise UnsafeExpression(f"power operands too large: {a!r} ** {b!r}")
    return a ** b


_BINOPS = {
    ast.Add: lambda a, b: a + b,
    ast.Sub: lambda a, b: a - b,
    ast.Mult: lambda a, b: a * b,
    ast.Div: lambda a, b: a / b,
    ast.FloorDiv: lambda a, b: a // b,
    ast.Mod: lambda a, b: a % b,
    ast.Pow: _safe_pow,
}


class NameNotDefined(KeyError):
    """An expression referenced a name absent from the value context."""


class UnsafeExpression(ValueError):
    """An expression used a construct outside the safe arithmetic subset."""


def _eval_node(node: ast.AST, names: dict[str, float]) -> Any:
    if isinstance(node, ast.Expression):
        return _eval_node(node.body, names)
    if isinstance(node, ast.Constant):
        if isinstance(node.value, (int, float)) and not isinstance(node.value, bool):
            return node.value
        raise UnsafeExpression(f"non-numeric constant {node.value!r}")
    if isinstance(node, ast.Name):
        if node.id in names:
            return names[node.id]
        raise NameNotDefined(node.id)
    if isinstance(node, ast.BinOp):
        op = _BINOPS.get(type(node.op))
        if op is None:
            raise UnsafeExpression(f"operator {type(node.op).__name__}")
        return op(_eval_node(node.left, names), _eval_node(node.right, names))
    if isinstance(node, ast.UnaryOp):
        v = _eval_node(node.operand, names)
        if isinstance(node.op, ast.USub):
            return -v
        if isinstance(node.op, ast.UAdd):
            return +v
        raise UnsafeExpression(f"unary {type(node.op).__name__}")
    if isinstance(node, ast.Call):
        if not isinstance(node.func, ast.Name) or node.func.id not in _ALLOWED_FUNCS:
            raise UnsafeExpression("only allowlisted function calls permitted")
        if node.keywords:
            raise UnsafeExpression("keyword arguments not permitted")
        args = [_eval_node(a, names) for a in node.args]
        return _ALLOWED_FUNCS[node.func.id](*args)
    if isinstance(node, (ast.Tuple, ast.List)):
        return [_eval_node(e, names) for e in node.elts]
    raise UnsafeExpression(f"disallowed node {type(node).__name__}")


def safe_eval(expression: str, names: dict[str, float]) -> float:
    """Evaluate one arithmetic expression in the safe subset."""
    try:
        tree = ast.parse(expression, mode="eval")
    except SyntaxError as e:
        raise UnsafeExpression(str(e)) from e
    return _eval_node(tree, names)


def evaluate_rule(
    rule: str, numeric_values: dict[str, float]
) -> tuple[bool, str, str | None]:
    """Evaluate ``left == right``; returns (success, message, failed_rule|None).

    Success is True when the rule passes OR cannot be evaluated
    (missing name, bad syntax) — mirroring validation.py:157-241.
    """
    rule = rule.strip()
    if "==" not in rule:
        return (True, f"Invalid rule format (no ==): {rule}", None)
    left_src, right_src = (p.strip() for p in rule.split("==", 1))

    try:
        left = safe_eval(left_src, numeric_values)
    except NameNotDefined as e:
        return (True, f"Field not found for rule '{rule}': {e}", None)
    except Exception as e:  # noqa: BLE001 — any eval problem => skip
        return (True, f"Could not evaluate left side of '{rule}': {e}", None)
    try:
        right = safe_eval(right_src, numeric_values)
    except NameNotDefined as e:
        return (True, f"Field not found for rule '{rule}': {e}", None)
    except Exception as e:  # noqa: BLE001
        return (True, f"Could not evaluate right side of '{rule}': {e}", None)

    if left == 0 and right == 0:
        return (True, f"Rule passed: {rule}", None)
    tolerance = max(abs(left) * 0.01, abs(right) * 0.01, 0.02)
    if abs(left - right) <= tolerance:
        return (True, f"Rule passed: {rule}", None)
    return (
        False,
        f"Math validation failed: {rule} "
        f"(left={left:.2f}, right={right:.2f}, diff={abs(left - right):.2f})",
        rule,
    )


def extract_field_names_from_rule(rule: str) -> set[str]:
    """Identifier harvest (lowercased) minus keywords/allowed functions."""
    return {n.lower() for n in extract_rule_identifiers(rule)}


# ---------------------------------------------------------------------------
# legacy back-compat surface (reference validation.py:244-285)
# ---------------------------------------------------------------------------

def parse_validation_rule_legacy(
    rule: str,
) -> tuple[str, list[tuple[str, str]]] | None:
    """Reference ``_parse_validation_rule`` (validation.py:245-273), exact
    semantics including its quirks: splits the RHS on any of ``+-*/`` but
    records EVERY component with a '+' sign (the operator is discarded — a
    reference behavior its own tests pin, preserved verbatim), and returns
    None unless the rule contains exactly one ``==``."""
    rule = rule.strip()
    if "==" not in rule:
        return None
    parts = rule.split("==")
    if len(parts) != 2:
        return None
    result_field = parts[0].strip()
    expression = parts[1].strip()
    operators = "+-*/"
    components: list[tuple[str, str]] = []
    current = ""
    for char in expression:
        if char in operators:
            if current.strip():
                components.append(("+", current.strip()))
            current = ""
        else:
            current += char
    if current.strip():
        components.append(("+", current.strip()))
    return (result_field, components)


def evaluate_validation_rule_legacy(
    rule: str, values: dict[str, float]
) -> tuple[bool, str, float | None, float | None]:
    """Reference ``_evaluate_validation_rule`` (validation.py:276-285):
    delegates to the modern evaluator and pads (None, None) expected/actual
    slots — the legacy return shape its tests depend on."""
    success, message, _failed = evaluate_rule(rule, values)
    return (success, message, None, None)
