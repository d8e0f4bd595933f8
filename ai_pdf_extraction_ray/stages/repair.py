"""Smart repair: rule-driven completion of missing field values.

Deterministic replacement for the reference's LLM repair kernel
(reference: app/backend/services/ai/repair.py:57-223 "complete missing
values"; per-field change tracking mirrors the manual-override audit trail
routers/documents.py:160-177): schema ``validation_rules`` are treated as
*equations* and solved for a single missing operand.

For a rule ``lhs == t1 + t2 - t3 ...`` (a +/- chain over field names and
numeric literals):

- lhs missing, all terms known            -> lhs := eval(rhs)
- lhs known, exactly one term missing     -> solve by rearrangement
  (sign-aware: ``missing := +/-(lhs - sum(known terms))``)
- anything else                           -> rule skipped (no guess)

Iterates to a fixpoint (a repaired value can unlock another rule), bounded
by the rule count. Repaired currency fields are written back in the
reference's dual representation (value formatted like the source strings);
every repair is recorded as ``{field: {original, repaired}}`` exactly like
``manual_overrides`` smart-repair entries (documents.py:166-172).
"""

from __future__ import annotations

import json
import re
from typing import Any

import pyarrow as pa

from ray.data import Dataset

from ..functions.rounding import py_round
from ..functions.scalars import normalize_number, normalize_percentage, parse_currency
from ..schema import FieldType, SchemaDefinition

_TERM = re.compile(r"([+-]?)\s*([A-Za-z_][A-Za-z0-9_]*|\d+(?:\.\d+)?)")


def _parse_linear_chain(expr: str) -> list[tuple[int, str | float]] | None:
    """``a + b - 3.5`` -> [(+1,'a'), (+1,'b'), (-1,3.5)]; None when the
    expression is not a pure +/- chain (has * / ( ) etc.)."""
    if re.search(r"[*/()]", expr):
        return None
    pos = 0
    out: list[tuple[int, str | float]] = []
    for m in _TERM.finditer(expr):
        if expr[pos:m.start()].strip() not in ("", "+", "-"):
            return None
        sign = -1 if m.group(1) == "-" else 1
        tok = m.group(2)
        try:
            out.append((sign, float(tok)))
        except ValueError:
            out.append((sign, tok))
        pos = m.end()
    if expr[pos:].strip():
        return None
    return out or None


def solve_rule(
    rule: str, values: dict[str, float | None]
) -> tuple[str, float] | None:
    """Solve ``lhs == chain`` for its single unknown; None if unsolvable."""
    if "==" not in rule:
        return None
    lhs, rhs = (p.strip() for p in rule.split("==", 1))
    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", lhs):
        return None
    chain = _parse_linear_chain(rhs)
    if chain is None:
        return None

    names = [t for _, t in chain if isinstance(t, str)]
    missing_rhs = [n for n in names if values.get(n) is None]
    lhs_known = values.get(lhs) is not None

    def term_value(t: str | float) -> float:
        return t if isinstance(t, float) else float(values[t])

    if not lhs_known and not missing_rhs:
        return lhs, sum(s * term_value(t) for s, t in chain)
    if lhs_known and len(missing_rhs) == 1:
        target = missing_rhs[0]
        known_sum = sum(
            s * term_value(t) for s, t in chain
            if not (isinstance(t, str) and t == target)
        )
        sign = next(s for s, t in chain if isinstance(t, str) and t == target)
        return target, sign * (float(values[lhs]) - known_sum)
    return None


def repair_record(
    data: dict[str, Any], schema: SchemaDefinition
) -> tuple[dict[str, Any], dict[str, dict]]:
    """(repaired_data, {field: {original, repaired}}). Pure function."""
    numeric: dict[str, float | None] = {}
    for f in schema.fields:
        if f.type in (FieldType.CURRENCY, FieldType.NUMBER, FieldType.PERCENTAGE):
            v = data.get(f.name)
            if f.type == FieldType.CURRENCY:
                parsed = parse_currency(v)
            elif isinstance(v, (int, float)) and not isinstance(v, bool):
                parsed = float(v)
            elif isinstance(v, str):
                # a NUMBER/PERCENTAGE held as a numeric string ('1,234') is
                # PRESENT, not missing — parsing it here keeps the solver
                # from overwriting it (advisor finding)
                p = (normalize_number(v) if f.type == FieldType.NUMBER
                     else normalize_percentage(v))
                parsed = float(p) if p is not None else None
            else:
                parsed = None
            numeric[f.name] = parsed

    repaired: dict[str, dict] = {}
    out = dict(data)
    for _ in range(max(1, len(schema.validation_rules))):
        progressed = False
        for rule in schema.validation_rules:
            sol = solve_rule(rule, numeric)
            if sol is None:
                continue
            name, value = sol
            if numeric.get(name) is not None:
                continue
            # shared half-away-from-zero rounding: repair_completion is
            # oracle-facing, builtin half-even round() would hash-mismatch
            value = py_round(value, 2)
            numeric[name] = value
            repaired[name] = {"original": data.get(name), "repaired": value}
            out[name] = value
            progressed = True
        if not progressed:
            break
    return out, repaired


class RepairStage:
    """Callable over extraction batches: fills null required numeric fields
    from the schema's rules; emits a ``repaired_json`` audit column (shape
    of manual_overrides smart-repair entries). Usable directly or via the
    stateless wrapper below."""

    def __init__(self, schema_dict: dict | str) -> None:
        if isinstance(schema_dict, str):
            schema_dict = json.loads(schema_dict)
        self.schema = SchemaDefinition.from_dict(schema_dict)

    def __call__(self, batch: pa.Table) -> pa.Table:
        fields = [json.loads(x) for x in batch.column("fields_json").to_pylist()]
        new_fields, audits = [], []
        for fd in fields:
            repaired_data, audit = repair_record(fd, self.schema)
            new_fields.append(json.dumps(repaired_data, sort_keys=True))
            audits.append(json.dumps(audit, sort_keys=True))
        cols = {name: batch.column(name) for name in batch.column_names}
        cols["fields_json"] = pa.array(new_fields, pa.string())
        cols["repaired_json"] = pa.array(audits, pa.string())
        return pa.table(cols)


def _repair_batch(batch: pa.Table, schema_json: str) -> pa.Table:
    return RepairStage(schema_json)(batch)


def repair_extractions(extractions: Dataset, schema: SchemaDefinition) -> Dataset:
    """STATELESS tasks, not an actor pool: the only state is the (tiny)
    schema, and a second fixed-size pool in the same pipeline can deadlock
    a small cluster when the pools' combined reservation exceeds the CPU
    count (observed: extraction pool + repair pool on 4 cpus). Elastic
    tasks share CPUs with every other stage."""
    return extractions.map_batches(
        _repair_batch,
        fn_kwargs={"schema_json": json.dumps(schema.to_dict(), sort_keys=True)},
        batch_format="pyarrow",
    )
