"""Schema-driven record validation + normalization.

Reimplements ``validate_extracted_data`` semantics
(reference: app/backend/services/ai/validation.py:400-566), with one
deliberate divergence: values of types the reference's branch chain never
assigns (STRING, EMAIL, PHONE, ADDRESS, PERCENTAGE, already-numeric NUMBER,
already-bool BOOLEAN) are **passed through** into ``validated_data`` — the
reference's own tests (tests/test_ai_service.py:141-153) assert this
behavior even though its code drops them; the tests define the contract.

Semantics preserved:
- case-insensitive key matching, first occurrence wins (validation.py:420-433)
- missing key => NO warning ("trust the AI", validation.py:441-444)
- explicit None/"" on a required field => warning; value becomes None
  (validation.py:457-464)
- date: relaxed — unparseable kept raw, no warning (validation.py:490-497)
- currency: original string kept, parsed float tracked separately for math
  checks (validation.py:499-509)
- array: must be list; None items stripped (validation.py:467-488)
- math rules evaluated over parsed currency values only; rules referencing
  fields absent from the record root are skipped (validation.py:345-397)
- warnings deduplicated via a set (validation.py:429-431, 563-565)
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any

from ..schema import FieldType, SchemaDefinition, extract_rule_identifiers
from .rules import evaluate_rule
from .scalars import (
    normalize_boolean,
    normalize_number,
    normalize_percentage,
    parse_currency,
    parse_date,
)


@dataclass
class ValidationResult:
    validated_data: dict[str, Any] = dc_field(default_factory=dict)
    warnings: list[str] = dc_field(default_factory=list)


def perform_math_checks(
    numeric_values: dict[str, float],
    validation_rules: list[str],
    warnings_set: set[str],
    extracted_data: dict[str, Any] | None = None,
) -> None:
    """Evaluate schema rules over parsed numeric values (validation.py:345-397).

    The root-field gate is CASE-SENSITIVE over raw ``extracted_data`` keys,
    exactly like the reference (validation.py:374-390 compares rule
    identifiers against ``extracted_data.keys()`` verbatim) — a data key
    ``Total`` does NOT satisfy a rule reference ``total``."""
    if not validation_rules:
        return
    root_fields = set(extracted_data) if extracted_data else set()
    for rule in validation_rules:
        refs = extract_rule_identifiers(rule)
        if root_fields and refs and (refs - root_fields):
            continue  # references nested/absent fields — skip silently
        success, message, _failed = evaluate_rule(rule, numeric_values)
        if not success:
            warnings_set.add(message)


def validate_extracted_data(
    data: dict[str, Any], schema: SchemaDefinition
) -> ValidationResult:
    result = ValidationResult()

    normalized: dict[str, Any] = {}
    for k, v in data.items():
        nk = str(k).strip().lower()
        if nk not in normalized:  # first occurrence wins
            normalized[nk] = v

    warnings_set: set[str] = set()
    currency_values: dict[str, float] = {}

    for field in schema.fields:
        nname = field.name.strip().lower()
        if nname not in normalized:
            continue  # missing key: trust, no warning
        value = normalized[nname]

        if value is None or value == "":
            if field.required:
                warnings_set.add(f"Required field '{field.name}' has empty value")
            result.validated_data[field.name] = None
            continue

        if field.type == FieldType.ARRAY:
            if not isinstance(value, list):
                warnings_set.add(
                    f"Field '{field.name}' expected array/list, got: {type(value).__name__}"
                )
                result.validated_data[field.name] = [value]
            else:
                result.validated_data[field.name] = [x for x in value if x is not None]
            continue

        if field.type == FieldType.DATE:
            parsed = parse_date(value)
            result.validated_data[field.name] = parsed if parsed is not None else value
            continue

        if field.type == FieldType.CURRENCY:
            parsed = parse_currency(value)
            if parsed is None:
                warnings_set.add(
                    f"Field '{field.name}' has invalid currency format: '{value}'"
                )
                result.validated_data[field.name] = value
            else:
                currency_values[field.name] = parsed
                result.validated_data[field.name] = value  # dual representation
            continue

        if field.type == FieldType.NUMBER:
            if isinstance(value, bool):
                warnings_set.add(f"Field '{field.name}' expected number, got: '{value}'")
                result.validated_data[field.name] = value
            elif isinstance(value, (int, float)):
                result.validated_data[field.name] = value
            elif isinstance(value, str):
                parsed = normalize_number(value)
                if parsed is None:
                    warnings_set.add(
                        f"Field '{field.name}' has invalid number format: '{value}'"
                    )
                    result.validated_data[field.name] = value
                else:
                    result.validated_data[field.name] = parsed
            else:
                warnings_set.add(f"Field '{field.name}' expected number, got: '{value}'")
                result.validated_data[field.name] = value
            continue

        if field.type == FieldType.BOOLEAN:
            coerced = normalize_boolean(value)
            if coerced is None:
                warnings_set.add(
                    f"Field '{field.name}' has ambiguous boolean value: '{value}'"
                )
                result.validated_data[field.name] = value
            else:
                result.validated_data[field.name] = coerced
            continue

        if field.type == FieldType.EMAIL:
            if isinstance(value, str) and "@" not in value:
                warnings_set.add(
                    f"Field '{field.name}' appears to be invalid email: '{value}'"
                )
            result.validated_data[field.name] = value
            continue

        if field.type == FieldType.PERCENTAGE:
            if isinstance(value, str) and normalize_percentage(value) is None:
                warnings_set.add(
                    f"Field '{field.name}' has invalid percentage format: '{value}'"
                )
            result.validated_data[field.name] = value
            continue

        # STRING / PHONE / ADDRESS and any future types: pass through
        result.validated_data[field.name] = value

    perform_math_checks(currency_values, schema.validation_rules, warnings_set, data)
    result.warnings = sorted(warnings_set)  # deterministic order (set in reference)
    return result
