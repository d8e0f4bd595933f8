"""Scalar kernels and record validation (pure functions, no Ray deps)."""

from .scalars import (  # noqa: F401
    clean_null_from_arrays,
    normalize_boolean,
    normalize_number,
    parse_currency,
    parse_date,
)
from .rules import evaluate_rule, extract_field_names_from_rule  # noqa: F401
from .validation import ValidationResult, validate_extracted_data  # noqa: F401
