"""X2 — relationship-id sanitizer (XML-NCName safety).

The reference applies a 30-rule chain of single-character replacements
(``omop2owl_vocab.py:304-336``): whitespace and ``, | ;`` → ``_``;
``/ \\`` → ``.``; 22 punctuation chars → ``-``.  Every rule is an
independent single-char map whose output (``_ . -``) is not itself in the
input set, so the chain is order-independent and exactly equivalent to one
``translate`` — a single JVM-side whole-stage-codegen expression, no UDF.

Byte-for-byte equivalence with the reference chain is unit-tested
(tests/test_sanitize.py) including the reference-verified examples
``'SNOMED - ind/CI' → 'SNOMED_-_ind.CI'`` and
``'CPT4 - SNOMED cat' → 'CPT4_-_SNOMED_cat'``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_TO_UNDERSCORE = " \t\n,|;"
_TO_DOT = "/\\"
_TO_DASH = "~`!@#$%^*+=?'\"()[]{}<>"

_FROM = _TO_UNDERSCORE + _TO_DOT + _TO_DASH
_TO = "_" * len(_TO_UNDERSCORE) + "." * len(_TO_DOT) + "-" * len(_TO_DASH)


def sanitize_predicate_col(col: Column | str) -> Column:
    """Vectorized sanitizer: one ``translate`` expression."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c, _FROM, _TO)


def sanitize_predicate_py(s: str) -> str:
    """Driver/test-side twin, same rules (used by the pandas oracle)."""
    return s.translate(str.maketrans(_FROM, _TO))
