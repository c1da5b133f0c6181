"""BigQuery-dialect pre-parse rewriter.

SURVEY §4's verdict on custom optimizer work was "none needed — the only
candidate is a SAFE_DIVIDE-style shim if we expose a SQL entry point that
must accept BigQuery dialect verbatim, implementable as a pre-parse
string rewrite; no Catalyst extension required". This module is that
shim: it accepts the reference's embedded BigQuery SQL text UNCHANGED
(shape of native_CTR_alerts.py:226-268) and rewrites the
dialect-divergent tokens to Spark SQL:

- ``SAFE_DIVIDE(a, b)``              → ``try_divide(a, b)`` (NULL on 0/NULL — same contract)
- ``DATE_SUB(x, INTERVAL n DAY)``    → ``date_sub(x, n)``
- ``\\`project.dataset.table\\``      → last path component (a registered temp view)
- trailing statement ``;``           → stripped (spark.sql is single-statement)

A string rewrite is the right altitude here: these are token-level
synonyms, not semantic differences, so a parser plugin or Catalyst rule
would add surface without adding correctness. Known limit (documented,
fine for the reference surface): the DATE_SUB rewrite handles literal /
simple first arguments plus one parenthesized level — enough for a
scalar subquery like ``(SELECT MAX(date) FROM t)`` — not arbitrarily
deep nesting.
"""

from __future__ import annotations

import re

_SAFE_DIVIDE = re.compile(r"\bSAFE_DIVIDE\s*\(", re.IGNORECASE)
# First argument: either a parenthesized expression (one nested level of
# parens allowed, covering scalar subqueries with a single function call)
# or a comma/paren-free simple expression.
_DATE_SUB = re.compile(
    r"\bDATE_SUB\s*\(\s*(\((?:[^()]|\([^()]*\))*\)|[^(),]+?)\s*,"
    r"\s*INTERVAL\s+(\d+)\s+DAY\s*\)",
    re.IGNORECASE,
)
_BQ_TABLE = re.compile(r"`[A-Za-z0-9_.\-]*?([A-Za-z0-9_]+)`")


def bq_sql_to_spark(sql: str) -> str:
    """Rewrite a BigQuery-dialect statement to Spark SQL (see module doc)."""
    out = _SAFE_DIVIDE.sub("try_divide(", sql)
    out = _DATE_SUB.sub(r"date_sub(\1, \2)", out)
    out = _BQ_TABLE.sub(r"\1", out)
    return out.rstrip().rstrip(";")
