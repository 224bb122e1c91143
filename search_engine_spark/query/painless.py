"""Painless-arithmetic → Spark-SQL translation (documented subset).

The reference's ES index accepts Painless scripts in `script_score`
queries and `script_fields`; this engine runs the ARITHMETIC subset —
the shape virtually every scoring script in the wild uses — by
translating to a native Spark SQL expression (JVM-side, whole-stage
codegen — scripts never become Python UDFs):

    supported grammar
      literals        integers, floats
      field access    doc['f'].value / doc["f"].value   (docs-table col)
      query score     _score
      parameters      params.name        (numeric, bound at translate)
      operators       + - * / %  and unary -
      calls           Math.log (→ln) Math.log10 Math.sqrt Math.exp
                      Math.abs Math.pow(→power) Math.max(→greatest)
                      Math.min(→least) Math.floor Math.ceil(→ceiling)

Anything outside it (loops, conditionals, ternaries, assignments,
method calls, string ops) raises NotImplementedError naming the gap —
never a silent wrong answer, same contract as query/dsl.py.

Validation is by actual parse: after token substitution the source
must parse as a Python expression (the subset's syntax is common to
Painless, Python, and SQL), and the AST walk allowlists every node
kind — so no un-translated construct can smuggle through to SQL.
"""

from __future__ import annotations

import ast
import re
from typing import Dict, List, Tuple

_MATH_FNS = {
    "log": "ln",
    "log10": "log10",
    "sqrt": "sqrt",
    "exp": "exp",
    "abs": "abs",
    "pow": "power",
    "max": "greatest",
    "min": "least",
    "floor": "floor",
    "ceil": "ceiling",
}

_DOC_REF = re.compile(r"doc\[\s*['\"]([A-Za-z_][A-Za-z0-9_]*)['\"]\s*\]\.value")
_PARAM_REF = re.compile(r"params\.([A-Za-z_][A-Za-z0-9_]*)")
_MATH_REF = re.compile(r"Math\.([A-Za-z_][A-Za-z0-9_]*)")

_ALLOWED_SQL_FNS = set(_MATH_FNS.values())

_ALLOWED_BINOPS = (ast.Add, ast.Sub, ast.Mult, ast.Div, ast.Mod)
_ALLOWED_UNARY = (ast.USub, ast.UAdd)


def painless_to_sql(
    source: str, params: Dict[str, float] | None = None
) -> Tuple[str, List[str]]:
    """Translate a Painless arithmetic expression to a Spark SQL
    expression string.  Returns (sql, referenced_fields); `_score`
    appears verbatim in the SQL (the caller provides that column).
    Raises NotImplementedError for anything outside the subset."""
    params = params or {}
    src = source.strip().rstrip(";")
    if ";" in src or "=" in src.replace("==", ""):
        raise NotImplementedError(
            "painless subset: single arithmetic expression only "
            "(no statements/assignments)"
        )

    fields: List[str] = []

    def _field(m: re.Match) -> str:
        name = m.group(1)
        if name not in fields:
            fields.append(name)
        return name

    def _param(m: re.Match) -> str:
        name = m.group(1)
        if name not in params:
            raise NotImplementedError(f"unbound script param {name!r}")
        v = params[name]
        if not isinstance(v, (int, float)) or isinstance(v, bool):
            raise NotImplementedError(
                f"script param {name!r} must be numeric"
            )
        return repr(float(v))

    def _math(m: re.Match) -> str:
        fn = m.group(1)
        if fn not in _MATH_FNS:
            raise NotImplementedError(f"Math.{fn} not in painless subset")
        return _MATH_FNS[fn]

    sql = _DOC_REF.sub(_field, src)
    if "doc[" in sql:
        raise NotImplementedError(
            "painless subset: doc access must be doc['field'].value"
        )
    sql = _PARAM_REF.sub(_param, sql)
    sql = _MATH_REF.sub(_math, sql)

    try:
        tree = ast.parse(sql, mode="eval")
    except SyntaxError as e:
        raise NotImplementedError(
            f"painless subset: cannot parse {source!r} ({e.msg})"
        ) from None

    allowed_names = set(fields) | {"_score"} | _ALLOWED_SQL_FNS
    for node in ast.walk(tree):
        if isinstance(node, (ast.Expression, ast.Constant)):
            if isinstance(node, ast.Constant) and not isinstance(
                node.value, (int, float)
            ):
                raise NotImplementedError(
                    f"non-numeric literal {node.value!r}"
                )
        elif isinstance(node, ast.BinOp):
            if not isinstance(node.op, _ALLOWED_BINOPS):
                raise NotImplementedError(
                    f"operator {type(node.op).__name__} not in subset"
                )
        elif isinstance(node, ast.UnaryOp):
            if not isinstance(node.op, _ALLOWED_UNARY):
                raise NotImplementedError(
                    f"operator {type(node.op).__name__} not in subset"
                )
        elif isinstance(node, ast.Call):
            if not isinstance(node.func, ast.Name) or (
                node.func.id not in _ALLOWED_SQL_FNS
            ):
                raise NotImplementedError("only Math.* calls supported")
            if node.keywords:
                raise NotImplementedError("keyword args not in subset")
        elif isinstance(node, ast.Name):
            if node.id not in allowed_names:
                raise NotImplementedError(
                    f"unknown identifier {node.id!r} (fields go through "
                    "doc['...'].value, params through params.x)"
                )
        elif isinstance(
            node, (ast.Load, ast.Add, ast.Sub, ast.Mult, ast.Div,
                   ast.Mod, ast.USub, ast.UAdd)
        ):
            pass
        else:
            raise NotImplementedError(
                f"painless subset: {type(node).__name__} not supported"
            )
    return sql, fields
