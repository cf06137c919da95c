"""Safe expression evaluation for dataflow edge predicates.

The reference evaluates conditional-edge expressions over ``output``/
``memory`` contexts with an AST-whitelisted evaluator
(core/framework/graph/safe_eval.py:1-253; used by edge.py:160-204), and
falls back to False on failure (edge.py:200-204).  This is a fresh
implementation of the same documented surface:

- literals, list/tuple/dict/set displays
- arithmetic ``+ - * / // % **``, shifts, bitwise ops, unary ``- + ~ not``
- comparisons incl. chained (``1 < x < 10``), ``in``/``not in``, ``is``/
  ``is not``
- boolean ``and``/``or`` (short-circuit), ternary ``a if c else b``
- subscript ``d['k']``, ``xs[0]``; attribute access except ``_``-prefixed
- calls restricted to a function whitelist (len int float str bool list
  dict tuple set min max sum abs round all any sorted) and a method
  whitelist (get keys values items lower upper strip split startswith
  endswith)

Anything else raises :class:`UnsafeExpressionError`.

``compile_predicate`` additionally translates the same expression grammar
(minus calls/attributes) to a Spark SQL string, so a graph edge predicate
can run distributed as ``df.filter(...)`` — the SURVEY §2.2 mapping.
"""

from __future__ import annotations

import ast
import operator
from typing import Any

ALLOWED_FUNCS: dict[str, Any] = {
    "len": len, "int": int, "float": float, "str": str, "bool": bool,
    "list": list, "dict": dict, "tuple": tuple, "set": set,
    "min": min, "max": max, "sum": sum, "abs": abs, "round": round,
    "all": all, "any": any, "sorted": sorted,
}

ALLOWED_METHODS = {
    "get", "keys", "values", "items",
    "lower", "upper", "strip", "split", "startswith", "endswith",
}

_BINOPS = {
    ast.Add: operator.add, ast.Sub: operator.sub, ast.Mult: operator.mul,
    ast.Div: operator.truediv, ast.FloorDiv: operator.floordiv,
    ast.Mod: operator.mod, ast.Pow: operator.pow,
    ast.LShift: operator.lshift, ast.RShift: operator.rshift,
    ast.BitAnd: operator.and_, ast.BitOr: operator.or_,
    ast.BitXor: operator.xor,
}

_CMPOPS = {
    ast.Eq: operator.eq, ast.NotEq: operator.ne,
    ast.Lt: operator.lt, ast.LtE: operator.le,
    ast.Gt: operator.gt, ast.GtE: operator.ge,
    ast.Is: operator.is_, ast.IsNot: operator.is_not,
    ast.In: lambda a, b: a in b, ast.NotIn: lambda a, b: a not in b,
}


class UnsafeExpressionError(ValueError):
    """Expression uses a construct outside the whitelist."""


def safe_eval(expression: str, context: dict[str, Any] | None = None) -> Any:
    """Evaluate ``expression`` against ``context`` names; whitelist-only."""
    context = context or {}
    try:
        tree = ast.parse(expression, mode="eval")
    except SyntaxError as exc:
        raise UnsafeExpressionError(f"syntax error: {exc}") from exc
    return _Evaluator(context).visit(tree.body)


def eval_predicate(expression: str, context: dict[str, Any] | None = None) -> bool:
    """Edge-predicate semantics: truthiness of the result; any failure →
    False (edge.py:200-204 behavior)."""
    try:
        return bool(safe_eval(expression, context))
    except Exception:
        return False


class _Evaluator:
    def __init__(self, context: dict[str, Any]):
        self.context = context

    def visit(self, node: ast.AST) -> Any:
        meth = getattr(self, f"_visit_{type(node).__name__}", None)
        if meth is None:
            raise UnsafeExpressionError(
                f"disallowed construct: {type(node).__name__}"
            )
        return meth(node)

    def _visit_Constant(self, node: ast.Constant) -> Any:
        return node.value

    def _visit_Name(self, node: ast.Name) -> Any:
        if node.id in self.context:
            return self.context[node.id]
        if node.id in ALLOWED_FUNCS:
            return ALLOWED_FUNCS[node.id]
        raise UnsafeExpressionError(f"unknown name: {node.id}")

    def _visit_List(self, node: ast.List) -> list:
        return [self.visit(e) for e in node.elts]

    def _visit_Tuple(self, node: ast.Tuple) -> tuple:
        return tuple(self.visit(e) for e in node.elts)

    def _visit_Set(self, node: ast.Set) -> set:
        return {self.visit(e) for e in node.elts}

    def _visit_Dict(self, node: ast.Dict) -> dict:
        if any(k is None for k in node.keys):
            raise UnsafeExpressionError("dict unpacking not allowed")
        return {self.visit(k): self.visit(v) for k, v in zip(node.keys, node.values)}

    def _visit_BinOp(self, node: ast.BinOp) -> Any:
        op = _BINOPS.get(type(node.op))
        if op is None:
            raise UnsafeExpressionError(f"operator {type(node.op).__name__}")
        return op(self.visit(node.left), self.visit(node.right))

    def _visit_UnaryOp(self, node: ast.UnaryOp) -> Any:
        v = self.visit(node.operand)
        if isinstance(node.op, ast.USub):
            return -v
        if isinstance(node.op, ast.UAdd):
            return +v
        if isinstance(node.op, ast.Not):
            return not v
        if isinstance(node.op, ast.Invert):
            return ~v
        raise UnsafeExpressionError(f"unary {type(node.op).__name__}")

    def _visit_BoolOp(self, node: ast.BoolOp) -> Any:
        if isinstance(node.op, ast.And):
            result: Any = True
            for v in node.values:
                result = self.visit(v)
                if not result:
                    return result
            return result
        result = False
        for v in node.values:
            result = self.visit(v)
            if result:
                return result
        return result

    def _visit_Compare(self, node: ast.Compare) -> bool:
        left = self.visit(node.left)
        for op, comp in zip(node.ops, node.comparators):
            fn = _CMPOPS.get(type(op))
            if fn is None:
                raise UnsafeExpressionError(f"comparison {type(op).__name__}")
            right = self.visit(comp)
            if not fn(left, right):
                return False
            left = right
        return True

    def _visit_IfExp(self, node: ast.IfExp) -> Any:
        return self.visit(node.body) if self.visit(node.test) else self.visit(node.orelse)

    def _visit_Subscript(self, node: ast.Subscript) -> Any:
        value = self.visit(node.value)
        if isinstance(node.slice, ast.Slice):
            lower = self.visit(node.slice.lower) if node.slice.lower else None
            upper = self.visit(node.slice.upper) if node.slice.upper else None
            step = self.visit(node.slice.step) if node.slice.step else None
            return value[slice(lower, upper, step)]
        return value[self.visit(node.slice)]

    def _visit_Attribute(self, node: ast.Attribute) -> Any:
        if node.attr.startswith("_"):
            raise UnsafeExpressionError(f"private attribute: {node.attr}")
        value = self.visit(node.value)
        if isinstance(value, dict) and node.attr in value:
            return value[node.attr]
        return getattr(value, node.attr)

    def _visit_Call(self, node: ast.Call) -> Any:
        if node.keywords:
            raise UnsafeExpressionError("keyword arguments not allowed")
        args = [self.visit(a) for a in node.args]
        fn = node.func
        if isinstance(fn, ast.Name):
            if fn.id not in ALLOWED_FUNCS:
                raise UnsafeExpressionError(f"function not allowed: {fn.id}")
            return ALLOWED_FUNCS[fn.id](*args)
        if isinstance(fn, ast.Attribute):
            if fn.attr not in ALLOWED_METHODS:
                raise UnsafeExpressionError(f"method not allowed: {fn.attr}")
            obj = self.visit(fn.value)
            return getattr(obj, fn.attr)(*args)
        raise UnsafeExpressionError("only simple calls allowed")


# ---- predicate → Spark SQL ------------------------------------------------

_SQL_BINOPS = {
    ast.Add: "+", ast.Sub: "-", ast.Mult: "*", ast.Div: "/",
    ast.Mod: "%",
}
_SQL_CMPOPS = {
    ast.Eq: "=", ast.NotEq: "<>", ast.Lt: "<", ast.LtE: "<=",
    ast.Gt: ">", ast.GtE: ">=",
}


def compile_predicate(expression: str) -> str:
    """Compile the arithmetic/boolean/comparison subset of the expression
    grammar to a Spark SQL boolean expression (names become columns), so
    edge predicates run as ``df.filter(...)`` — distributed, codegen'd,
    pushdown-eligible.
    """
    tree = ast.parse(expression, mode="eval")
    return _to_sql(tree.body)


def _sql_literal(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v)


def _to_sql(node: ast.AST) -> str:
    if isinstance(node, ast.Constant):
        return _sql_literal(node.value)
    if isinstance(node, ast.Name):
        return f"`{node.id}`"
    if isinstance(node, ast.BinOp) and type(node.op) in _SQL_BINOPS:
        if isinstance(node.op, ast.FloorDiv):
            return f"({_to_sql(node.left)} DIV {_to_sql(node.right)})"
        return f"({_to_sql(node.left)} {_SQL_BINOPS[type(node.op)]} {_to_sql(node.right)})"
    if isinstance(node, ast.BinOp) and isinstance(node.op, ast.FloorDiv):
        return f"({_to_sql(node.left)} DIV {_to_sql(node.right)})"
    if isinstance(node, ast.BinOp) and isinstance(node.op, ast.Pow):
        return f"POWER({_to_sql(node.left)}, {_to_sql(node.right)})"
    if isinstance(node, ast.UnaryOp):
        if isinstance(node.op, ast.Not):
            return f"(NOT {_to_sql(node.operand)})"
        if isinstance(node.op, ast.USub):
            return f"(- {_to_sql(node.operand)})"
    if isinstance(node, ast.BoolOp):
        joiner = " AND " if isinstance(node.op, ast.And) else " OR "
        return "(" + joiner.join(_to_sql(v) for v in node.values) + ")"
    if isinstance(node, ast.Compare):
        # chained comparison → AND of pairs (SURVEY §2.2 mapping)
        parts = []
        left = node.left
        for op, comp in zip(node.ops, node.comparators):
            if type(op) in _SQL_CMPOPS:
                parts.append(
                    f"({_to_sql(left)} {_SQL_CMPOPS[type(op)]} {_to_sql(comp)})"
                )
            elif isinstance(op, (ast.In, ast.NotIn)) and isinstance(
                comp, (ast.List, ast.Tuple, ast.Set)
            ):
                vals = ", ".join(_to_sql(e) for e in comp.elts)
                neg = "NOT " if isinstance(op, ast.NotIn) else ""
                parts.append(f"({_to_sql(left)} {neg}IN ({vals}))")
            elif isinstance(op, ast.Is) and isinstance(comp, ast.Constant) \
                    and comp.value is None:
                parts.append(f"({_to_sql(left)} IS NULL)")
            elif isinstance(op, ast.IsNot) and isinstance(comp, ast.Constant) \
                    and comp.value is None:
                parts.append(f"({_to_sql(left)} IS NOT NULL)")
            else:
                raise UnsafeExpressionError(
                    f"comparison not SQL-compilable: {type(op).__name__}"
                )
            left = comp
        if len(parts) == 1:
            return parts[0]
        return "(" + " AND ".join(parts) + ")"
    if isinstance(node, ast.IfExp):
        return (
            f"(CASE WHEN {_to_sql(node.test)} THEN {_to_sql(node.body)} "
            f"ELSE {_to_sql(node.orelse)} END)"
        )
    raise UnsafeExpressionError(
        f"not SQL-compilable: {type(node).__name__}"
    )
