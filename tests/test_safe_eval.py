"""safe_eval parity tests — mirrors the reference's expression surface
(safe_eval.py:36-53,105-171,199-208; FIXTURES.md §B.4) plus the Spark-SQL
predicate compiler."""

from __future__ import annotations

import pytest

from adenhq_hive_spark.functions.safe_eval import (
    UnsafeExpressionError,
    compile_predicate,
    eval_predicate,
    safe_eval,
)


class TestEval:
    def test_arithmetic(self):
        assert safe_eval("2 + 3 * 4 - 1") == 13
        assert safe_eval("7 // 2") == 3
        assert safe_eval("2 ** 10") == 1024
        assert safe_eval("7 % 3") == 1
        assert safe_eval("-x", {"x": 5}) == -5

    def test_chained_comparison(self):
        assert safe_eval("1 < x < 10", {"x": 5}) is True
        assert safe_eval("1 < x < 10", {"x": 15}) is False

    def test_membership_and_identity(self):
        assert safe_eval("'a' in xs", {"xs": ["a", "b"]}) is True
        assert safe_eval("y is None", {"y": None}) is True
        assert safe_eval("3 not in (1, 2)") is True

    def test_boolean_shortcircuit_and_ternary(self):
        assert safe_eval("x > 0 and x < 10", {"x": 5}) is True
        assert safe_eval("'yes' if ok else 'no'", {"ok": False}) == "no"
        # short-circuit: RHS would KeyError if evaluated
        assert safe_eval("False and d['missing']", {"d": {}}) is False

    def test_subscript_and_attr(self):
        ctx = {"output": {"score": 0.9, "tags": ["a", "b"]}}
        assert safe_eval("output['score'] > 0.5", ctx) is True
        assert safe_eval("output['tags'][1]", ctx) == "b"
        assert safe_eval("output.score", ctx) == 0.9  # dict attr sugar

    def test_whitelisted_calls(self):
        assert safe_eval("len(xs) == 2", {"xs": [1, 2]}) is True
        assert safe_eval("max(1, 2, 3)") == 3
        assert safe_eval("sum([1, 2, 3])") == 6
        assert safe_eval("s.lower()", {"s": "ABC"}) == "abc"
        assert safe_eval("d.get('k', 0)", {"d": {}}) == 0
        assert safe_eval("s.split(',')", {"s": "a,b"}) == ["a", "b"]

    @pytest.mark.parametrize(
        "bad",
        [
            "__import__('os')",
            "().__class__",
            "x._secret",
            "open('/etc/passwd')",
            "exec('1')",
            "lambda: 1",
            "[x for x in range(3)]",
            "s.format()",
        ],
    )
    def test_rejections(self, bad):
        with pytest.raises(UnsafeExpressionError):
            safe_eval(bad, {"x": object(), "s": "a"})

    def test_predicate_failure_is_false(self):
        # edge.py:200-204 behavior: evaluation failure → False
        assert eval_predicate("missing_name > 1") is False
        assert eval_predicate("output['score'] > 0.5", {"output": {"score": 1}})


class TestCompilePredicate:
    @pytest.mark.parametrize(
        "expr,sql",
        [
            ("x > 3", "(`x` > 3)"),
            ("a and b", "(`a` AND `b`)"),
            ("1 < x < 10", "((1 < `x`) AND (`x` < 10))"),
            ("status in ['F', 'O']", "(`status` IN ('F', 'O'))"),
            ("y is None", "(`y` IS NULL)"),
        ],
    )
    def test_sql_forms(self, expr, sql):
        assert compile_predicate(expr) == sql

    def test_runs_on_spark(self, spark):
        df = spark.createDataFrame(
            [(1, "F", 10.0), (2, "O", 200.0), (3, "P", 30.0)],
            ["id", "status", "total"],
        )
        sql = compile_predicate("status in ['F', 'O'] and total > 20")
        got = sorted(r.id for r in df.filter(sql).collect())
        assert got == [2]

    def test_parity_with_eval(self, spark):
        rows = [(i, float(i * 10)) for i in range(10)]
        df = spark.createDataFrame(rows, ["x", "v"])
        expr = "(x % 2 == 0 and v > 20) or x == 1"
        sql = compile_predicate(expr)
        spark_ids = sorted(r.x for r in df.filter(sql).collect())
        py_ids = sorted(
            x for x, v in rows if eval_predicate(expr, {"x": x, "v": v})
        )
        assert spark_ids == py_ids
