"""Text expression language (functions/exprlang): compile-once
vectorized evaluation, Kleene null semantics, registry-function calls,
and the builder integration (string predicates + the eval step)."""

import pyarrow as pa
import pytest

from vertex_ray.functions.exprlang import (
    compile_expr,
    compile_predicate,
    eval_expr,
)

T = pa.table({
    "v": [10.0, 60.0, None, 80.0],
    "name": ["click", "view", "error", None],
    "n": [1, 2, 3, 4],
})


def test_literals_and_precedence():
    assert eval_expr("1 + 2 * 3", T) == 7
    assert eval_expr("(1 + 2) * 3", T) == 9
    assert eval_expr("-2 * 3", T) == -6
    assert eval_expr("7 % 3", T) == 1
    assert eval_expr('"a"', T) == "a"
    assert eval_expr("true", T) is True
    assert eval_expr("null", T) is None


def test_columns_and_arithmetic():
    got = eval_expr("v * 2 + n", T).to_pylist()
    assert got == [21.0, 122.0, None, 164.0]


def test_kleene_null_semantics():
    # SQL three-valued logic: NULL && false == false, NULL && true == NULL
    got = eval_expr("v > 50 && n < 4", T).to_pylist()
    assert got == [False, True, None, False]
    got = eval_expr("v > 50 || n < 2", T).to_pylist()
    assert got == [True, True, None, True]
    # predicate wrapper: nulls count as False (WHERE semantics)
    mask = compile_predicate("v > 50 && n < 4")(T).to_pylist()
    assert mask == [False, True, False, False]


def test_registry_functions_and_string_concat():
    got = eval_expr('uppercase(name) + "-x"', T).to_pylist()
    assert got == ["CLICK-x", "VIEW-x", "ERROR-x", None]
    got = eval_expr('contains(name, "ck")', T).to_pylist()
    assert got == [True, False, False, None]
    got = eval_expr("length(name)", T).to_pylist()
    assert got == [5, 4, 5, None]
    # nested calls with expression args
    got = eval_expr("floor(v / 25.0)", T).to_pylist()
    assert got == [0.0, 2.0, None, 3.0]


def test_errors():
    with pytest.raises(SyntaxError):
        compile_expr("v >")
    with pytest.raises(SyntaxError):
        compile_expr("not_a_function(v)")
    with pytest.raises(SyntaxError):
        compile_expr("v ~ 3")
    with pytest.raises(KeyError):
        eval_expr("missing_col + 1", T)
    with pytest.raises(TypeError):
        compile_predicate("v + 1")(T)


def test_builder_string_where_and_eval_step(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from vertex_ray.pipelines.builder import build

    p = str(tmp_path / "ev.parquet")
    pq.write_table(T, p)
    cfg = {
        "sources": {"src": {"type": "parquet", "path": p}},
        "transforms": {
            "big": {"type": "filter", "inputs": ["src"],
                    "where": 'v > 50 && contains(name, "v")'},
            "derived": {"type": "eval", "inputs": ["src"],
                        "set": {"dbl": "v * 2",
                                "tag": 'uppercase(name) + "!"'},
                        "drop": ["n"]},
        },
    }
    built = build(cfg)
    big = built["big"].to_pandas()
    assert big["name"].tolist() == ["view"]
    d = built["derived"].to_pandas()
    assert "n" not in d.columns
    assert d["dbl"].tolist()[:2] == [20.0, 120.0]
    assert d["tag"].tolist()[0] == "CLICK!"
