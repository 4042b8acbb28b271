"""Mini conformance corpus for the text expression language — the
analogue of the reference's VTL conformance suite (lib/vtl/tests/**:
18 .vtl files of assert_eq programs run by the compiler under test,
SURVEY.md §5.6). Each tests/exprlang_corpus/*.vtl line is one exprlang
expression compiled by functions/exprlang.compile_expr and evaluated
over a fixed Arrow batch; assert/assert_eq raise on mismatch, so a
vector failing IS the test failing."""

import glob
import os

import pyarrow as pa
import pytest

from vertex_ray.functions.exprlang import compile_expr

CORPUS_DIR = os.path.join(os.path.dirname(__file__), "exprlang_corpus")

# the batch every vector evaluates against: columns are the namespace
FIXTURE = pa.table({
    "x": pa.array([1, 5, 9], type=pa.int64()),
    "f": pa.array([0.5, 2.25, -3.0], type=pa.float64()),
    "s": pa.array(["alpha", "Bravo C", "delta-9"], type=pa.string()),
    # nested document column for the paths corpus (lib/value/src/path)
    "j": pa.array([{"a": {"b": [{"k": 1}, {"k": 2}], "c": "p"}}] * 3),
})


def _vectors():
    for path in sorted(glob.glob(os.path.join(CORPUS_DIR, "*.vtl"))):
        name = os.path.splitext(os.path.basename(path))[0]
        with open(path) as fh:
            for ln, line in enumerate(fh, 1):
                line = line.strip()
                if line and not line.startswith("#"):
                    yield pytest.param(line, id=f"{name}:{ln}")


@pytest.mark.parametrize("expr", list(_vectors()))
def test_exprlang_conformance(expr):
    compile_expr(expr)(FIXTURE)


def test_corpus_has_vectors():
    n = len(list(_vectors()))
    assert n >= 60, n
