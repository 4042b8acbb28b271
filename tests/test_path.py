"""functions/path: vectorized nested get/set vs a per-row Python
reference over randomized documents (hypothesis)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from vertex_ray.functions.path import parse_path, path_get, path_set

_scalar = st.one_of(st.integers(-5, 5), st.text("ab", max_size=2),
                    st.none())
_doc = st.recursive(
    _scalar,
    lambda kids: st.one_of(
        st.lists(kids, max_size=3),
        st.dictionaries(st.sampled_from(["a", "b", "c"]), kids,
                        max_size=3)),
    max_leaves=8)


def _ref_get(doc, steps):
    for kind, key in steps:
        if kind == "field":
            if isinstance(doc, dict):
                doc = doc.get(key)
            else:
                return None
        else:
            if isinstance(doc, list):
                n = len(doc)
                i = key if key >= 0 else n + key
                doc = doc[i] if 0 <= i < n else None
            else:
                return None
    return doc


@settings(max_examples=60, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=6),
       st.lists(st.one_of(
           st.sampled_from([("field", "a"), ("field", "b"),
                            ("field", "c")]),
           st.integers(-2, 2).map(lambda i: ("index", i))),
           min_size=1, max_size=3))
def test_path_get_matches_reference(docs, steps):
    try:
        col = pa.array(docs)
    except (pa.ArrowInvalid, pa.ArrowTypeError):
        return  # mixed-type docs Arrow cannot infer — out of scope
    got = path_get(col, steps).to_pylist()
    exp = [_ref_get(d, steps) for d in docs]
    # Arrow surfaces missing as None; reference likewise
    assert got == exp


def test_parse_path_forms():
    assert parse_path(".a.b[2]") == [("field", "a"), ("field", "b"),
                                     ("index", 2)]
    assert parse_path("a[0][-1].c") == [("field", "a"), ("index", 0),
                                        ("index", -1), ("field", "c")]
    assert parse_path('."odd key".x') == [("field", "odd key"),
                                          ("field", "x")]


def test_path_set_creates_and_overwrites():
    col = pa.array([{"a": {"x": 1}}, None, {"a": None}])
    out = path_set(col, ".a.y", pa.array([10, 20, 30]))
    assert path_get(out, ".a.y").to_pylist() == [10, 20, 30]
    # pre-existing sibling preserved where it existed
    assert path_get(out, ".a.x").to_pylist() == [1, None, None]
