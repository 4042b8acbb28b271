"""Heterogeneous (schemaless) JSON documents — functions/jsonval:
type-tagged extraction + the reference's type-sensitive dedup semantics
(lib/value/src/lib.rs:49-83 discriminant hashing;
src/transforms/dedup.rs:375-420 type-matching fixtures)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from vertex_ray.functions.jsonval import (
    TAG_BOOL,
    TAG_BYTES,
    TAG_INT,
    TAG_NULL,
    TAG_OBJECT,
    dedup_json_typed,
    json_extract_typed,
    json_typed_op,
)


def test_extract_types_and_renderings():
    docs = np.array([
        '{"m":"123"}', '{"m":123}', '{"m":-5}', '{"m":1.5}', '{"m":true}',
        '{"m":null}', '{"m":{"a":1}}', '{"m":[1,2]}', '{"x":0}',
        'not json',
    ], dtype=object)
    tags, names, rends = json_extract_typed(docs, ".m")
    assert list(names) == ["VARCHAR", "UBIGINT", "BIGINT", "DOUBLE",
                           "BOOLEAN", "NULL", "OBJECT", "ARRAY", "NULL",
                           "NULL"]
    assert rends[0] == "123" and rends[1] == "123"    # same rendering...
    assert tags[0] == TAG_BYTES and tags[1] == TAG_INT  # ...different tag
    assert rends[3] == "1.5" and rends[4] == "true"
    assert rends[6] == '{"a":1}' and rends[7] == "[1,2]"
    assert tags[5] == TAG_NULL and rends[5] is None
    assert tags[9] == TAG_NULL  # unparseable → NULL tag, never a crash


def test_extract_nested_and_index():
    docs = np.array(['{"a":{"b":[10,20,30]}}', '{"a":{"b":[]}}'],
                    dtype=object)
    tags, names, rends = json_extract_typed(docs, ".a.b[-1]")
    assert rends[0] == "30" and tags[0] == TAG_INT
    assert tags[1] == TAG_NULL  # out-of-range index → Null, not error


def test_dedup_type_matching(ray_session):
    """The reference's dedup_match_type_matching: "123" (string) and 123
    (integer) share a rendering but are NOT duplicates."""
    docs = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "doc": pa.array([
            '{"message":"message","matched":"123"}',
            '{"message":"message","matched":123}',
            '{"message":"message","matched":"123"}',   # dupe of row 1
            '{"message":"message","matched":123}',     # dupe of row 2
        ]),
    })
    out = dedup_json_typed(rd.from_arrow(docs), "doc",
                           {"m": ".matched"}, "id", n_buckets=4) \
        .to_pandas().sort_values("id")
    assert out["id"].tolist() == [1, 2]  # both types kept, firsts win
    assert set(zip(out["m_type"], out["m_val"])) == {
        ("VARCHAR", "123"), ("UBIGINT", "123")}


def test_dedup_type_matching_nested_objects(ray_session):
    """dedup.rs type_matching_nested_objects: a sub-OBJECT key whose
    inner value differs only by type is two keys."""
    docs = pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "doc": pa.array([
            '{"matched":{"key":"123"}}',
            '{"matched":{"key":123}}',
            '{"matched":{"key":"123"}}',
        ]),
    })
    out = dedup_json_typed(rd.from_arrow(docs), "doc",
                           {"m": ".matched"}, "id", n_buckets=2) \
        .to_pandas().sort_values("id")
    assert out["id"].tolist() == [1, 2]
    assert set(out["m_val"]) == {'{"key":"123"}', '{"key":123}'}


def test_json_typed_op_columns(ray_session):
    docs = pa.table({"doc": pa.array(['{"a":1,"b":"x"}', '{"a":"1"}'])})
    out = (rd.from_arrow(docs)
           .map_batches(json_typed_op("doc", {"a": ".a", "b": ".b"}),
                        batch_format="pyarrow").to_pandas())
    assert out["a_type"].tolist() == ["UBIGINT", "VARCHAR"]
    assert out["a_val"].tolist() == ["1", "1"]
    assert out["b_type"].tolist() == ["VARCHAR", "NULL"]
    assert out["b_val"].tolist() == ["x", None]
