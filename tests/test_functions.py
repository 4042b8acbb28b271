"""VTL stdlib completion: parse_* family, list/struct ops, predicates
(reference: lib/vtl/src/compiler/function/ — 74 names, SURVEY §2.5).
parse_bytes / parse_duration vectors mirror the reference's unit tests."""

import numpy as np
import pyarrow as pa
import pytest

from vertex_ray.functions.registry import FUNCTIONS, apply


def test_registry_covers_vtl_stdlib():
    # every columnar-expressible VTL name is registered
    vtl = """abs append camelcase ceil cidr_contains compact contains
    decode_base64 del encode_base64 ends_with exists find flatten floor
    format from_unix_timestamp get get_env get_hostname includes is_array
    is_bool is_empty is_float is_integer is_ipv4 is_ipv6 is_null is_object
    is_string is_timestamp join kebabcase keys length log lowercase match
    merge mod now parse_bytes parse_duration parse_json parse_query
    parse_regex parse_timestamp parse_url parse_user_agent pascalcase push
    redact replace round set slice snakecase split starts_with to_bool
    to_float to_integer to_string to_unix_timestamp trim truncate typeof
    unique uppercase values xxhash assert assert_eq""".split()
    missing = [n for n in vtl if n not in FUNCTIONS]
    assert not missing, missing


def test_parse_bytes_reference_vectors():
    out = apply("parse_bytes", pa.array(["1MiB", "1kb", "5 GiB", "12", "zzz"]))
    vals = out.to_pylist()
    assert vals[0] == 1_048_576.0
    assert vals[1] == 1000.0
    assert vals[2] == 5 * (1 << 30)
    assert vals[3] == 12.0
    assert np.isnan(vals[4])
    assert apply("parse_bytes", pa.array(["1MiB"]), unit="kib").to_pylist() == [1024.0]


def test_parse_duration_reference_vectors():
    # (input, unit, want) straight from parse_duration.rs tests
    cases = [
        ("30s", "m", 0.5),
        ("100ms", "ms", 100.0),
        ("1005ms", "s", 1.005),
        ("100ns", "ms", 0.0001),
        ("100us", "ms", 0.1),
        ("1d", "s", 86400.0),
        ("1d1s", "s", 86401.0),
        ("1s1ms", "ms", 1001.0),
        ("1s", "ns", 1_000_000_000.0),
        ("1w", "ns", 604_800_000_000_000.0),
    ]
    for inp, unit, want in cases:
        got = apply("parse_duration", pa.array([inp]), unit=unit).to_pylist()[0]
        assert got == pytest.approx(want), (inp, unit, got, want)
    bad = apply("parse_duration", pa.array(["1x", None, ""]), unit="s").to_pylist()
    assert all(v is None or np.isnan(v) for v in bad)


def test_parse_json_and_query():
    j = apply("parse_json", pa.array(['{"a": 1, "b": "x"}', "nope", None]))
    assert j[0].as_py() == {"a": 1, "b": "x"}
    assert j[1].as_py() is None
    q = apply("parse_query", pa.array(["?a=1&b=x%20y&a=2", None]))
    assert q[0].as_py() == [("a", "1"), ("b", "x y"), ("a", "2")]
    assert q[1].as_py() is None


def test_parse_url_fields():
    t = apply(
        "parse_url",
        pa.array(
            [
                "https://u:p@example.com:8443/a/b?x=1#frag",
                "http://example.org/",
                "not a url",
            ]
        ),
    )
    assert t["scheme"].to_pylist() == ["https", "http", None]
    assert t["host"].to_pylist() == ["example.com", "example.org", None]
    assert t["port"].to_pylist()[0] == 8443.0
    assert t["path"].to_pylist()[:2] == ["/a/b", "/"]
    assert t["query"].to_pylist()[0] == "x=1"
    assert t["fragment"].to_pylist()[0] == "frag"
    assert t["username"].to_pylist()[0] == "u"


def test_parse_regex_named_groups():
    t = apply(
        "parse_regex",
        pa.array(["GET /x 200", "POST /y 404", "garbage"]),
        r"(?P<method>[A-Z]+) (?P<path>\S+) (?P<code>\d+)",
    )
    assert t["method"].to_pylist() == ["GET", "POST", None]
    assert t["code"].to_pylist() == ["200", "404", None]


def test_parse_user_agent():
    t = apply(
        "parse_user_agent",
        pa.array(
            [
                "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
                "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
                "curl/8.4.0",
                None,
            ]
        ),
    )
    assert t["browser"].to_pylist() == ["Chrome", "curl", None]
    assert t["version"].to_pylist()[0].startswith("120.")
    assert t["os"].to_pylist()[0] == "Windows"


def test_ip_and_cidr():
    ips = pa.array(["10.1.2.3", "11.0.0.1", "256.1.1.1", "::1", None])
    assert apply("is_ipv4", ips).to_pylist() == [True, True, False, False, False]
    assert apply("is_ipv6", ips).to_pylist() == [False, False, False, True, False]
    got = apply("cidr_contains", "10.0.0.0/8", ips)
    assert got.to_pylist() == [True, False, False, False, False]
    got6 = apply("cidr_contains", "::/64", ips)
    assert got6.to_pylist() == [False, False, False, True, False]


def test_list_ops():
    a = pa.array([[1, 2], [], [3]])
    assert apply("append", a, 9).to_pylist() == [[1, 2, 9], [9], [3, 9]]
    assert apply("includes", a, 3).to_pylist() == [False, False, True]
    s = pa.array([["x", None, ""], ["y"]])
    assert apply("compact", s).to_pylist() == [["x"], ["y"]]
    assert apply("join", pa.array([["a", "b"], ["c"]]), "-").to_pylist() == ["a-b", "c"]
    assert apply("find", pa.array(["hello", "world"]), "o").to_pylist() == [4, 1]


def test_struct_ops():
    s = pa.array([{"a": 1, "b": {"c": "x"}}, {"a": 2, "b": {"c": None}}])
    assert apply("get", s, "b.c").to_pylist() == ["x", None]
    assert apply("exists", s, "b.c").to_pylist() == [True, False]
    assert apply("exists", s, "zz").to_pylist() == [False, False]
    s2 = apply("set", s, "d", pa.array([10, 20]))
    assert apply("get", s2, "d").to_pylist() == [10, 20]
    s3 = apply("del", s2, "b")
    assert [f.name for f in s3.type] == ["a", "d"]
    m = apply("merge", s3, pa.array([{"a": 9}, {"a": 8}]))
    assert apply("get", m, "a").to_pylist() == [9, 8]
    assert apply("keys", s).to_pylist() == [["a", "b"], ["a", "b"]]
    flat = apply("flatten", s)
    assert flat.column_names == ["a", "b.c"]
    assert flat["b.c"].to_pylist() == ["x", None]
    vals = apply("values", s3).to_pylist()
    assert vals[0] == ["1", "10"]


def test_predicates_and_misc():
    assert apply("typeof", pa.array([1, None])).to_pylist() == ["integer", "null"]
    assert apply("typeof", pa.array([{"a": 1}])).to_pylist() == ["object"]
    assert apply("is_integer", pa.array([1, None])).to_pylist() == [True, False]
    assert apply("is_string", pa.array(["x"])).to_pylist() == [True]
    assert apply("is_empty", pa.array(["", "x", None])).to_pylist() == [True, False, True]
    assert apply("is_empty", pa.array([[], [1]])).to_pylist() == [True, False]
    f = apply("format", "[{}] {}!", pa.array([1, 2]), pa.array(["a", "b"]))
    assert f.to_pylist() == ["[1] a!", "[2] b!"]
    assert len(apply("now", 3)) == 3
    assert apply("get_hostname", 2).to_pylist()[0]
    h = apply("xxhash", pa.array(["a", "b", "a"])).to_pylist()
    assert h[0] == h[2] != h[1]
    apply("assert", pa.array([True, True]))
    with pytest.raises(AssertionError):
        apply("assert", pa.array([True, False]))
    apply("assert_eq", pa.array([1, 2]), pa.array([1, 2]))
    with pytest.raises(AssertionError):
        apply("assert_eq", pa.array([1]), pa.array([2]))


def test_levenshtein_vectorized():
    import numpy as np
    import pyarrow as pa

    from vertex_ray.functions.registry import apply

    a = pa.array(["kitten", "sitting", "", None, "saturday", "sittings"])
    got = apply("levenshtein", a, "sitting").to_pylist()
    assert got == [3, 0, 7, 7, 6, 1]
    # unicode beyond the BMP path (utf-32 codepoint view)
    b = pa.array(["héllo", "hello"])
    assert apply("levenshtein", b, "hello").to_pylist() == [1, 0]
