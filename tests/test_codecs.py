"""Deserializer codecs: JSON-lines / logfmt / syslog (vectorized decode,
reference: lib/codecs/src/decoding/config.rs:48)."""

import numpy as np
import pyarrow as pa

from vertex_ray.sources.codecs import (
    decode_json_lines,
    decode_logfmt,
    decode_syslog,
)


def test_json_lines_batch_parse():
    t = pa.table({"text": ['{"a": 1, "b": "x"}', '{"a": 2, "b": "y"}']})
    out = decode_json_lines(t)
    assert out["a"].to_pylist() == [1, 2]
    assert out["b"].to_pylist() == ["x", "y"]


def test_json_lines_bad_line_dropped():
    t = pa.table({"text": ['{"a": 1}', "not json", '{"a": 3}']})
    out = decode_json_lines(t)
    assert out["a"].to_pylist() == [1, 3]
    import pytest

    with pytest.raises(Exception):
        decode_json_lines(t, strict=True)


def test_logfmt_quoted_and_missing_keys():
    t = pa.table(
        {
            "text": [
                'level=info msg="hello world" n=3',
                'level=warn extra="a \\"quoted\\" bit"',
                "",
            ]
        }
    )
    out = decode_logfmt(t)
    assert out["level"].to_pylist() == ["info", "warn", None]
    assert out["msg"].to_pylist() == ["hello world", None, None]
    assert out["extra"].to_pylist()[1] == 'a "quoted" bit'
    assert out["n"].to_pylist() == ["3", None, None]


def test_syslog_fields_and_unparseable():
    t = pa.table(
        {
            "text": [
                "<13>Jan  1 00:00:05 host1 sshd[42]: accepted",
                "<165>Feb 12 13:14:15 web02 app: started ok",
                "garbage line",
            ]
        }
    )
    out = decode_syslog(t, year=2026)
    assert out["severity"].to_pylist()[:2] == [5.0, 5.0]
    assert out["facility"].to_pylist()[:2] == [1.0, 20.0]
    assert out["host"].to_pylist() == ["host1", "web02", None]
    assert out["pid"].to_pylist()[0] == 42.0
    assert np.isnan(out["pid"].to_pylist()[1])
    assert out["message"].to_pylist()[:2] == ["accepted", "started ok"]
    assert out["ts"].to_pylist()[0].month == 1


def test_decode_csv_basic():
    import pyarrow as pa

    from vertex_ray.sources.codecs import decode_csv

    t = pa.table({"text": ["1,click,2.5", "2,view,0.125", ""]})
    out = decode_csv(t, column_names=["event_id", "event_type", "value"])
    assert out["event_id"].to_pylist() == [1, 2]
    assert out["event_type"].to_pylist() == ["click", "view"]
    assert out["value"].to_pylist() == [2.5, 0.125]


def test_decode_csv_skips_malformed_unless_strict():
    import pyarrow as pa
    import pytest as _pt

    from vertex_ray.sources.codecs import decode_csv

    t = pa.table({"text": ["1,click,2.5", "bad,row,with,extra,cols", "3,err,1.0"]})
    out = decode_csv(t, column_names=["event_id", "event_type", "value"])
    assert out["event_id"].to_pylist() == [1, 3]
    with _pt.raises(Exception):
        decode_csv(t, column_names=["event_id", "event_type", "value"],
                   strict=True)


def test_framing_modes():
    from vertex_ray.sources.codecs import (
        frame_char_delimited,
        frame_length_delimited,
        frame_octet_counting,
    )

    assert frame_char_delimited(b"a\nbb\nccc\n") == [b"a", b"bb", b"ccc"]
    assert frame_char_delimited(b"a|bb", b"|") == [b"a", b"bb"]
    assert frame_char_delimited(b"") == []

    assert frame_octet_counting(b"1 a3 bbb2 cc") == [b"a", b"bbb", b"cc"]
    # multi-digit counts and embedded spaces/newlines inside frames
    assert frame_octet_counting(b"11 hello world") == [b"hello world"]
    import pytest as _p
    with _p.raises(ValueError):
        frame_octet_counting(b"5 ab")  # truncated

    buf = b"".join(len(f).to_bytes(4, "big") + f for f in (b"x", b"yz"))
    assert frame_length_delimited(buf) == [b"x", b"yz"]
    with _p.raises(ValueError):
        frame_length_delimited(buf[:-1])
