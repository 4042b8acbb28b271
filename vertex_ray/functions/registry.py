"""Scalar function surface — the engine's analogue of the reference's VTL
stdlib (lib/vtl/src/compiler/function/, 74 functions; SURVEY.md §2.5).

We do NOT build an expression language: user logic is plain Python over
Arrow batches, and this registry provides the vectorized building blocks
(pyarrow.compute kernels with consistent names) so pipeline configs can
name transformations. Every function maps Array/ChunkedArray → Array.

Coverage of the VTL names that make sense columnar: string case/trim/
slice/split/replace/starts/ends/contains, parse/format timestamp, unix
time conversion, numeric abs/ceil/floor/round/mod/log, type predicates
and casts, length, hashing (md5-based like relabel hashmod, plus sha256
— xxhash is not in this container), base64, redact, truncate, unique.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _np_str(arr, fn):
    vals = arr.to_numpy(zero_copy_only=False) if hasattr(arr, "to_numpy") else np.asarray(arr)
    return pa.array([fn(v) if v is not None else None for v in vals])


def _camel(s: str) -> str:
    parts = [p for p in __import__("re").split(r"[_\-\s]+", s) if p]
    return parts[0].lower() + "".join(p.title() for p in parts[1:]) if parts else s


def _pascal(s: str) -> str:
    parts = [p for p in __import__("re").split(r"[_\-\s]+", s) if p]
    return "".join(p.title() for p in parts)


def _snake(s: str) -> str:
    import re

    s = re.sub(r"([a-z0-9])([A-Z])", r"\1_\2", s)
    return re.sub(r"[\-\s]+", "_", s).lower()


def _kebab(s: str) -> str:
    return _snake(s).replace("_", "-")


def _md5hex(s: str) -> str:
    import hashlib

    return hashlib.md5(s.encode()).hexdigest()


def _sha256hex(s: str) -> str:
    import hashlib

    return hashlib.sha256(s.encode()).hexdigest()


def _b64e(s: str) -> str:
    import base64

    return base64.b64encode(s.encode()).decode()


def _b64d(s: str) -> str:
    import base64

    return base64.b64decode(s.encode()).decode()


FUNCTIONS: dict = {
    # string case / shape (VTL: lowercase uppercase camelcase pascalcase
    # snakecase kebabcase trim truncate slice split join replace)
    "lowercase": pc.utf8_lower,
    "uppercase": pc.utf8_upper,
    "capitalize": pc.utf8_capitalize,
    "trim": pc.utf8_trim_whitespace,
    "camelcase": lambda a: _np_str(a, _camel),
    "pascalcase": lambda a: _np_str(a, _pascal),
    "snakecase": lambda a: _np_str(a, _snake),
    "kebabcase": lambda a: _np_str(a, _kebab),
    "truncate": lambda a, n=16: pc.utf8_slice_codeunits(a, 0, n),
    "slice": lambda a, start, stop: pc.utf8_slice_codeunits(a, start, stop),
    "split": lambda a, sep=" ": pc.split_pattern(a, sep),
    "replace": lambda a, pat, rep: pc.replace_substring(a, pat, rep),
    "starts_with": lambda a, p: pc.starts_with(a, p),
    "ends_with": lambda a, p: pc.ends_with(a, p),
    "contains": lambda a, p: pc.match_substring(a, p),
    "match": lambda a, rx: pc.match_substring_regex(a, rx),
    "length": pc.utf8_length,
    "redact": lambda a, rx, rep="[REDACTED]": pc.replace_substring_regex(a, rx, rep),
    # numeric (VTL: abs ceil floor round mod log to_float to_integer)
    "abs": pc.abs,
    "ceil": pc.ceil,
    "floor": pc.floor,
    "round": lambda a, n=0: pc.round(a, ndigits=n),
    "mod": lambda a, m: pa.array(a.to_numpy(zero_copy_only=False) % m),
    "log": pc.ln,
    "to_float": lambda a: pc.cast(a, pa.float64()),
    "to_integer": lambda a: pc.cast(a, pa.int64()),
    "to_string": lambda a: pc.cast(a, pa.string()),
    "to_bool": lambda a: pc.cast(a, pa.bool_()),
    # timestamps (VTL: parse_timestamp from/to_unix_timestamp format now)
    "parse_timestamp": lambda a, fmt="%Y-%m-%dT%H:%M:%S": pc.strptime(a, fmt, "us"),
    "to_unix_timestamp": lambda a: pc.divide(pc.cast(a, pa.int64()), 1_000_000),
    "from_unix_timestamp": lambda a: pc.cast(
        pc.multiply(pc.cast(a, pa.int64()), 1_000_000), pa.timestamp("us")
    ),
    "format_timestamp": lambda a, fmt="%Y-%m-%dT%H:%M:%S": pc.strftime(a, fmt),
    # predicates (VTL: is_null is_float is_integer is_string exists)
    "is_null": pc.is_null,
    "is_valid": pc.is_valid,
    # hashing / encoding (VTL: xxhash → md5/sha256 here; encode/decode_base64)
    "md5": lambda a: _np_str(a, _md5hex),
    "sha256": lambda a: _np_str(a, _sha256hex),
    "encode_base64": lambda a: _np_str(a, _b64e),
    "decode_base64": lambda a: _np_str(a, _b64d),
    # collections
    "unique": pc.unique,
    "list_length": pc.list_value_length,
}


def apply(name: str, arr, *args, **kwargs):
    """Apply a registered function by name (the config-surface entry point)."""
    return FUNCTIONS[name](arr, *args, **kwargs)
