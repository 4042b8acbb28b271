"""Text expression language over Arrow batches — the engine's analogue
of the reference's VTL scripts (lib/vtl/src/compiler/: filter/route
conditions and rewrite programs are VTL text compiled once, then run per
event). Here an expression is compiled ONCE into a tree of closures over
``pyarrow.compute`` kernels and the vectorized function registry
(functions/registry.FUNCTIONS — the 74-name VTL stdlib re-expressed
columnar), then evaluated per BATCH: one kernel call per AST node per
batch, never a per-row loop. The write-side twin of the read-side
PromQL front-end (vertex_ray/promql_lang).

Grammar::

    expr    := or
    or      := and   (("||" | "or")  and)*
    and     := not   (("&&" | "and") not)*
    not     := "!" not | cmp
    cmp     := add (("==" "!=" ">" ">=" "<" "<=") add)?
    add     := mul (("+" | "-") mul)*
    mul     := unary (("*" | "/" | "%") unary)*
    unary   := "-" unary | atom
    atom    := NUMBER | STRING | "true" | "false" | "null"
             | NAME "(" [expr ("," expr)*] ")"     # registry function
             | NAME                                # column reference
             | "(" expr ")"

Semantics: columns are the namespace (a bare NAME reads ``t[name]``);
``and``/``or`` are Kleene three-valued over nullable booleans (SQL
semantics, so a text predicate and its DuckDB mirror agree on NULLs);
``+`` on two strings concatenates; registry functions receive evaluated
arguments (scalars stay scalars — pyarrow kernels broadcast them).

Used by the config→pipeline builder: ``where:``/``routes:`` accept an
expression STRING anywhere an s-expression predicate is accepted, and
the ``eval`` step (the rewrite-transform analogue,
/root/reference src/transforms/rewrite.rs:72-135) sets derived columns
from expressions and drops others.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["compile_expr", "compile_predicate", "eval_expr"]

_TOKEN_RE = re.compile(
    r"""(?P<WS>\s+)
      | (?P<NUM>\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+|\d+(?:[eE][+-]?\d+)?)
      | (?P<NAME>[A-Za-z_][A-Za-z0-9_]*)
      | (?P<STR>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
      | (?P<OP>\|\||&&|==|!=|>=|<=|[-+*/%()!,<>.\[\]])
    """,
    re.X,
)


def _lex(src: str):
    toks, i = [], 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise SyntaxError(f"expr: bad character {src[i]!r} at {i}")
        i = m.end()
        if m.lastgroup != "WS":
            toks.append((m.lastgroup, m.group()))
    toks.append(("EOF", ""))
    return toks


def _unquote(s: str) -> str:
    body = s[1:-1]
    return re.sub(r"\\(.)", r"\1", body)


def _unwrap(x):
    # kernels on scalar-only operands return pa.Scalar — keep literal
    # subtrees as plain Python values so they broadcast downstream
    return x.as_py() if isinstance(x, pa.Scalar) else x


def _w(f):
    return lambda *a: _unwrap(f(*a))


_CMP = {"==": _w(pc.equal), "!=": _w(pc.not_equal), ">": _w(pc.greater),
        ">=": _w(pc.greater_equal), "<": _w(pc.less),
        "<=": _w(pc.less_equal)}
_MUL = {"*": _w(pc.multiply), "/": _w(pc.divide),
        "%": _w(lambda a, b: pc.subtract(
            a, pc.multiply(pc.floor(pc.divide(a, b)), b)))}


def _is_str(x) -> bool:
    if isinstance(x, str):
        return True
    t = getattr(x, "type", None)
    return t is not None and (pa.types.is_string(t)
                              or pa.types.is_large_string(t))


def _kb(x):
    # Kleene kernels lack a (bool, null) kernel for plain-Python
    # operands — type the null literal as boolean
    return pa.scalar(None, pa.bool_()) if x is None else x


# functions whose first parameter is a plain-Python scalar by contract
_SCALAR_FIRST = {"format", "now", "get_env", "get_hostname"}


def _call(name, fn, args):
    # literal-only subtrees reach registry functions as plain Python
    # scalars; the registry's contract is Array-first, so lift the
    # first argument to a 1-element array (it broadcasts downstream)
    if args and name not in _SCALAR_FIRST and not any(
            isinstance(a, (pa.Array, pa.ChunkedArray)) for a in args):
        args = [pa.array([args[0]])] + list(args[1:])
    return _unwrap(fn(*args))


def _add(a, b):
    if a is None or b is None:
        return None
    if _is_str(a) or _is_str(b):
        n = None
        for x in (a, b):
            if not isinstance(x, str):
                n = len(x)
        if n is None:
            return a + b  # two python strings
        a = pa.array([a] * n) if isinstance(a, str) else a
        b = pa.array([b] * n) if isinstance(b, str) else b
        return pc.binary_join_element_wise(a, b, "")
    return pc.add(a, b)


class _Parser:
    def __init__(self, src: str):
        self.toks = _lex(src)
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, v):
        k, got = self.next()
        if got != v:
            raise SyntaxError(f"expr: expected {v!r}, got {got!r}")

    def at(self, v):
        return self.peek()[1] == v

    def parse(self):
        e = self.or_()
        if self.peek()[0] != "EOF":
            raise SyntaxError(
                f"expr: trailing input at {self.peek()[1]!r}")
        return e

    def or_(self):
        e = self.and_()
        while self.peek()[1] in ("||", "or"):
            self.next()
            r = self.and_()
            e = (lambda a, b: lambda t: _unwrap(
                pc.or_kleene(_kb(a(t)), _kb(b(t)))))(e, r)
        return e

    def and_(self):
        e = self.not_()
        while self.peek()[1] in ("&&", "and"):
            self.next()
            r = self.not_()
            e = (lambda a, b: lambda t: _unwrap(
                pc.and_kleene(_kb(a(t)), _kb(b(t)))))(e, r)
        return e

    def not_(self):
        if self.at("!"):
            self.next()
            inner = self.not_()
            return lambda t: _unwrap(pc.invert(inner(t)))
        return self.cmp()

    def cmp(self):
        e = self.add()
        if self.peek()[1] in _CMP:
            op = _CMP[self.next()[1]]
            r = self.add()
            return (lambda a, b, f: lambda t: f(a(t), b(t)))(e, r, op)
        return e

    def add(self):
        e = self.mul()
        while self.peek()[1] in ("+", "-"):
            sym = self.next()[1]
            r = self.mul()
            f = _w(_add) if sym == "+" else _w(pc.subtract)
            e = (lambda a, b, g: lambda t: g(a(t), b(t)))(e, r, f)
        return e

    def mul(self):
        e = self.unary()
        while self.peek()[1] in _MUL:
            f = _MUL[self.next()[1]]
            r = self.unary()
            e = (lambda a, b, g: lambda t: g(a(t), b(t)))(e, r, f)
        return e

    def unary(self):
        if self.at("-"):
            self.next()
            inner = self.unary()
            return lambda t: _unwrap(pc.negate(inner(t)))
        return self.atom()

    def atom(self):
        e = self._atom_base()
        # nested-path postfix (lib/value/src/path analogue):
        # ``doc.a.b[2]`` / ``parse_json(s).items[-1].id`` — compiled to
        # ONE vectorized path_get over the base column per batch
        if self.at(".") or self.at("["):
            from vertex_ray.functions.path import path_get

            steps = []
            while self.at(".") or self.at("["):
                if self.at("."):
                    self.next()
                    k, v = self.next()
                    if k == "STR":
                        steps.append(("field", _unquote(v)))
                    elif k == "NAME":
                        steps.append(("field", v))
                    else:
                        raise SyntaxError(
                            f"expr: bad path segment {v!r}")
                else:
                    self.next()
                    sign = 1
                    if self.at("-"):
                        self.next()
                        sign = -1
                    k, v = self.next()
                    if k == "NUM" and "." not in v:
                        steps.append(("index", sign * int(v)))
                    elif k == "STR" and sign == 1:
                        steps.append(("field", _unquote(v)))
                    else:
                        raise SyntaxError(f"expr: bad path index {v!r}")
                    self.expect("]")
            return (lambda b, st: lambda t: path_get(b(t), st))(e, steps)
        return e

    def _atom_base(self):
        k, v = self.next()
        if k == "NUM":
            lit = float(v) if any(c in v for c in ".eE") else int(v)
            return lambda t: lit
        if k == "STR":
            s = _unquote(v)
            return lambda t: s
        if v == "(":
            e = self.or_()
            self.expect(")")
            return e
        if k != "NAME":
            raise SyntaxError(f"expr: unexpected {v!r}")
        if v == "true":
            return lambda t: True
        if v == "false":
            return lambda t: False
        if v == "null":
            return lambda t: None
        if self.at("("):
            from vertex_ray.functions.registry import FUNCTIONS

            if v not in FUNCTIONS:
                raise SyntaxError(f"expr: unknown function {v!r} "
                                  "(see functions/registry.FUNCTIONS)")
            fn = FUNCTIONS[v]
            self.next()
            args = []
            while not self.at(")"):
                args.append(self.or_())
                if self.at(","):
                    self.next()
            self.expect(")")
            return (lambda nm, f, ags: lambda t: _call(
                nm, f, [a(t) for a in ags]))(v, fn, args)
        name = v

        def col(t):
            if name not in t.schema.names:
                raise KeyError(
                    f"expr: no column {name!r} in batch "
                    f"(have {t.schema.names})")
            c = t[name]
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) \
                else c

        return col


def compile_expr(src: str):
    """Compile an expression to ``fn(pa.Table) -> pa.Array | scalar``.
    Parsing happens once; per-batch evaluation is one pyarrow kernel
    call per AST node."""
    return _Parser(src).parse()


def compile_predicate(src: str):
    """Compile a boolean expression to a batch mask function
    (``fn(pa.Table) -> BooleanArray``, nulls counted as False — SQL
    WHERE semantics, so a DuckDB mirror of the same text agrees)."""
    fn = compile_expr(src)

    def pred(t: pa.Table):
        m = fn(t)
        if not hasattr(m, "type") or not pa.types.is_boolean(m.type):
            raise TypeError(f"expr: predicate {src!r} is not boolean")
        return pc.fill_null(m, False)

    return pred


def eval_expr(src: str, t: pa.Table):
    """One-shot convenience: compile and evaluate against a batch."""
    return compile_expr(src)(t)
