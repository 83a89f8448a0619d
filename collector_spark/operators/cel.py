"""CEL-subset filter — the reference's `cel` processor re-expressed as a
Catalyst expression.

Reference semantics (internal/processor/cel/cel.go:50-88, engine.go:13-106):
- each rule is a CEL expression over ``event`` = the parsed JSON line;
- rules are OR-composed; rule errors count as non-match;
- ``action: accept`` keeps matching rows, ``reject`` keeps non-matching;
- non-JSON / empty lines are dropped BEFORE evaluation;
- invalid rules are rejected at config (plan-build) time.

The reference re-parses and re-checks each CEL program per line per rule
(engine.go:37-70) — an anti-pattern we deliberately do not replicate: here
every rule is compiled ONCE, at plan build, into a native Spark Column, so
filtering runs JVM-side inside whole-stage codegen with predicate pushdown;
no Python is involved per row.

Supported CEL subset (everything the reference's tests exercise, plus
common string predicates and arithmetic): ``== != < <= > >= && || !``,
``+ - * / %`` (unary minus included; truncated remainder matching
Spark/DuckDB), parentheses, ``has(event.a.b)``,
``event.list.exists(x, <expr over x>)``, its dual
``event.list.all(x, <expr over x>)``, ``exists_one(x, <expr>)``
(exactly one element matches), the list-valued macros
``filter(x, <pred>)`` and ``map(x, <arith over x>)`` (usable under
``.size()`` or as the RHS of ``in`` — a list has no boolean reading, so
anywhere else is a config-time error, like cel-go's type checker), the
ternary ``cond ? a : b`` (boolean branches; a cond that errors or is
null selects the else branch on every backend), ``in [..]`` list
literals, ``in {..}`` map literals (key membership, like cel-go),
``<literal> in event.some.list`` field membership,
``.startsWith/.endsWith/.contains/.matches(str)`` (also legal on the
bound variable inside exists/all/exists_one/filter bodies),
``.size()``, int/float/string/bool/null literals, and the cel-go time
surface the reference's msgraph window rules use
(msgraph.go:105-132): ``timestamp("<RFC3339>")`` and
``duration("1h30m")`` literals in comparisons against event fields,
with ``ts ± dur`` / ``ts - ts`` arithmetic (all compiled to epoch
seconds; a malformed field value is NULL → non-match on every
backend; mixed ts/dur comparisons and ``ts + ts`` are config-time
errors, like cel-go's type checker), and the ``int()/double()/
string()`` conversions (portable truncate-toward-zero semantics, see
``Conv``). Anything else raises
``CelSyntaxError`` at build time (mirrors validateRule,
engine.go:88-106).

Three backends off one AST:
- ``to_column``     — Spark Column over a JSON-string column (schema-free
                      lines, ``get_json_object``) or over real columns;
- ``to_sql``        — equivalent DuckDB SQL (used by the correctness gate);
- ``eval_python``   — pure-Python oracle evaluation (pytest truth tables).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class CelSyntaxError(ValueError):
    """Invalid rule — rejected at plan-build time."""


class CelEvalError(ValueError):
    """Runtime evaluation error — counts as non-match (engine.go:20-29)."""


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<num>\d+\.\d+|\d+)
  | (?P<str>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<op>==|!=|<=|>=|&&|\|\||[<>!().,:?{}\[\]+\-*/%])
  | (?P<ident>[A-Za-z_][A-Za-z_0-9]*)
""",
    re.VERBOSE,
)


def _tokenize(src: str) -> list[tuple[str, str]]:
    tokens: list[tuple[str, str]] = []
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if m is None:
            raise CelSyntaxError(f"unexpected character at {pos}: {src[pos:pos+10]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        tokens.append((kind, m.group()))
    tokens.append(("eof", ""))
    return tokens


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass
class Lit:
    value: object  # int | float | str | bool | None


@dataclass
class Path:
    parts: tuple[str, ...]  # ('event', 'data', 'errors') or ('x',) for vars


@dataclass
class TsLit:
    """``timestamp("2024-01-05T10:00:00Z")`` — RFC3339 literal, parsed to
    a UTC epoch-seconds float at CONFIG time (a bad string is a
    CelSyntaxError, mirroring cel-go's type-checked timestamp()
    conversion the reference embeds, engine.go:39-41; msgraph-style
    createdDateTime window rules are the use case, msgraph.go:105-132).
    All backends compare time as epoch seconds, so the literal compiles
    to a plain double everywhere."""

    epoch: float
    text: str


@dataclass
class DurLit:
    """``duration("1h30m")`` — cel-go duration literal (h/m/s/ms/us/ns
    units, decimals and leading '-' allowed), parsed to seconds at
    config time."""

    seconds: float
    text: str


@dataclass
class Conv:
    """``int(x)`` / ``double(x)`` / ``string(x)`` — cel-go type
    conversions. Portable semantics (identical on all three backends,
    slightly lenient vs cel-go, documented):

    - ``int(x)``: x as double, truncated toward zero (cel-go errors on
      ``int("5.2")``; here it is 5 on every backend — DuckDB's CAST
      rounds, so the SQL side routes through TRUNC). Unparseable →
      NULL → non-match.
    - ``double(x)``: numeric parse; unparseable → non-match.
    - ``string(x)``: INTEGER-valued operands only (the routing-rule
      usage): x → double → trunc → bigint → string. Float formatting
      ("1.0E10" vs "10000000000.0") diverges across dialects, so
      general float→string is deliberately not offered.
    """

    fn: str  # int | double | string
    operand: object  # Path | Lit | Arith | Conv


@dataclass
class Cmp:
    op: str
    left: object
    right: object


@dataclass
class And:
    left: object
    right: object


@dataclass
class Or:
    left: object
    right: object


@dataclass
class Not:
    operand: object


@dataclass
class Arith:
    op: str  # + - * / %
    left: object
    right: object


@dataclass
class Has:
    path: Path


@dataclass
class Exists:
    path: Path
    var: str
    body: object


@dataclass
class ForAll:
    """``list.all(x, body)`` — exists()'s dual (cel-go macro)."""

    path: Path
    var: str
    body: object


@dataclass
class ExistsOne:
    """``list.exists_one(x, body)`` — exactly one element matches
    (cel-go macro). Compiled as size(filter) == 1 on every backend."""

    path: Path
    var: str
    body: object


@dataclass
class ListFilter:
    """``list.filter(x, body)`` — list-valued cel-go macro. Only usable
    inside ``.size()`` or as the RHS of ``in`` (a list has no boolean
    reading; anything else is rejected at config time)."""

    path: Path
    var: str
    body: object


@dataclass
class ListMap:
    """``list.map(x, expr)`` — list-valued cel-go macro; ``expr`` is
    arithmetic over the bound variable (numeric elements). Same usage
    restriction as ListFilter."""

    path: Path
    var: str
    expr: object


@dataclass
class Ternary:
    """``cond ? then : else`` with boolean branches. A cond that errors
    or is null selects the else branch — the same COALESCE(..., FALSE)
    convention the other boolean contexts here use, applied identically
    on all three backends."""

    cond: object
    then: object
    els: object


@dataclass
class StrFn:
    fn: str  # startsWith | endsWith | contains | matches | size
    path: object  # Path | ListFilter | ListMap (list exprs: size() only)
    arg: object | None


@dataclass
class InList:
    operand: object
    items: list


@dataclass
class InField:
    """``<literal> in event.some.list`` — membership over a LIST FIELD
    (cel-go's `in` over a dynamic list), vs InList's literal collection.
    ``path`` may also be a ListFilter/ListMap expression
    (``3 in event.ns.map(x, x * 3)``)."""

    needle: Lit
    path: object  # Path | ListFilter | ListMap


_DURATION_RE = re.compile(r"(\d+(?:\.\d+)?)(h|ms|us|ns|m|s)")

#: unit → seconds (cel-go duration units; no days, like Go time.Duration)
_DURATION_UNITS = {"h": 3600.0, "m": 60.0, "s": 1.0, "ms": 1e-3, "us": 1e-6, "ns": 1e-9}


def _parse_duration(text: str) -> float:
    """cel-go duration string → seconds. '1h30m', '90s', '1.5h',
    '-45m', '500ms'. Config-time CelSyntaxError on anything else."""
    s = text.strip()
    sign = 1.0
    if s.startswith("-"):
        sign, s = -1.0, s[1:]
    pos, total = 0, 0.0
    while pos < len(s):
        m = _DURATION_RE.match(s, pos)
        if m is None:
            raise CelSyntaxError(f"bad duration literal {text!r}")
        total += float(m.group(1)) * _DURATION_UNITS[m.group(2)]
        pos = m.end()
    if pos == 0:
        raise CelSyntaxError(f"bad duration literal {text!r}")
    return sign * total


def _parse_rfc3339(text: str) -> float:
    """RFC3339 timestamp string → UTC epoch seconds. Offset-less strings
    are UTC (all three execution backends run with a UTC session zone
    here; rules SHOULD carry explicit offsets as msgraph does).
    Config-time CelSyntaxError on parse failure."""
    from datetime import datetime, timezone

    try:
        dt = datetime.fromisoformat(text.replace("Z", "+00:00"))
    except ValueError as exc:
        raise CelSyntaxError(f"bad timestamp literal {text!r}: {exc}") from None
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt.timestamp()


def _contains_time(node) -> bool:
    """True if the operand expression involves a timestamp()/duration()
    literal anywhere (the trigger for time-typed comparison)."""
    if isinstance(node, (TsLit, DurLit)):
        return True
    if isinstance(node, Arith):
        return _contains_time(node.left) or _contains_time(node.right)
    return False


def _time_tag(node) -> str:
    """Static time type of a Cmp side: 'ts' or 'dur'. Paths are
    timestamp-typed fields (a bare field can never be duration-typed —
    durations only arise from duration() literals or ts - ts).
    Everything compiles to epoch/interval SECONDS, so this check exists
    purely to reject nonsense (ts + ts, ts * 2, string vs ts) at config
    time, like cel-go's type checker."""
    if isinstance(node, TsLit):
        return "ts"
    if isinstance(node, DurLit):
        return "dur"
    if isinstance(node, Path):
        return "ts"
    if isinstance(node, Arith):
        if node.op not in ("+", "-"):
            raise CelSyntaxError(f"{node.op!r} not defined for time values")
        lt, rt = _time_tag(node.left), _time_tag(node.right)
        if node.op == "+":
            if (lt, rt) in (("ts", "dur"), ("dur", "ts")):
                return "ts"
            if (lt, rt) == ("dur", "dur"):
                return "dur"
            raise CelSyntaxError("cannot add two timestamps")
        # '-'
        if (lt, rt) == ("ts", "ts"):
            return "dur"
        if (lt, rt) == ("ts", "dur"):
            return "ts"
        if (lt, rt) == ("dur", "dur"):
            return "dur"
        raise CelSyntaxError("cannot subtract a timestamp from a duration")
    raise CelSyntaxError(f"operand {node!r} cannot appear in a time comparison")


def _check_time_cmp(node: Cmp) -> None:
    """Both sides of a time comparison must carry the same time type."""
    if _time_tag(node.left) != _time_tag(node.right):
        raise CelSyntaxError(
            "time comparison mixes timestamp and duration operands"
        )


def _validate_time_usage(node) -> None:
    """timestamp()/duration() literals are only legal inside a
    comparison between time-typed operands — walked at parse_rule time
    so misuse (in lists, string functions, boolean position) is a
    config-time error on every backend."""
    if isinstance(node, (TsLit, DurLit)):
        raise CelSyntaxError(
            "timestamp()/duration() only usable inside a comparison"
        )
    if isinstance(node, Cmp):
        if _contains_time(node.left) or _contains_time(node.right):
            _check_time_cmp(node)
            return  # sides validated as a unit; don't descend
        _validate_time_usage(node.left)
        _validate_time_usage(node.right)
        return
    if isinstance(node, (And, Or)):
        _validate_time_usage(node.left)
        _validate_time_usage(node.right)
    elif isinstance(node, Not):
        _validate_time_usage(node.operand)
    elif isinstance(node, Ternary):
        _validate_time_usage(node.cond)
        _validate_time_usage(node.then)
        _validate_time_usage(node.els)
    elif isinstance(node, Arith):
        _validate_time_usage(node.left)
        _validate_time_usage(node.right)
    elif isinstance(node, Conv):
        _validate_time_usage(node.operand)
    elif isinstance(node, (Exists, ForAll, ExistsOne)):
        _validate_time_usage(node.body)
    elif isinstance(node, (ListFilter,)):
        _validate_time_usage(node.body)
    elif isinstance(node, (ListMap,)):
        _validate_time_usage(node.expr)
    elif isinstance(node, InList):
        _validate_time_usage(node.operand)


class _Parser:
    def __init__(self, src: str):
        self.tokens = _tokenize(src)
        self.i = 0

    def peek(self):
        return self.tokens[self.i]

    def next(self):
        t = self.tokens[self.i]
        self.i += 1
        return t

    def expect(self, value: str):
        kind, v = self.next()
        if v != value:
            raise CelSyntaxError(f"expected {value!r}, got {v!r}")

    def parse(self):
        node = self.parse_ternary()
        if self.peek()[0] != "eof":
            raise CelSyntaxError(f"trailing input at token {self.peek()[1]!r}")
        return node

    def parse_ternary(self):
        node = self.parse_or()
        if self.peek()[1] == "?":
            self.next()
            then = self.parse_ternary()  # right-associative, like cel-go
            self.expect(":")
            els = self.parse_ternary()
            return Ternary(node, then, els)
        return node

    def parse_or(self):
        node = self.parse_and()
        while self.peek()[1] == "||":
            self.next()
            node = Or(node, self.parse_and())
        return node

    def parse_and(self):
        node = self.parse_cmp()
        while self.peek()[1] == "&&":
            self.next()
            node = And(node, self.parse_cmp())
        return node

    def parse_cmp(self):
        node = self.parse_add()
        kind, v = self.peek()
        if v in ("==", "!=", "<", "<=", ">", ">="):
            self.next()
            return Cmp(v, node, self.parse_add())
        if kind == "ident" and v == "in":
            self.next()
            if self.peek()[1] == "{":
                # map literal → key membership, like cel-go ('k' in {'k': 1})
                return InList(node, self.parse_map_literal_keys())
            if self.peek()[1] == "[":
                return InList(node, self.parse_list_literal())
            # '<lit> in event.some.list' — membership over a list field
            # (or over a filter()/map() list expression)
            rhs = self.parse_unary()
            if not isinstance(rhs, (Path, ListFilter, ListMap)):
                raise CelSyntaxError(
                    "'in' needs a [..] / {..} literal, a list field path, "
                    "or a filter()/map() expression"
                )
            if not isinstance(node, Lit) or isinstance(node.value, (bool, type(None))):
                raise CelSyntaxError(
                    "'in <field>' needs a string/number literal needle"
                )
            needle_num = isinstance(node.value, (int, float))
            if isinstance(rhs, ListMap) and not needle_num:
                raise CelSyntaxError(
                    "'in <map()>' needs a numeric needle (map() elements are numeric)"
                )
            if isinstance(rhs, ListFilter):
                if _body_fields(rhs.body, rhs.var):
                    raise CelSyntaxError(
                        "'in' over a filter() with field access is not "
                        "supported (struct elements have no needle type)"
                    )
                elem_num = _elem_type(rhs.body) == "double"
                if needle_num != elem_num:
                    raise CelSyntaxError(
                        "'in <filter()>' needle type must match the element "
                        "type the filter body implies"
                    )
            return InField(node, rhs)
        return node

    def parse_add(self):
        node = self.parse_mul()
        while self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            node = Arith(op, node, self.parse_mul())
        return node

    def parse_mul(self):
        node = self.parse_unary()
        while self.peek()[1] in ("*", "/", "%"):
            op = self.next()[1]
            node = Arith(op, node, self.parse_unary())
        return node

    def parse_list_literal(self) -> list:
        self.expect("[")
        items = []
        while self.peek()[1] != "]":
            node = self.parse_unary()
            if not isinstance(node, Lit):
                raise CelSyntaxError("only literal lists supported after 'in'")
            items.append(node.value)
            if self.peek()[1] == ",":
                self.next()
        self.expect("]")
        return items

    def parse_map_literal_keys(self) -> list:
        """``{k1: v1, k2: v2}`` → [k1, k2]. Only the keys matter for the
        'in' membership test (cel-go semantics); values must still be
        literals so a bad rule is rejected at config time."""
        self.expect("{")
        keys = []
        while self.peek()[1] != "}":
            key = self.parse_unary()
            if not isinstance(key, Lit) or isinstance(key.value, (bool, type(None))):
                raise CelSyntaxError("map literal keys must be string/number literals")
            self.expect(":")
            val = self.parse_unary()
            if not isinstance(val, Lit):
                raise CelSyntaxError("map literal values must be literals")
            keys.append(key.value)
            if self.peek()[1] == ",":
                self.next()
        self.expect("}")
        return keys

    def parse_unary(self):
        kind, v = self.peek()
        if v == "!":
            self.next()
            return Not(self.parse_unary())
        if v == "-":
            self.next()
            operand = self.parse_unary()
            if isinstance(operand, Lit) and isinstance(operand.value, (int, float)):
                return Lit(-operand.value)
            return Arith("-", Lit(0), operand)
        if v == "(":
            self.next()
            node = self.parse_or()
            self.expect(")")
            return node
        if kind == "num":
            self.next()
            return Lit(float(v) if "." in v else int(v))
        if kind == "str":
            self.next()
            body = v[1:-1]
            # unescape \" \' \\ \n \t
            body = (
                body.replace("\\\\", "\x00")
                .replace('\\"', '"')
                .replace("\\'", "'")
                .replace("\\n", "\n")
                .replace("\\t", "\t")
                .replace("\x00", "\\")
            )
            return Lit(body)
        if kind == "ident":
            if v == "true":
                self.next()
                return Lit(True)
            if v == "false":
                self.next()
                return Lit(False)
            if v == "null":
                self.next()
                return Lit(None)
            if v == "has":
                self.next()
                self.expect("(")
                inner = self.parse_path()
                self.expect(")")
                return Has(inner)
            return self.parse_path_or_call()
        raise CelSyntaxError(f"unexpected token {v!r}")

    def parse_path(self) -> Path:
        kind, v = self.next()
        if kind != "ident":
            raise CelSyntaxError(f"expected identifier, got {v!r}")
        parts = [v]
        while self.peek()[1] == ".":
            self.next()
            kind, v = self.next()
            if kind != "ident":
                raise CelSyntaxError(f"expected identifier after '.', got {v!r}")
            parts.append(v)
        return Path(tuple(parts))

    def parse_path_or_call(self):
        path = self.parse_path()
        # method call on the path: last part may be exists/startsWith/...
        if self.peek()[1] == "(":
            method = path.parts[-1]
            base = Path(path.parts[:-1])
            if not base.parts:
                if method in ("timestamp", "duration"):
                    self.next()  # (
                    arg = self.parse_unary()
                    if not isinstance(arg, Lit) or not isinstance(arg.value, str):
                        raise CelSyntaxError(f"{method}() requires a string literal")
                    self.expect(")")
                    if method == "timestamp":
                        return TsLit(_parse_rfc3339(arg.value), arg.value)
                    return DurLit(_parse_duration(arg.value), arg.value)
                if method in ("int", "double", "string"):
                    self.next()  # (
                    arg = self.parse_add()
                    self.expect(")")
                    if not isinstance(arg, (Path, Lit, Arith, Conv)):
                        raise CelSyntaxError(
                            f"{method}() requires a field, literal, or "
                            "arithmetic operand"
                        )
                    return Conv(method, arg)
                raise CelSyntaxError(f"unknown function {method!r}")
            self.next()  # (
            if method in ("exists", "all", "exists_one", "filter", "map"):
                kind, var = self.next()
                if kind != "ident":
                    raise CelSyntaxError(f"{method}() requires a variable name")
                self.expect(",")
                body = self.parse_or()
                self.expect(")")
                if method == "map":
                    _validate_map_expr(body, var)
                    node = ListMap(base, var, body)
                else:
                    _validate_exists_body(body, var)
                    _body_fields(body, var)  # mixing/depth config errors
                    if method == "all":
                        return ForAll(base, var, body)
                    if method == "exists_one":
                        return ExistsOne(base, var, body)
                    if method == "exists":
                        return Exists(base, var, body)
                    node = ListFilter(base, var, body)
                # list-valued macros are only usable inside .size() or as
                # the RHS of 'in' — a list has no boolean reading
                if self.peek()[1] == ".":
                    self.next()
                    kind2, m2 = self.next()
                    if m2 != "size":
                        raise CelSyntaxError(
                            f"only .size() may chain onto {method}(); got {m2!r}"
                        )
                    self.expect("(")
                    self.expect(")")
                    return StrFn("size", node, None)
                return node
            if method in ("startsWith", "endsWith", "contains", "matches"):
                arg = self.parse_unary()
                if not isinstance(arg, Lit) or not isinstance(arg.value, str):
                    raise CelSyntaxError(f"{method}() requires a string literal")
                if method == "matches":
                    _validate_portable_regex(arg.value)
                self.expect(")")
                return StrFn(method, base, arg)
            if method == "size":
                self.expect(")")
                return StrFn("size", base, None)
            raise CelSyntaxError(f"unsupported method {method!r}")
        return path


#: regex constructs that diverge across the three execution dialects
#: (Java regex via Spark rlike, RE2 via DuckDB regexp_matches, Python re):
#: lookaround / named groups / inline flags "(?...", unicode property
#: classes \p{..}, backreferences, and absolute anchors \A \z \Z \G.
_NONPORTABLE_RE = re.compile(r"\(\?(?!:)|\\[pP]|\\[0-9]|\\[AzZG]")


def _validate_portable_regex(pattern: str) -> None:
    r"""matches() patterns are restricted to the dialect-portable subset
    (literals, [..] classes, . * + ? {m,n} | (..) (?:..) ^ $ and the
    \d \w \s \b escapes) so a rule accepted at config time cannot
    crash or silently diverge on one backend. The \d \w \s \b classes
    are ASCII-only on every backend: Java rlike and RE2 define them so,
    and eval_python compiles with re.ASCII to match. Residual caveat:
    for data with a TRAILING NEWLINE, '$' matches before it in
    Java/Python but not in RE2 — parsed log fields are trimmed upstream,
    so this only matters for raw multiline payloads."""
    m = _NONPORTABLE_RE.search(pattern)
    if m:
        raise CelSyntaxError(
            f"matches(): {m.group(0)!r} is not portable across the "
            "Spark/DuckDB/Python regex dialects; use the portable subset"
        )
    try:
        re.compile(pattern)
    except re.error as e:
        raise CelSyntaxError(f"matches(): bad regex: {e}") from None


def _validate_exists_body(node, var: str) -> None:
    """exists()/all()/exists_one()/filter() bodies are limited to what
    ALL THREE backends compile — comparisons of the bound var against
    literals and string predicates on the bound var
    (startsWith/endsWith/contains/matches), combined with && / || —
    rejected at config time instead of failing late on one backend and
    silently non-matching on another."""
    if isinstance(node, (And, Or)):
        _validate_exists_body(node.left, var)
        _validate_exists_body(node.right, var)
        return
    if isinstance(node, Cmp):
        for side in (node.left, node.right):
            if isinstance(side, Lit):
                continue
            if (
                isinstance(side, Path)
                and side.parts[0] == var
                and len(side.parts) <= 2
            ):
                continue  # bare var, or one-level field access (x.f)
            raise CelSyntaxError(
                "exists() body must compare the bound variable (or one of "
                "its fields) to a literal"
            )
        return
    if (
        isinstance(node, StrFn)
        and node.fn in ("startsWith", "endsWith", "contains", "matches")
        and isinstance(node.path, Path)
        and node.path.parts[0] == var
        and len(node.path.parts) <= 2
    ):
        return  # regex portability already validated at parse time
    if (
        isinstance(node, Has)
        and node.path.parts[0] == var
        and len(node.path.parts) == 2
    ):
        return  # has(x.field): present AND non-null on every backend
    raise CelSyntaxError(f"unsupported exists() body: {node!r}")


def _validate_map_expr(node, var: str) -> None:
    """map() transform expressions are limited to arithmetic over the
    bound variable and numeric literals — the subset whose element-wise
    semantics are identical across Spark transform(), DuckDB
    list_transform(), and Python (config-time rejection otherwise)."""
    if isinstance(node, Path) and node.parts == (var,):
        return
    if (
        isinstance(node, Lit)
        and isinstance(node.value, (int, float))
        and not isinstance(node.value, bool)
    ):
        return
    if isinstance(node, Arith):
        _validate_map_expr(node.left, var)
        _validate_map_expr(node.right, var)
        return
    raise CelSyntaxError(
        "map() expression must be arithmetic over the bound variable "
        "and numeric literals"
    )


def _elem_type(body, sql: bool = False) -> str:
    """List element type implied by the literals a lambda body compares
    against (numeric literal anywhere → numeric elements)."""
    for lit in _body_literals(body):
        if isinstance(lit, (int, float)) and not isinstance(lit, bool):
            return "DOUBLE" if sql else "double"
    return "VARCHAR" if sql else "string"


def _body_fields(body, var: str) -> dict[str, str] | None:
    """Fields the lambda body reads off the bound variable (cel-go
    ``event.groups.exists(g, g.name == "x")`` — arrays of OBJECTS).
    Returns ``{field: "double"|"string"}`` in struct mode, ``None`` when
    the body uses the bare variable (scalar elements). Mixing bare and
    field access, or nesting deeper than one level, is a config-time
    error — cel-go types it dynamically; all three backends here need
    one element shape."""
    fields: dict[str, str] = {}
    bare: list[Path] = []

    def note(path: Path, typ: str) -> None:
        if len(path.parts) == 1:
            bare.append(path)
        elif len(path.parts) == 2:
            f = path.parts[1]
            prev = fields.get(f)
            fields[f] = "double" if "double" in (prev, typ) else typ
        else:
            raise CelSyntaxError(
                "only one-level field access on the bound variable"
            )

    def walk(n) -> None:
        if isinstance(n, Cmp):
            lits = [s.value for s in (n.left, n.right) if isinstance(s, Lit)]
            num = any(
                isinstance(v, (int, float)) and not isinstance(v, bool)
                for v in lits
            )
            for s in (n.left, n.right):
                if isinstance(s, Path) and s.parts[0] == var:
                    note(s, "double" if num else "string")
        elif isinstance(n, (And, Or)):
            walk(n.left)
            walk(n.right)
        elif (
            isinstance(n, StrFn)
            and isinstance(n.path, Path)
            and n.path.parts[0] == var
        ):
            note(n.path, "string")
        elif (
            isinstance(n, Has)
            and n.path.parts[0] == var
        ):
            # presence-only usage parses as string (any scalar value);
            # a numeric comparison elsewhere upgrades the field to
            # double, making has() mean "has a NUMERIC value" there
            note(n.path, "string")

    walk(body)
    if fields and bare:
        raise CelSyntaxError(
            "exists() body mixes bare-variable and field access"
        )
    return fields or None


def _reject_bare_list_exprs(node) -> None:
    """filter()/map() are list-valued — legal only inside .size() or as
    the RHS of 'in' (where they sit in non-boolean AST fields this walk
    does not visit). Anywhere a boolean is needed they are a config-time
    error, matching cel-go's type checker."""
    if isinstance(node, (ListFilter, ListMap)):
        raise CelSyntaxError(
            "filter()/map() is list-valued; wrap it in .size() or use it "
            "as the right side of 'in'"
        )
    if isinstance(node, (And, Or)):
        _reject_bare_list_exprs(node.left)
        _reject_bare_list_exprs(node.right)
    elif isinstance(node, Not):
        _reject_bare_list_exprs(node.operand)
    elif isinstance(node, Ternary):
        _reject_bare_list_exprs(node.cond)
        _reject_bare_list_exprs(node.then)
        _reject_bare_list_exprs(node.els)


def parse_rule(rule: str):
    """Parse a CEL-subset rule → AST. Raises CelSyntaxError (config-time
    rejection, mirroring validateRule engine.go:88-106)."""
    ast = _Parser(rule).parse()
    _reject_bare_list_exprs(ast)
    _validate_time_usage(ast)
    return ast


# ---------------------------------------------------------------------------
# Backend 1: Spark Column
# ---------------------------------------------------------------------------


def _json_path(parts: tuple[str, ...]) -> str:
    return "$." + ".".join(parts)


class ColumnCompiler:
    """Compile an AST to a Spark Column.

    mode='json':    paths under ``event.`` read from a JSON string column
                    via get_json_object (schema-free lines, reference model).
    mode='columns': paths under ``event.`` are real DataFrame columns
                    (structured payloads — fully JVM-native, no JSON parse).
    """

    def __init__(self, mode: str = "json", value_col: str = "value", root: str = "event"):
        if mode not in ("json", "columns"):
            raise ValueError(mode)
        self.mode = mode
        self.value_col = value_col
        self.root = root

    # -- helpers ------------------------------------------------------------

    def _raw_path(self, path: Path) -> Column:
        if path.parts[0] != self.root:
            raise CelSyntaxError(f"unknown identifier {path.parts[0]!r}")
        rel = path.parts[1:]
        if not rel:
            raise CelSyntaxError("bare 'event' is not addressable")
        if self.mode == "json":
            return F.get_json_object(F.col(self.value_col), _json_path(rel))
        col = F.col(rel[0])
        for p in rel[1:]:
            col = col.getField(p)
        return col

    def _typed_path(self, path: Path, like) -> Column:
        """Path column cast per the literal it is compared against."""
        col = self._raw_path(path)
        if self.mode == "columns":
            return col
        if isinstance(like, bool):
            return col == F.lit("true")
        if isinstance(like, (int, float)):
            return col.cast("double")
        return col

    def _operand(self, node, like=None) -> Column:
        if isinstance(node, Lit):
            if isinstance(node.value, bool) and self.mode == "json":
                return F.lit(node.value)
            return F.lit(node.value)
        if isinstance(node, Path):
            return self._typed_path(node, like)
        if isinstance(node, StrFn) and node.fn == "size":
            return self._strfn(node)
        if isinstance(node, Arith):
            return self._arith(node)
        if isinstance(node, Conv):
            return self._conv(node)
        raise CelSyntaxError(f"unsupported operand {node!r}")

    def _conv(self, node: Conv) -> Column:
        inner = node.operand
        if isinstance(inner, Conv):
            col = self._conv(inner)
        elif isinstance(inner, Lit):
            col = F.lit(inner.value)
        elif isinstance(inner, Path):
            col = self._raw_path(inner)
        elif isinstance(inner, Arith):
            col = self._arith(inner)
        else:
            raise CelSyntaxError(f"unsupported {node.fn}() operand {inner!r}")
        as_num = col.try_cast("double")
        if node.fn == "double":
            return as_num
        # double→bigint try_cast truncates toward zero (DuckDB twin uses
        # TRUNC because its CAST rounds); unparseable → NULL → non-match
        as_int = as_num.try_cast("bigint")
        return as_int if node.fn == "int" else as_int.cast("string")

    def _arith(self, node: Arith) -> Column:
        """Arithmetic subexpression: paths are numeric by context."""
        def num(n) -> Column:
            if isinstance(n, Arith):
                return self._arith(n)
            if isinstance(n, Lit):
                if not isinstance(n.value, (int, float)) or isinstance(n.value, bool):
                    raise CelSyntaxError(f"non-numeric literal in arithmetic: {n.value!r}")
                return F.lit(n.value)
            if isinstance(n, Path):
                return self._typed_path(n, 1.0)  # numeric cast
            if isinstance(n, StrFn) and n.fn == "size":
                return self._strfn(n)
            if isinstance(n, Conv) and n.fn in ("int", "double"):
                return self._conv(n)
            raise CelSyntaxError(f"unsupported arithmetic operand {n!r}")

        left, right = num(node.left), num(node.right)
        if node.op == "+":
            return left + right
        if node.op == "-":
            return left - right
        if node.op == "*":
            return left * right
        if node.op == "/":
            # try_divide: /0 yields NULL (→ non-match) like DuckDB and the
            # Python error-as-non-match path, instead of an ANSI-mode
            # SparkArithmeticException killing the whole job
            return F.try_divide(left, right)
        if node.op == "%":
            return F.try_mod(left, right)
        raise CelSyntaxError(f"unknown arithmetic op {node.op!r}")

    def _lit_of(self, node):
        return node.value if isinstance(node, Lit) else None

    def _time_side(self, node) -> Column:
        """One side of a time comparison as epoch/interval SECONDS.
        Paths parse as timestamps (try_to_timestamp → NULL on a
        malformed field → comparison NULL → non-match, the standard
        error convention); literals were resolved at config time."""
        if isinstance(node, TsLit):
            return F.lit(node.epoch)
        if isinstance(node, DurLit):
            return F.lit(node.seconds)
        if isinstance(node, Path):
            # cast("string") first: a real timestamp column (columns
            # mode) round-trips; a JSON string field passes through
            return F.try_to_timestamp(
                self._raw_path(node).cast("string")
            ).cast("double")
        if isinstance(node, Arith):
            left = self._time_side(node.left)
            right = self._time_side(node.right)
            return left + right if node.op == "+" else left - right
        raise CelSyntaxError(f"operand {node!r} cannot appear in a time comparison")

    # -- node dispatch --------------------------------------------------------

    def compile(self, node) -> Column:
        if isinstance(node, Lit):
            if isinstance(node.value, bool):
                return F.lit(node.value)
            raise CelSyntaxError("non-boolean rule result")
        if isinstance(node, Or):
            return self.compile(node.left) | self.compile(node.right)
        if isinstance(node, And):
            return self.compile(node.left) & self.compile(node.right)
        if isinstance(node, Not):
            return ~self.compile(node.operand)
        if isinstance(node, Cmp):
            if _contains_time(node.left) or _contains_time(node.right):
                # time comparison: both sides as epoch/interval seconds
                left = self._time_side(node.left)
                right = self._time_side(node.right)
                op = node.op
            else:
                like = self._lit_of(node.right) or self._lit_of(node.left)
                if like is None and (
                    isinstance(node.left, Arith) or isinstance(node.right, Arith)
                ):
                    like = 1.0  # arithmetic side → compare numerically
                if like is None:
                    # a numeric conversion side types the other side
                    for side in (node.left, node.right):
                        if isinstance(side, Conv) and side.fn in ("int", "double"):
                            like = 1.0
                left = self._operand(node.left, like)
                right = self._operand(node.right, like)
                if isinstance(node.left, Lit) and isinstance(node.right, Path):
                    right = self._typed_path(node.right, self._lit_of(node.left))
                op = node.op
                if isinstance(node.right, Lit) and isinstance(node.right.value, bool) and self.mode == "json":
                    # json mode: bool path compiled to (col == 'true'), compare to lit
                    left = self._typed_path(node.left, True) if isinstance(node.left, Path) else left
            if op == "==":
                return left == right
            if op == "!=":
                return left != right
            if op == "<":
                return left < right
            if op == "<=":
                return left <= right
            if op == ">":
                return left > right
            if op == ">=":
                return left >= right
        if isinstance(node, Has):
            return self._raw_path(node.path).isNotNull()
        if isinstance(node, InList):
            like = node.items[0] if node.items else None
            return self._operand(node.operand, like).isin(node.items)
        if isinstance(node, InField):
            elem = (
                "double"
                if isinstance(node.needle.value, (int, float))
                and not isinstance(node.needle.value, bool)
                else "string"
            )
            if isinstance(node.path, (ListFilter, ListMap)):
                arr = self._list_expr(node.path)
            elif self.mode == "json":
                arr = F.from_json(self._raw_path(node.path), f"array<{elem}>")
            else:
                arr = self._raw_path(node.path)
            needle = (
                float(node.needle.value) if elem == "double" else node.needle.value
            )
            # missing/null list → FALSE (error-as-non-match convention)
            return F.coalesce(
                F.array_contains(arr, F.lit(needle)), F.lit(False)
            )
        if isinstance(node, StrFn):
            if node.fn == "size":
                raise CelSyntaxError("size() must appear inside a comparison")
            return self._strfn(node)
        if isinstance(node, Exists):
            return self._exists(node)
        if isinstance(node, ForAll):
            return self._forall(node)
        if isinstance(node, ExistsOne):
            flt = ListFilter(node.path, node.var, node.body)
            return F.coalesce(
                F.size(self._list_expr(flt)) == F.lit(1), F.lit(False)
            )
        if isinstance(node, Ternary):
            cond = F.coalesce(self.compile(node.cond), F.lit(False))
            return F.when(cond, self.compile(node.then)).otherwise(
                self.compile(node.els)
            )
        if isinstance(node, Path):
            # bare boolean path
            return self._typed_path(node, True)
        raise CelSyntaxError(f"cannot compile node {node!r}")

    def _strfn(self, node: StrFn) -> Column:
        if isinstance(node.path, (ListFilter, ListMap)):
            if node.fn != "size":
                raise CelSyntaxError(f"{node.fn}() not supported on list expressions")
            return F.size(self._list_expr(node.path))
        col = self._raw_path(node.path)
        if node.fn == "startsWith":
            return col.startswith(node.arg.value)
        if node.fn == "endsWith":
            return col.endswith(node.arg.value)
        if node.fn == "contains":
            return col.contains(node.arg.value)
        if node.fn == "matches":
            # CEL matches() is an unanchored RE2 search; rlike is the
            # unanchored Java-regex equivalent (dialects agree on the
            # portable subset — no lookbehind/named-class exotica)
            return col.rlike(node.arg.value)
        if node.fn == "size":
            if self.mode == "json":
                # CEL size() is overloaded: element count for lists,
                # char count for strings. A JSON-mode path is a raw
                # string either way, so dispatch on the array shape —
                # matching the Python oracle's len() (which counts list
                # elements; plain length(raw) silently counted the
                # characters of '["a","b"]'). Corner: a STRING field
                # whose value itself starts with '[' but is invalid
                # JSON sizes as NULL → non-match (Python counts chars).
                return F.when(
                    col.rlike(r"^\s*\["), F.json_array_length(col)
                ).otherwise(F.length(col))
            return F.length(col)
        raise CelSyntaxError(node.fn)

    def _list_arr(self, path: Path, elem_type: str) -> Column:
        """The list field as a typed array column (json mode parses)."""
        if self.mode == "json":
            return F.from_json(self._raw_path(path), f"array<{elem_type}>")
        return self._raw_path(path)

    def _macro_arr(self, path: Path, body, var: str) -> Column:
        """The macro's list as a typed array: scalar elements typed from
        body literals, or array<struct<...>> when the body reads fields
        of the bound var (from_json ignores extra JSON object keys)."""
        fields = _body_fields(body, var)
        if fields:
            schema = (
                "struct<"
                + ",".join(f"{f}:{t}" for f, t in sorted(fields.items()))
                + ">"
            )
            return self._list_arr(path, schema)
        return self._list_arr(path, _elem_type(body))

    def _list_expr(self, node) -> Column:
        """Compile a list-valued macro (filter()/map()) to an array Column."""
        if isinstance(node, ListFilter):
            arr = self._macro_arr(node.path, node.body, node.var)
            return F.filter(
                arr, lambda x: _compile_lambda_body(node.body, node.var, x, self)
            )
        if isinstance(node, ListMap):
            arr = self._list_arr(node.path, "double")
            return F.transform(
                arr, lambda x: _map_expr_column(node.expr, node.var, x)
            )
        raise CelSyntaxError(f"not a list expression: {node!r}")

    def _exists(self, node: Exists) -> Column:
        # element type inferred from literals in the body
        arr = self._macro_arr(node.path, node.body, node.var)
        var = node.var

        def body_fn(x: Column) -> Column:
            return _compile_lambda_body(node.body, var, x, self)

        return F.coalesce(F.exists(arr, body_fn), F.lit(False))

    def _forall(self, node: ForAll) -> Column:
        arr = self._macro_arr(node.path, node.body, node.var)
        var = node.var

        def body_fn(x: Column) -> Column:
            return _compile_lambda_body(node.body, var, x, self)

        # missing/null list → FALSE (the error-as-non-match convention);
        # empty list → TRUE (cel-go all() over [] is vacuously true)
        return F.coalesce(F.forall(arr, body_fn), F.lit(False))


def _body_literals(node):
    if isinstance(node, Lit):
        yield node.value
    for attr in ("left", "right", "operand", "body"):
        child = getattr(node, attr, None)
        if child is not None and not isinstance(child, (str, tuple)):
            yield from _body_literals(child)


def _compile_lambda_body(node, var: str, x: Column, outer: ColumnCompiler) -> Column:
    """Compile an exists() body where ``var`` is bound to element x."""
    if isinstance(node, Cmp):
        def side(n):
            if isinstance(n, Path) and n.parts == (var,):
                return x
            if (
                isinstance(n, Path)
                and n.parts[0] == var
                and len(n.parts) == 2
            ):
                return x.getField(n.parts[1])  # struct element field
            if isinstance(n, Lit):
                return F.lit(n.value)
            raise CelSyntaxError("exists() body must compare the bound variable to a literal")
        left, right = side(node.left), side(node.right)
        return {
            "==": left == right,
            "!=": left != right,
            "<": left < right,
            "<=": left <= right,
            ">": left > right,
            ">=": left >= right,
        }[node.op]
    if isinstance(node, Or):
        return _compile_lambda_body(node.left, var, x, outer) | _compile_lambda_body(
            node.right, var, x, outer
        )
    if isinstance(node, And):
        return _compile_lambda_body(node.left, var, x, outer) & _compile_lambda_body(
            node.right, var, x, outer
        )
    if (
        isinstance(node, StrFn)
        and isinstance(node.path, Path)
        and node.path.parts[0] == var
        and len(node.path.parts) <= 2
    ):
        tgt = x if len(node.path.parts) == 1 else x.getField(node.path.parts[1])
        if node.fn == "startsWith":
            return tgt.startswith(node.arg.value)
        if node.fn == "endsWith":
            return tgt.endswith(node.arg.value)
        if node.fn == "contains":
            return tgt.contains(node.arg.value)
        if node.fn == "matches":
            return tgt.rlike(node.arg.value)
    if (
        isinstance(node, Has)
        and node.path.parts[0] == var
        and len(node.path.parts) == 2
    ):
        return x.getField(node.path.parts[1]).isNotNull()
    raise CelSyntaxError("unsupported exists() body")


def _map_expr_column(node, var: str, x: Column) -> Column:
    """Compile a map() transform expression with ``var`` bound to x."""
    if isinstance(node, Path) and node.parts == (var,):
        return x
    if isinstance(node, Lit):
        return F.lit(node.value)
    if isinstance(node, Arith):
        left = _map_expr_column(node.left, var, x)
        right = _map_expr_column(node.right, var, x)
        if node.op == "+":
            return left + right
        if node.op == "-":
            return left - right
        if node.op == "*":
            return left * right
        if node.op == "/":
            # NULL element on /0 (matches DuckDB and the Python backend's
            # None element) — never an ANSI runtime error
            return F.try_divide(left, right)
        if node.op == "%":
            return F.try_mod(left, right)
    raise CelSyntaxError(f"unsupported map() expression {node!r}")


# ---------------------------------------------------------------------------
# Backend 2: DuckDB SQL (oracle)
# ---------------------------------------------------------------------------


class SqlCompiler:
    """Compile the same AST to a DuckDB boolean SQL expression, for the
    driver's side-by-side correctness gate."""

    def __init__(self, mode: str = "json", value_col: str = "value", root: str = "event"):
        self.mode = mode
        self.value_col = value_col
        self.root = root

    def _raw_path(self, path: Path) -> str:
        rel = path.parts[1:]
        if path.parts[0] != self.root or not rel:
            raise CelSyntaxError(f"bad path {path.parts}")
        if self.mode == "json":
            return f"json_extract_string({self.value_col}, '$.{'.'.join(rel)}')"
        return ".".join(rel)

    def _typed_path(self, path: Path, like) -> str:
        raw = self._raw_path(path)
        if self.mode == "columns":
            return raw
        if isinstance(like, bool):
            return f"({raw} = 'true')"
        if isinstance(like, (int, float)):
            return f"TRY_CAST({raw} AS DOUBLE)"
        return raw

    @staticmethod
    def _lit(value) -> str:
        if value is None:
            return "NULL"
        if isinstance(value, bool):
            return "TRUE" if value else "FALSE"
        if isinstance(value, (int, float)):
            return repr(value)
        escaped = str(value).replace("'", "''")
        return f"'{escaped}'"

    def compile(self, node) -> str:
        if isinstance(node, Lit):
            return self._lit(node.value)
        if isinstance(node, Or):
            return f"({self.compile(node.left)} OR {self.compile(node.right)})"
        if isinstance(node, And):
            return f"({self.compile(node.left)} AND {self.compile(node.right)})"
        if isinstance(node, Not):
            # NULL must propagate (NOT NULL → NULL → non-match at the
            # rule-level COALESCE) — coalescing here would turn an
            # errored operand into a MATCH, diverging from the Column
            # and Python backends' error-as-non-match convention
            return f"(NOT {self.compile(node.operand)})"
        if isinstance(node, Cmp):
            if _contains_time(node.left) or _contains_time(node.right):
                left = self._sql_time_side(node.left)
                right = self._sql_time_side(node.right)
                op = {"==": "=", "!=": "<>"}.get(node.op, node.op)
                return f"({left} {op} {right})"
            like = (
                node.right.value
                if isinstance(node.right, Lit)
                else node.left.value
                if isinstance(node.left, Lit)
                else None
            )
            if like is None and (
                isinstance(node.left, Arith) or isinstance(node.right, Arith)
            ):
                like = 1.0  # arithmetic side → compare numerically
            if like is None:
                for side in (node.left, node.right):
                    if isinstance(side, Conv) and side.fn in ("int", "double"):
                        like = 1.0
            left = (
                self._typed_path(node.left, like)
                if isinstance(node.left, Path)
                else self._operand_sql(node.left)
            )
            right = (
                self._typed_path(node.right, like)
                if isinstance(node.right, Path)
                else self._operand_sql(node.right)
            )
            op = {"==": "=", "!=": "<>"}.get(node.op, node.op)
            return f"({left} {op} {right})"
        if isinstance(node, Has):
            return f"({self._raw_path(node.path)} IS NOT NULL)"
        if isinstance(node, InList):
            items = ", ".join(self._lit(v) for v in node.items)
            like = node.items[0] if node.items else None
            # operand may be a literal ('k' in {'k': 1}) or expression,
            # not only a path — mirror ColumnCompiler._operand
            operand = (
                self._typed_path(node.operand, like)
                if isinstance(node.operand, Path)
                else self._operand_sql(node.operand)
            )
            return f"({operand} IN ({items}))"
        if isinstance(node, InField):
            is_num = isinstance(node.needle.value, (int, float)) and not isinstance(
                node.needle.value, bool
            )
            elem = "DOUBLE" if is_num else "VARCHAR"
            if isinstance(node.path, (ListFilter, ListMap)):
                arr = self._sql_list_expr(node.path)
            elif self.mode == "json":
                arr = (
                    f"TRY_CAST(json_extract({self.value_col}, "
                    f"'$.{'.'.join(node.path.parts[1:])}') AS {elem}[])"
                )
            else:
                arr = self._raw_path(node.path)
            needle = self._lit(
                float(node.needle.value) if is_num else node.needle.value
            )
            return f"COALESCE(list_contains({arr}, {needle}), FALSE)"
        if isinstance(node, StrFn):
            if node.fn == "size":
                return self._sql_size(node)
            raw = self._raw_path(node.path)
            if node.fn == "startsWith":
                return f"starts_with({raw}, {self._lit(node.arg.value)})"
            if node.fn == "endsWith":
                return f"ends_with({raw}, {self._lit(node.arg.value)})"
            if node.fn == "contains":
                return f"contains({raw}, {self._lit(node.arg.value)})"
            if node.fn == "matches":
                return f"regexp_matches({raw}, {self._lit(node.arg.value)})"
        if isinstance(node, Exists):
            arr, fields = self._sql_macro_arr(node.path, node.body, node.var)
            body = self._sql_lambda_body(node.body, node.var, fields)
            return (
                f"COALESCE(len(list_filter({arr}, {node.var} -> {body})) > 0, FALSE)"
            )
        if isinstance(node, ForAll):
            arr, fields = self._sql_macro_arr(node.path, node.body, node.var)
            body = self._sql_lambda_body(node.body, node.var, fields)
            # an element whose body is NULL counts as a violation — same
            # outcome Spark's forall gives (NULL → COALESCE FALSE)
            return (
                f"COALESCE(len(list_filter({arr}, "
                f"{node.var} -> NOT COALESCE({body}, FALSE))) = 0, FALSE)"
            )
        if isinstance(node, ExistsOne):
            flt = ListFilter(node.path, node.var, node.body)
            return f"COALESCE(len({self._sql_list_expr(flt)}) = 1, FALSE)"
        if isinstance(node, Ternary):
            cond = self.compile(node.cond)
            return (
                f"(CASE WHEN COALESCE({cond}, FALSE) "
                f"THEN {self.compile(node.then)} "
                f"ELSE {self.compile(node.els)} END)"
            )
        if isinstance(node, Path):
            return self._typed_path(node, True)
        raise CelSyntaxError(f"cannot compile node {node!r}")

    def _operand_sql(self, node) -> str:
        if isinstance(node, Lit):
            return self._lit(node.value)
        if isinstance(node, StrFn) and node.fn == "size":
            return self._sql_size(node)
        if isinstance(node, Arith):
            return self._arith_sql(node)
        if isinstance(node, Conv):
            return self._conv_sql(node)
        raise CelSyntaxError(f"unsupported operand {node!r}")

    def _conv_sql(self, node: Conv) -> str:
        inner = node.operand
        if isinstance(inner, Conv):
            x = self._conv_sql(inner)
        elif isinstance(inner, Lit):
            x = self._lit(inner.value)
        elif isinstance(inner, Path):
            x = self._raw_path(inner)
        elif isinstance(inner, Arith):
            x = self._arith_sql(inner)
        else:
            raise CelSyntaxError(f"unsupported {node.fn}() operand {inner!r}")
        as_num = f"TRY_CAST({x} AS DOUBLE)"
        if node.fn == "double":
            return as_num
        # TRUNC: DuckDB CAST(double AS BIGINT) rounds, Spark truncates
        as_int = f"TRY_CAST(TRUNC({as_num}) AS BIGINT)"
        if node.fn == "int":
            return as_int
        return f"CAST({as_int} AS VARCHAR)"

    def _sql_time_side(self, node) -> str:
        """Mirror of ColumnCompiler._time_side. DuckDB's naive-TIMESTAMP
        cast converts explicit offsets to the UTC instant and treats
        offset-less strings as UTC, independent of the host TimeZone
        setting (probed) — matching Spark's UTC session zone here."""
        if isinstance(node, TsLit):
            return repr(node.epoch)
        if isinstance(node, DurLit):
            return repr(node.seconds)
        if isinstance(node, Path):
            return f"epoch(TRY_CAST({self._raw_path(node)} AS TIMESTAMP))"
        if isinstance(node, Arith):
            left = self._sql_time_side(node.left)
            right = self._sql_time_side(node.right)
            return f"({left} {node.op} {right})"
        raise CelSyntaxError(f"operand {node!r} cannot appear in a time comparison")

    def _arith_sql(self, node: Arith) -> str:
        def num(n) -> str:
            if isinstance(n, Arith):
                return self._arith_sql(n)
            if isinstance(n, Lit):
                if not isinstance(n.value, (int, float)) or isinstance(n.value, bool):
                    raise CelSyntaxError(f"non-numeric literal in arithmetic: {n.value!r}")
                return self._lit(n.value)
            if isinstance(n, Path):
                return self._typed_path(n, 1.0)
            if isinstance(n, StrFn) and n.fn == "size":
                return self._sql_size(n)
            if isinstance(n, Conv) and n.fn in ("int", "double"):
                return self._conv_sql(n)
            raise CelSyntaxError(f"unsupported arithmetic operand {n!r}")

        return f"({num(node.left)} {node.op} {num(node.right)})"

    def _sql_size(self, node: StrFn) -> str:
        """size() — list length over a filter()/map() expression, string
        length over a plain path (mirrors ColumnCompiler._strfn)."""
        if isinstance(node.path, (ListFilter, ListMap)):
            return f"len({self._sql_list_expr(node.path)})"
        raw = self._raw_path(node.path)
        if self.mode == "json":
            # list-vs-string dispatch, mirroring ColumnCompiler._strfn
            return (
                f"(CASE WHEN regexp_matches({raw}, '^\\s*\\[') "
                f"THEN json_array_length(TRY_CAST({raw} AS JSON)) "
                f"ELSE length({raw}) END)"
            )
        return f"length({raw})"

    def _sql_list_arr(self, path: Path, elem_type: str) -> str:
        """The list field as a typed DuckDB array (json mode parses)."""
        if self.mode == "json":
            return (
                f"TRY_CAST(json_extract({self.value_col}, "
                f"'$.{'.'.join(path.parts[1:])}') AS {elem_type}[])"
            )
        return self._raw_path(path)

    def _sql_macro_arr(self, path: Path, body, var: str) -> tuple[str, dict | None]:
        """(array SQL, struct fields-or-None) for a macro list. Struct
        mode keeps elements as JSON values (json mode) — field reads
        happen per-element in the lambda body."""
        fields = _body_fields(body, var)
        if fields:
            return self._sql_list_arr(path, "JSON"), fields
        return self._sql_list_arr(path, _elem_type(body, sql=True)), None

    def _sql_list_expr(self, node) -> str:
        """Compile a list-valued macro (filter()/map()) to a DuckDB list."""
        if isinstance(node, ListFilter):
            arr, fields = self._sql_macro_arr(node.path, node.body, node.var)
            body = self._sql_lambda_body(node.body, node.var, fields)
            return f"list_filter({arr}, {node.var} -> {body})"
        if isinstance(node, ListMap):
            arr = self._sql_list_arr(node.path, "DOUBLE")
            expr = self._sql_map_expr(node.expr, node.var)
            return f"list_transform({arr}, {node.var} -> {expr})"
        raise CelSyntaxError(f"not a list expression: {node!r}")

    def _sql_map_expr(self, node, var: str) -> str:
        if isinstance(node, Path) and node.parts == (var,):
            return var
        if isinstance(node, Lit):
            return self._lit(node.value)
        if isinstance(node, Arith):
            left = self._sql_map_expr(node.left, var)
            right = self._sql_map_expr(node.right, var)
            return f"({left} {node.op} {right})"
        raise CelSyntaxError(f"unsupported map() expression {node!r}")

    def _sql_lambda_body(self, node, var: str, fields: dict | None = None) -> str:
        def field_ref(f: str) -> str:
            if self.mode == "json":
                # struct-mode elements are JSON values; read the field
                # per element with the body-implied type
                if (fields or {}).get(f) == "double":
                    return f"TRY_CAST(json_extract({var}, '$.{f}') AS DOUBLE)"
                return f"json_extract_string({var}, '$.{f}')"
            return f"{var}.{f}"

        if isinstance(node, Cmp):
            def side(n):
                if isinstance(n, Path) and n.parts == (var,):
                    return var
                if (
                    isinstance(n, Path)
                    and n.parts[0] == var
                    and len(n.parts) == 2
                ):
                    return field_ref(n.parts[1])
                if isinstance(n, Lit):
                    return self._lit(n.value)
                raise CelSyntaxError("unsupported exists() body")
            op = {"==": "=", "!=": "<>"}.get(node.op, node.op)
            return f"({side(node.left)} {op} {side(node.right)})"
        if isinstance(node, Or):
            return f"({self._sql_lambda_body(node.left, var, fields)} OR {self._sql_lambda_body(node.right, var, fields)})"
        if isinstance(node, And):
            return f"({self._sql_lambda_body(node.left, var, fields)} AND {self._sql_lambda_body(node.right, var, fields)})"
        if (
            isinstance(node, StrFn)
            and isinstance(node.path, Path)
            and node.path.parts[0] == var
            and len(node.path.parts) <= 2
        ):
            tgt = var if len(node.path.parts) == 1 else field_ref(node.path.parts[1])
            lit = self._lit(node.arg.value)
            if node.fn == "startsWith":
                return f"starts_with({tgt}, {lit})"
            if node.fn == "endsWith":
                return f"ends_with({tgt}, {lit})"
            if node.fn == "contains":
                return f"contains({tgt}, {lit})"
            if node.fn == "matches":
                return f"regexp_matches({tgt}, {lit})"
        if (
            isinstance(node, Has)
            and node.path.parts[0] == var
            and len(node.path.parts) == 2
        ):
            return f"({field_ref(node.path.parts[1])} IS NOT NULL)"
        raise CelSyntaxError("unsupported exists() body")


# ---------------------------------------------------------------------------
# Backend 3: pure-Python oracle evaluation
# ---------------------------------------------------------------------------


def _py_resolve(event: dict, path: Path):
    cur = event
    for p in path.parts[1:]:
        if isinstance(cur, dict) and p in cur:
            cur = cur[p]
        else:
            raise CelEvalError(f"no such key: {'.'.join(path.parts)}")
    return cur


def _py_conv(node: Conv, event: dict):
    """Mirror of ColumnCompiler._conv / SqlCompiler._conv_sql: value as
    double, int/string truncate toward zero; failures → CelEvalError →
    non-match (matching try_cast NULL on the other backends)."""
    import math

    inner = node.operand
    if isinstance(inner, Conv):
        val = _py_conv(inner, event)
    elif isinstance(inner, Lit):
        val = inner.value
    elif isinstance(inner, Path):
        val = _py_resolve(event, inner)
    elif isinstance(inner, Arith):
        val = eval_python(inner, event)
    else:
        raise CelEvalError(f"unsupported {node.fn}() operand {inner!r}")
    if isinstance(val, bool) or val is None:
        raise CelEvalError(f"{node.fn}() on {val!r}")
    try:
        num = float(val)
    except (TypeError, ValueError):
        raise CelEvalError(f"{node.fn}() cannot convert {val!r}") from None
    if node.fn == "double":
        return num
    if math.isnan(num) or math.isinf(num):
        raise CelEvalError(f"{node.fn}() on non-finite {num!r}")
    t = int(math.trunc(num))
    if not -(2**63) <= t < 2**63:
        raise CelEvalError("int() overflow")
    return t if node.fn == "int" else str(t)


def _py_time_side(node, event: dict) -> float:
    """Mirror of the Column/SQL time sides: epoch/interval seconds. A
    field that is missing or fails to parse raises CelEvalError →
    non-match, matching try_to_timestamp's NULL on the other backends."""
    if isinstance(node, TsLit):
        return node.epoch
    if isinstance(node, DurLit):
        return node.seconds
    if isinstance(node, Path):
        val = _py_resolve(event, node)
        if not isinstance(val, str):
            raise CelEvalError(f"time comparison on non-string field: {val!r}")
        try:
            return _parse_rfc3339(val)
        except CelSyntaxError:
            raise CelEvalError(f"unparseable timestamp field {val!r}") from None
    if isinstance(node, Arith):
        left = _py_time_side(node.left, event)
        right = _py_time_side(node.right, event)
        return left + right if node.op == "+" else left - right
    raise CelEvalError(f"operand {node!r} cannot appear in a time comparison")


def eval_python(node, event: dict):
    """CEL-like evaluation against a parsed JSON dict; raises CelEvalError
    on type mismatches / missing keys (which the caller treats as
    non-match, engine.go:20-29)."""
    if isinstance(node, Lit):
        return node.value
    if isinstance(node, Path):
        return _py_resolve(event, node)
    if isinstance(node, Conv):
        return _py_conv(node, event)
    if isinstance(node, Or):
        try:
            if eval_python(node.left, event) is True:
                return True
        except CelEvalError:
            pass
        return eval_python(node.right, event) is True
    if isinstance(node, And):
        return eval_python(node.left, event) is True and eval_python(node.right, event) is True
    if isinstance(node, Not):
        val = eval_python(node.operand, event)
        if not isinstance(val, bool):
            raise CelEvalError("! on non-bool")
        return not val
    if isinstance(node, Has):
        # present AND non-null — the Column/SQL backends compile has()
        # to IS NOT NULL, and a JSON-null field reads as NULL there.
        # DOCUMENTED DIVERGENCE from cel-go (engine.go), which treats a
        # present-but-null JSON key as has()==true: struct-typed Column
        # events cannot distinguish null from absent (from_json maps
        # both to SQL NULL), so all three backends agree on the
        # non-null semantics instead (pinned: tests/test_cel.py
        # HAS_TRUTH, 'has(event.opt)' on {"opt": null})
        try:
            return _py_resolve(event, node.path) is not None
        except CelEvalError:
            return False
    if isinstance(node, Arith):
        import math

        left = eval_python(node.left, event)
        right = eval_python(node.right, event)
        for v in (left, right):
            if not isinstance(v, (int, float)) or isinstance(v, bool):
                raise CelEvalError(f"arithmetic on non-number: {v!r}")
        if node.op == "+":
            return left + right
        if node.op == "-":
            return left - right
        if node.op == "*":
            return left * right
        if node.op == "/":
            if right == 0:
                raise CelEvalError("division by zero")
            return left / right
        if node.op == "%":
            if right == 0:
                raise CelEvalError("modulo by zero")
            # truncated remainder (sign of dividend) — matches Spark/DuckDB
            return math.fmod(left, right)
        raise CelEvalError(f"unknown arithmetic op {node.op!r}")
    if isinstance(node, Cmp):
        if _contains_time(node.left) or _contains_time(node.right):
            left = _py_time_side(node.left, event)
            right = _py_time_side(node.right, event)
        else:
            left = eval_python(node.left, event)
            right = eval_python(node.right, event)
            _check_types(left, right)
        return {
            "==": lambda: left == right,
            "!=": lambda: left != right,
            "<": lambda: left < right,
            "<=": lambda: left <= right,
            ">": lambda: left > right,
            ">=": lambda: left >= right,
        }[node.op]()
    if isinstance(node, InList):
        val = eval_python(node.operand, event)
        return val in node.items
    if isinstance(node, InField):
        if isinstance(node.path, (ListFilter, ListMap)):
            arr = _py_list_expr(node.path, event)
        else:
            arr = _py_resolve(event, node.path)
        if not isinstance(arr, list):
            raise CelEvalError("'in' field is not a list")
        needle = node.needle.value
        if isinstance(needle, (int, float)) and not isinstance(needle, bool):
            # numeric membership compares as double (matches the other
            # backends' DOUBLE[] cast — 3 in [3.0] is a match)
            return any(
                isinstance(v, (int, float))
                and not isinstance(v, bool)
                and float(v) == float(needle)
                for v in arr
            )
        return needle in arr
    if isinstance(node, StrFn):
        if isinstance(node.path, (ListFilter, ListMap)):
            if node.fn != "size":
                raise CelEvalError(f"{node.fn}() on a list expression")
            return len(_py_list_expr(node.path, event))
        val = _py_resolve(event, node.path)
        if node.fn == "size":
            # mirror the Column/SQL backends' list-vs-string dispatch:
            # a '['-leading STRING value is sized as a JSON array (its
            # content), and errors (→ non-match) when it isn't one
            if isinstance(val, str) and val.lstrip().startswith("["):
                try:
                    parsed = json.loads(val)
                except ValueError:
                    raise CelEvalError("size() on non-JSON bracket string") from None
                if not isinstance(parsed, list):
                    raise CelEvalError("size() on non-list JSON")
                return len(parsed)
            return len(val)
        if not isinstance(val, str):
            raise CelEvalError(f"{node.fn} on non-string")
        if node.fn == "startsWith":
            return val.startswith(node.arg.value)
        if node.fn == "endsWith":
            return val.endswith(node.arg.value)
        if node.fn == "contains":
            return node.arg.value in val
        if node.fn == "matches":
            # re.ASCII: Spark rlike (Java) and DuckDB (RE2) treat \d/\w/\s
            # /\b as ASCII-only; Python's default Unicode classes would
            # silently diverge across backends (round-2 ADVICE)
            return re.search(node.arg.value, val, re.ASCII) is not None
    if isinstance(node, Exists):
        arr = _py_resolve(event, node.path)
        if not isinstance(arr, list):
            raise CelEvalError("exists() on non-list")
        rebound = _rebind(node.body, node.var)
        for item in arr:
            try:
                if eval_python(rebound, {**event, node.var: item}) is True:
                    return True
            except CelEvalError:
                continue
        return False
    if isinstance(node, ForAll):
        arr = _py_resolve(event, node.path)
        if not isinstance(arr, list):
            raise CelEvalError("all() on non-list")
        rebound = _rebind(node.body, node.var)
        for item in arr:
            try:
                ok = eval_python(rebound, {**event, node.var: item}) is True
            except CelEvalError:
                ok = False  # errored element = violation (matches SQL/Column)
            if not ok:
                return False
        return True  # vacuously true over [], like cel-go
    if isinstance(node, ExistsOne):
        flt = ListFilter(node.path, node.var, node.body)
        return len(_py_list_expr(flt, event)) == 1
    if isinstance(node, Ternary):
        try:
            cond = eval_python(node.cond, event) is True
        except CelEvalError:
            cond = False  # error/null cond selects the else branch
        return eval_python(node.then if cond else node.els, event)
    raise CelEvalError(f"cannot evaluate {node!r}")


def _py_list_expr(node, event: dict) -> list:
    """Evaluate a list-valued macro (filter()/map()) against the event.

    filter(): elements whose body errors are excluded — same outcome as
    Spark F.filter (NULL body drops the element) and DuckDB list_filter.
    map(): non-numeric elements yield None (mirrors Spark's array<double>
    cast producing NULL), so size() stays backend-consistent."""
    arr = _py_resolve(event, node.path)
    if not isinstance(arr, list):
        raise CelEvalError("filter()/map() on non-list")
    if isinstance(node, ListFilter):
        rebound = _rebind(node.body, node.var)
        out = []
        for item in arr:
            try:
                if eval_python(rebound, {**event, node.var: item}) is True:
                    out.append(item)
            except CelEvalError:
                continue
        return out
    out = []
    for item in arr:
        if not isinstance(item, (int, float)) or isinstance(item, bool):
            out.append(None)
            continue
        try:
            out.append(_py_map_eval(node.expr, node.var, float(item)))
        except CelEvalError:
            # element-wise error (/0, %0) → None element, matching
            # Spark try_divide/try_mod and DuckDB NULL — size() then
            # counts the element on every backend
            out.append(None)
    return out


def _py_map_eval(node, var: str, x: float):
    import math

    if isinstance(node, Path) and node.parts == (var,):
        return x
    if isinstance(node, Lit):
        return float(node.value)
    if isinstance(node, Arith):
        left = _py_map_eval(node.left, var, x)
        right = _py_map_eval(node.right, var, x)
        if node.op == "+":
            return left + right
        if node.op == "-":
            return left - right
        if node.op == "*":
            return left * right
        if node.op == "/":
            if right == 0:
                raise CelEvalError("division by zero")
            return left / right
        if node.op == "%":
            if right == 0:
                raise CelEvalError("modulo by zero")
            return math.fmod(left, right)
    raise CelEvalError(f"unsupported map() expression {node!r}")


def _rebind(node, var: str):
    """exists() bodies reference the bound var as a bare path; eval_python
    resolves paths under the event root, so prefix nothing — paths of the
    form (var,) resolve via the merged dict in eval_python above."""
    if isinstance(node, Path) and node.parts[0] == var:
        return Path(("event", var) + node.parts[1:])
    if isinstance(node, (Cmp, And, Or)):
        cls = type(node)
        if isinstance(node, Cmp):
            return Cmp(node.op, _rebind(node.left, var), _rebind(node.right, var))
        return cls(_rebind(node.left, var), _rebind(node.right, var))
    if isinstance(node, Not):
        return Not(_rebind(node.operand, var))
    if isinstance(node, StrFn) and isinstance(node.path, Path):
        return StrFn(node.fn, _rebind(node.path, var), node.arg)
    if isinstance(node, Has):
        return Has(_rebind(node.path, var))
    return node


def _check_types(left, right):
    def cat(v):
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, (int, float)):
            return "num"
        if isinstance(v, str):
            return "str"
        if v is None:
            return "null"
        return "other"

    if cat(left) != cat(right):
        raise CelEvalError(f"type mismatch: {left!r} vs {right!r}")


def rule_detection_python(line: str, rules: list) -> bool:
    """Oracle mirror of ruleDetection (engine.go:13-34): OR over rules,
    errors count as non-match."""
    try:
        event = json.loads(line)
    except (ValueError, TypeError):
        return False
    if not isinstance(event, dict):
        return False
    for ast in rules:
        try:
            if eval_python(ast, event) is True:
                return True
        except CelEvalError:
            continue
    return False


# ---------------------------------------------------------------------------
# The operator
# ---------------------------------------------------------------------------


class CelFilter:
    """The `cel` processor as a DataFrame transform.

    config mirrors the reference (cel.go:14-17):
        rules:  list of CEL-subset strings (OR-composed)
        action: 'accept' (keep matches) | 'reject' (keep non-matches)
    """

    def __init__(
        self,
        rules: list[str],
        action: str = "accept",
        mode: str = "json",
        value_col: str = "value",
    ):
        if action not in ("accept", "reject"):
            raise ValueError(f"action must be accept|reject, got {action!r}")
        if not rules:
            raise ValueError("rules is required")
        self.action = action
        self.mode = mode
        self.value_col = value_col
        self.asts = [parse_rule(r) for r in rules]  # config-time validation
        self._compiler = ColumnCompiler(mode=mode, value_col=value_col)

    def predicate(self) -> Column:
        """OR over all rules; eval errors → non-match handled by null
        semantics + coalesce(False)."""
        pred = None
        for ast in self.asts:
            col = F.coalesce(
                self._compiler.compile(ast).cast("boolean"), F.lit(False)
            )
            pred = col if pred is None else (pred | col)
        return pred

    def apply(self, df: DataFrame) -> DataFrame:
        df, keep = self.tag(df)
        return df.filter(keep)

    def tag(self, df: DataFrame) -> tuple[DataFrame, Column]:
        """Non-dropping variant: returns (df, keep boolean) for the
        quarantine/dead-letter path (Pipeline.run_batch)."""
        valid = F.lit(True)
        if self.mode == "json":
            # empty / non-JSON lines are non-matches (cel.go:56-70)
            df = df.withColumn(self.value_col, F.trim(F.col(self.value_col)))
            valid = (F.length(self.value_col) > 0) & F.try_parse_json(
                F.col(self.value_col)
            ).isNotNull()
        pred = self.predicate()
        keep = pred if self.action == "accept" else ~pred
        return df, valid & F.coalesce(keep, F.lit(False))

    def sql_predicate(self) -> str:
        """DuckDB boolean expression equivalent to predicate()."""
        sql = SqlCompiler(mode=self.mode, value_col=self.value_col)
        parts = [f"COALESCE({sql.compile(ast)}, FALSE)" for ast in self.asts]
        joined = " OR ".join(parts)
        return f"({joined})" if len(parts) > 1 else joined
