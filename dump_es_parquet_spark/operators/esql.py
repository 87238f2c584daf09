"""ES|QL → DataFrame compiler (round 15): the pipe query language
ES 8.11+ ships as its modern request dialect. The reference forwards
request bodies verbatim to the server (``dump-es-parquet:222,385``);
once the index is dumped, saved ES|QL queries are as dead as saved
``_search`` bodies — this module replays them on the parquet lake,
the same lake-side story as ``operators/es_search.py`` for the
classic DSL.

Supported (the practical analyst subset, each compiling to the
DataFrame op it is):

- ``FROM index [, index...]`` — the source table(s); multiple
  sources union by name (the engine's schema-evolution union
  discipline applies upstream).
- ``| WHERE <expr>`` — a boolean expression over the full operator
  grammar below; three-valued NULL semantics exactly as ES|QL (a
  NULL verdict drops the row).
- ``| EVAL name = expr, ...`` — computed columns, later assignments
  seeing earlier ones (ES|QL's left-to-right binding).
- ``| STATS agg [, agg...] [BY key [, key...]]`` — grouped
  aggregation; ``BY`` keys may be ``name = expr`` forms; each
  aggregate may carry its own ``WHERE cond`` filter (the 8.13
  per-aggregate mask — F.when feeds NULLs the aggregate skips).
  Aggregates:
  COUNT(*)/COUNT(x), SUM, MIN, MAX, AVG (the engine's exact-decimal
  tree, association-free across engines), COUNT_DISTINCT, MEDIAN and
  PERCENTILE(x, p) (exact linear interpolation — ES|QL uses t-digest,
  the PARITY #20 percentile divergence).
- ``| SORT key [ASC|DESC] [NULLS FIRST|LAST], ...``
- ``| LIMIT n``
- ``| KEEP a, tmp*`` / ``| DROP a, *_raw`` (wildcards expand in
  pattern order; a plain missing name errors) / ``| RENAME a AS b``
- ``| MV_EXPAND col`` — explode_outer over a multi-value column.
- ``| ROW name = literal, ...`` — a literal one-row source (no FROM).
- ``| DISSECT col "%{a} [%{b}] %{c}"`` — delimiter-based extraction
  as ONE anchored regex (non-greedy holes = dissect's
  leftmost-delimiter rule; non-matching rows get NULL fields;
  append/pad/reference modifiers raise).
- ``| GROK col "%{IP:ip} %{NUMBER:status:int}"`` — regex extraction
  through the bundled core Logstash pattern set (public grok
  pattern content), unanchored like grok, typed captures via
  int/long/float/double suffixes; unknown patterns raise with the
  bundled list.
- ``BUCKET(col, span)`` inside STATS BY — calendar spans truncate
  like DATE_TRUNC, numeric spans floor to the band start; the 4-arg
  adaptive form raises (server-side width heuristics).

Expression grammar: ``== != < <= > >= + - * / %``, ``AND OR NOT``,
``IN (v, ...)``, ``LIKE "wild*card?"`` (ES|QL wildcards), ``RLIKE
"regex"``, ``IS [NOT] NULL``, parentheses, unary minus, string /
numeric / boolean / NULL literals, backquoted identifiers, and a
curated function table (see ``_FUNCTIONS``) including ``CASE`` and
``CIDR_MATCH`` (the round-15 octet-split ip tree).

- ``| LOOKUP JOIN <lookup_index> ON <field>`` (ES 8.18 GA) — the
  lookup index resolves from the same ``tables`` dict as FROM; a
  BROADCAST left join (ES constrains lookup indexes to
  ``index.mode=lookup`` single-shard — the dimension-table class, so
  broadcast is the 100 TB plan). Multiple matches multiply rows
  (real join semantics); non-key lookup columns SHADOW same-named
  left columns (NULL where unmatched), per the ES field-precedence
  rule.
- ``| ENRICH <policy> ON <match_field> [WITH [new =] field, ...]``
  — the lake reading of a MATERIALIZED enrich index: the policy
  name resolves from ``tables``; broadcast left join adding the
  requested enrich fields. ES's enrich takes ``max_matches=1`` — a
  policy table with duplicate match keys raises loudly (one bounded
  1-row validation collect) instead of silently picking one.

Out of scope, each raising loudly with the reason:
``METADATA`` fields (``_id``/``_index`` die with the cluster),
``INLINESTATS`` (retracted from 8.x; tech-preview semantics are not
stable enough to pin) and ``NOW()`` / date-math relative to now (no
deterministic lake reading — pin the instant). Aggregate ``VALUES``
(sorted-ascending distinct set — ES|QL leaves the order undefined;
the engine pins the deterministic reading) and ``TOP(x, n, order)``
(round 16) return multi-value columns that compose with the MV_*
function family.

Determinism: ES|QL results are unordered unless SORT is given —
callers wanting hash-stable output must end with SORT (the oracle
rows do).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["esql"]


# --- tokenizer ----------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>//[^\n]*)
  | (?P<pipe>\|)
  | (?P<num>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
  | (?P<str>"(?:[^"\\]|\\.)*")
  | (?P<bquote>`[^`]*`)
  | (?P<op>==|!=|<=|>=|<|>|\+|-|\*|/|%|,|\(|\)|=|\.)
  | (?P<word>[A-Za-z_][A-Za-z0-9_]*)
    """,
    re.VERBOSE,
)

_KEYWORDS = {
    "FROM", "ROW", "WHERE", "EVAL", "STATS", "BY", "SORT", "LIMIT",
    "KEEP", "DROP", "RENAME", "AS", "MV_EXPAND", "AND", "OR", "NOT",
    "IN", "LIKE", "RLIKE", "IS", "NULL", "TRUE", "FALSE", "ASC",
    "DESC", "NULLS", "FIRST", "LAST",
}

#: the core public Logstash grok patterns (the log-analytics staple
#: set; grok pattern files are public Elastic/Logstash content). Each
#: body is capture-free — %{X:name} wraps it in the capture group.
_GROK_PATTERNS = {
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "POSINT": r"\b\d+\b",
    "NUMBER": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "BASE10NUM": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "IP": r"(?:\d{1,3}\.){3}\d{1,3}",
    "IPV4": r"(?:\d{1,3}\.){3}\d{1,3}",
    "HOSTNAME": r"\b[0-9A-Za-z][0-9A-Za-z-]{0,62}"
                r"(?:\.[0-9A-Za-z][0-9A-Za-z-]{0,62})*\.?\b",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"[a-zA-Z0-9._-]+",
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}"
                         r"(?::\d{2}(?:\.\d+)?)?"
                         r"(?:Z|[+-]\d{2}:?\d{2})?",
    "LOGLEVEL": r"(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|"
                r"[Nn]otice|NOTICE|[Ii]nfo|INFO|[Ww]arn(?:ing)?|"
                r"WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)?|"
                r"[Cc]rit(?:ical)?|CRIT(?:ICAL)?|[Ff]atal|FATAL|"
                r"[Ss]evere|SEVERE|[Ee]merg(?:ency)?|EMERG(?:ENCY)?)",
    "QUOTEDSTRING": r'"(?:[^"\\]|\\.)*"',
}

_GROK_TYPES = {
    "int": "long", "long": "long",
    "float": "double", "double": "double",
}

_UNSUPPORTED_COMMANDS = {
    "METADATA": "_id/_index metadata dies with the cluster",
    "SHOW": "cluster introspection has no lake meaning",
    "INLINESTATS": "retracted from ES 8.x; tech-preview semantics "
                   "are not stable enough to pin — use STATS",
}


class _Tok:
    __slots__ = ("kind", "val", "start", "end")

    def __init__(self, kind: str, val, start: int = -1, end: int = -1):
        # source spans let KEEP/DROP tell `tmp*` (adjacent tokens —
        # one pattern) from `a b` (a missing comma) apart
        self.kind, self.val = kind, val
        self.start, self.end = start, end

    def __repr__(self):  # pragma: no cover — debug only
        return f"<{self.kind} {self.val!r}>"


def _tokenize(s: str) -> list[_Tok]:
    toks: list[_Tok] = []
    pos = 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m:
            raise ValueError(f"ES|QL: cannot tokenize at {s[pos:pos+20]!r}")
        start, pos = m.start(), m.end()
        kind = m.lastgroup
        text = m.group()
        if kind in ("ws", "comment"):
            continue
        if kind == "num":
            toks.append(_Tok("num", float(text) if
                             ("." in text or "e" in text or "E" in text)
                             else int(text), start, pos))
        elif kind == "str":
            toks.append(_Tok("str", _unescape(text[1:-1]), start, pos))
        elif kind == "bquote":
            toks.append(_Tok("ident", text[1:-1], start, pos))
        elif kind == "word":
            up = text.upper()
            if up in _KEYWORDS:
                toks.append(_Tok("kw", up, start, pos))
            else:
                toks.append(_Tok("ident", text, start, pos))
        elif kind == "pipe":
            toks.append(_Tok("pipe", "|", start, pos))
        else:
            toks.append(_Tok("op", text, start, pos))
    return toks


def _unescape(s: str) -> str:
    """String-literal escapes: ``\\n \\t \\r \\" \\\\`` translate;
    any OTHER backslash sequence is preserved verbatim so
    regex-bearing literals (GROK/DISSECT/RLIKE patterns full of
    ``\\[`` / ``\\d``) survive one level of quoting — the lenient
    reading of ES|QL's escape rules."""
    out, i = [], 0
    while i < len(s):
        if s[i] == "\\" and i + 1 < len(s):
            c = s[i + 1]
            if c in ("n", "t", "r"):
                out.append({"n": "\n", "t": "\t", "r": "\r"}[c])
            elif c in ('"', "\\"):
                out.append(c)
            else:
                out.append("\\" + c)
            i += 2
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


# --- expression parser (Pratt, over DataFrame columns) ------------------

def _fn_substring(args):
    if len(args) == 2:
        # to-end form: SUBSTRING(s, start) — 1-based like ES|QL
        return F.substring(args[0], args[1].cast("int"), 2 ** 31 - 1)
    return F.substring(args[0], args[1].cast("int"), args[2].cast("int"))


def _fn_round(args):
    if len(args) == 1:
        return F.round(args[0], 0)
    # the second arg must be a literal int (Spark's round signature)
    raise ValueError(
        "ROUND(x, d): pass d inline as a literal via ROUND_TO "
        "semantics — use EVAL with ROUND(x) or pre-scale; the "
        "two-arg form needs a literal digit count"
    )


def _fn_case(args):
    if len(args) < 2:
        raise ValueError("CASE needs at least (condition, value)")
    pairs, default = args, None
    if len(args) % 2 == 1:
        pairs, default = args[:-1], args[-1]
    out = None
    for i in range(0, len(pairs), 2):
        cond, val = pairs[i], pairs[i + 1]
        out = F.when(cond, val) if out is None else out.when(cond, val)
    return out.otherwise(default) if default is not None else out


def _fn_cidr_match(args):
    # CIDR_MATCH(ip, "block", ...) — blocks must be string literals;
    # reuses the round-15 octet-split band tree
    from .es_search import _cidr_bounds, _ip_col_to_long

    if len(args) < 2:
        raise ValueError("CIDR_MATCH(ip, block, ...)")
    ipv = _ip_col_to_long(args[0])
    out = None
    for blk in args[1:]:
        lit = _literal_string_of(blk)
        lo, hi = _cidr_bounds(lit)
        band = (ipv >= F.lit(lo)) & (ipv < F.lit(hi))
        out = band if out is None else out | band
    return out


def _fn_ip_prefix(args):
    # IP_PREFIX(ip, prefixLengthV4[, prefixLengthV6]) — the network
    # base as a dotted-quad string through the round-15 octet tree
    # (IPv4 only: a v6-shaped value yields NULL like any malformed
    # ip; the v6 prefix argument is accepted and ignored — the ip
    # family's documented 128-bit bound)
    from .es_search import _ip_col_to_long

    if len(args) not in (2, 3):
        raise ValueError("IP_PREFIX(ip, prefix_v4[, prefix_v6])")
    plen = int(_literal_number_of(args[1]))
    if not (0 <= plen <= 32):
        raise ValueError(f"IP_PREFIX v4 length {plen} out of [0, 32]")
    width = 1 << (32 - plen)
    base = F.floor(_ip_col_to_long(args[0]) / F.lit(width)) * F.lit(width)
    quad = F.concat_ws(
        ".",
        *[(F.floor(base / F.lit(d)) % F.lit(256)).cast("string")
          for d in (16777216, 65536, 256, 1)],
    )
    return F.when(base.isNotNull(), quad)


def _fn_mv_sum(args):
    # NULL elements skip (ES|QL multi-value semantics); an empty or
    # all-NULL array yields NULL
    vals = F.filter(args[0], lambda x: x.isNotNull())
    return F.when(
        F.size(vals) > 0,
        F.aggregate(
            vals, F.lit(0.0),
            lambda acc, x: acc + x.cast("double"),
        ),
    )


def _fn_mv_avg(args):
    vals = F.filter(args[0], lambda x: x.isNotNull())
    return F.when(F.size(vals) > 0, _fn_mv_sum(args) / F.size(vals))


def _fn_date_diff(args):
    # DATE_DIFF("unit", start, end) — the unit must be a plan-time
    # literal; Spark's timestampdiff truncates toward the epoch
    # difference in whole units, matching ES|QL's integer contract
    unit = _literal_string_of(args[0]).strip().lower()
    units = {
        "year": "YEAR", "month": "MONTH", "week": "WEEK",
        "day": "DAY", "hour": "HOUR", "minute": "MINUTE",
        "second": "SECOND",
    }
    if unit not in units:
        raise ValueError(f"DATE_DIFF unit {unit!r}: one of {sorted(units)}")
    return F.timestamp_diff(units[unit], args[1], args[2])


def _fn_date_format(args):
    # DATE_FORMAT("pattern", date) — java DateTimeFormatter patterns,
    # the subset Spark's date_format shares
    if len(args) != 2:
        raise ValueError('DATE_FORMAT("pattern", date)')
    return F.date_format(args[1], _literal_string_of(args[0]))


def _literal_number_of(c) -> float:
    """Plan-time numeric literal, via the same registry discipline
    as string literals (IP_PREFIX lengths must be constants — the
    subnet width is computed at plan time)."""
    try:
        return _LIT_NUMS[id(c)][1]
    except KeyError:
        raise ValueError(
            "this argument must be a numeric literal"
        ) from None


#: string-literal registry for functions whose argument must be a
#: plan-time constant (CIDR_MATCH blocks, DATE_TRUNC units): maps
#: id(Column) → (Column, text). Holding the Column reference keeps
#: its id from being reused while the entry lives; esql() clears the
#: registry at entry so it never grows across calls.
_LIT_STRINGS: dict[int, tuple[Column, str]] = {}


def _lit_str(s: str) -> Column:
    c = F.lit(s)
    _LIT_STRINGS[id(c)] = (c, s)
    return c


#: numeric twin of _LIT_STRINGS (same lifetime discipline)
_LIT_NUMS: dict[int, tuple[Column, float]] = {}


def _lit_num(v) -> Column:
    c = F.lit(v)
    _LIT_NUMS[id(c)] = (c, float(v))
    return c


def _literal_string_of(c: Column) -> str:
    try:
        return _LIT_STRINGS[id(c)][1]
    except KeyError:
        raise ValueError(
            "this argument must be a string literal"
        ) from None


def _fn_mv_sort(a):
    # ES|QL MV_SORT(field[, "ASC"|"DESC"]) — the optional order arg
    # was silently dropped before (ADVICE r16); honor it, and raise
    # on anything that isn't one of the two documented literals.
    if len(a) == 1:
        return F.sort_array(a[0])
    if len(a) != 2:
        raise ValueError("MV_SORT takes (field[, order])")
    order = _literal_string_of(a[1]).strip().lower()
    if order not in ("asc", "desc"):
        raise ValueError(
            f"MV_SORT order must be \"ASC\" or \"DESC\", got {order!r}"
        )
    return F.sort_array(a[0], asc=(order == "asc"))


def _fn_date_trunc(args):
    # ES|QL spells DATE_TRUNC(1 day, ts) or DATE_TRUNC("1 day", ts);
    # the parser routes the interval through a string literal
    unit = _literal_string_of(args[0]).strip().lower()
    unit = re.sub(r"^1\s+", "", unit).rstrip("s")
    allowed = {"second", "minute", "hour", "day", "week", "month",
               "quarter", "year"}
    if unit not in allowed:
        raise ValueError(f"DATE_TRUNC unit {unit!r}")
    return F.date_trunc(unit, args[1])


def _banned_now(_args):
    raise ValueError(
        "NOW() has no deterministic lake reading — pin the instant"
    )


def _fn_bucket(args):
    """``BUCKET(col, span)`` — ES|QL's STATS grouping helper: a
    calendar span (``1 day`` routed through the interval literal)
    truncates like DATE_TRUNC; a numeric span floors to the band
    START (``BUCKET(v, 100)`` → 0, 100, 200...), keyed like the
    histogram agg. The 4-arg adaptive form (target bucket count +
    min/max) is server-side heuristics — raise."""
    if len(args) != 2:
        raise ValueError(
            "BUCKET(col, span): the 4-arg adaptive form picks its "
            "width from server-side heuristics — pass the span"
        )
    try:
        _literal_string_of(args[1])
    except ValueError:
        span = args[1]
        return F.floor(args[0] / span) * span
    return _fn_date_trunc([args[1], args[0]])


_FUNCTIONS = {
    "ABS": lambda a: F.abs(a[0]),
    "CEIL": lambda a: F.ceil(a[0]),
    "FLOOR": lambda a: F.floor(a[0]),
    "SQRT": lambda a: F.sqrt(a[0]),
    "POW": lambda a: F.pow(a[0], a[1]),
    "LOG": lambda a: F.log(a[0]) if len(a) == 1 else F.log(a[0], a[1]),
    "LOG10": lambda a: F.log10(a[0]),
    "EXP": lambda a: F.exp(a[0]),
    "ROUND": _fn_round,
    "LENGTH": lambda a: F.length(a[0]),
    "SUBSTRING": _fn_substring,
    "TO_LOWER": lambda a: F.lower(a[0]),
    "TO_UPPER": lambda a: F.upper(a[0]),
    "TRIM": lambda a: F.trim(a[0]),
    "LTRIM": lambda a: F.ltrim(a[0]),
    "RTRIM": lambda a: F.rtrim(a[0]),
    "REPLACE": lambda a: F.regexp_replace(a[0], a[1], a[2]),
    "STARTS_WITH": lambda a: a[0].startswith(a[1]),
    "ENDS_WITH": lambda a: a[0].endswith(a[1]),
    "CONCAT": lambda a: F.concat(*a),
    "SPLIT": lambda a: F.split(a[0], a[1]),
    "COALESCE": lambda a: F.coalesce(*a),
    "GREATEST": lambda a: F.greatest(*a),
    "LEAST": lambda a: F.least(*a),
    "CASE": _fn_case,
    "CIDR_MATCH": _fn_cidr_match,
    "DATE_TRUNC": _fn_date_trunc,
    "DATE_EXTRACT": lambda a: F.date_part(a[0], a[1]),
    "TO_STRING": lambda a: a[0].cast("string"),
    "TO_INTEGER": lambda a: a[0].try_cast("int"),
    "TO_LONG": lambda a: a[0].try_cast("long"),
    "TO_DOUBLE": lambda a: a[0].try_cast("double"),
    "TO_DATETIME": lambda a: a[0].cast("timestamp"),
    "MV_COUNT": lambda a: F.size(a[0]),
    "MV_MIN": lambda a: F.array_min(a[0]),
    "MV_MAX": lambda a: F.array_max(a[0]),
    "MV_SUM": _fn_mv_sum,
    "MV_AVG": _fn_mv_avg,
    "MV_FIRST": lambda a: F.try_element_at(a[0], F.lit(1)),
    "MV_LAST": lambda a: F.try_element_at(a[0], F.lit(-1)),
    "MV_DEDUPE": lambda a: F.array_distinct(a[0]),
    "MV_SORT": _fn_mv_sort,
    "MV_CONCAT": lambda a: F.array_join(a[0], _literal_string_of(a[1])),
    "LEFT": lambda a: F.left(a[0], a[1]),
    "RIGHT": lambda a: F.right(a[0], a[1]),
    "LOCATE": lambda a: (
        F.locate(_literal_string_of(a[1]), a[0])
        if len(a) == 2
        else F.locate(_literal_string_of(a[1]), a[0],
                      int(_literal_number_of(a[2])))
    ),
    "REVERSE": lambda a: F.reverse(a[0]),
    "REPEAT": lambda a: F.repeat(a[0], a[1]),
    "SIGNUM": lambda a: F.signum(a[0]),
    "CBRT": lambda a: F.cbrt(a[0]),
    "SIN": lambda a: F.sin(a[0]),
    "COS": lambda a: F.cos(a[0]),
    "TAN": lambda a: F.tan(a[0]),
    "ASIN": lambda a: F.asin(a[0]),
    "ACOS": lambda a: F.acos(a[0]),
    "ATAN": lambda a: F.atan(a[0]),
    "ATAN2": lambda a: F.atan2(a[0], a[1]),
    "PI": lambda a: F.lit(__import__("math").pi),
    "TAU": lambda a: F.lit(2 * __import__("math").pi),
    "E": lambda a: F.lit(__import__("math").e),
    "DATE_DIFF": _fn_date_diff,
    "DATE_FORMAT": _fn_date_format,
    "TO_BOOLEAN": lambda a: a[0].try_cast("boolean"),
    "IP_PREFIX": _fn_ip_prefix,
    "BUCKET": _fn_bucket,
    "NOW": _banned_now,
}

#: STATS aggregates. AVG takes the engine's exact-decimal tree (sum
#: through DECIMAL(18,6), divide by the non-null count) so the double
#: is association-free across engines — the es_search metric
#: discipline. MEDIAN/PERCENTILE are exact interpolation (ES|QL:
#: t-digest — the documented divergence).
_AGGS = {
    "COUNT", "SUM", "MIN", "MAX", "AVG", "COUNT_DISTINCT", "MEDIAN",
    "PERCENTILE", "VALUES", "TOP",
}


class _ExprParser:
    def __init__(self, toks: list[_Tok], pos: int, allow_aggs=False,
                 agg_filter: Column | None = None):
        self.toks, self.pos = toks, pos
        self.allow_aggs = allow_aggs
        # STATS `agg WHERE cond` (ES|QL 8.13): every aggregate input
        # masks through the condition (NULLs skip, so F.when is the
        # exact per-aggregate filter)
        self.agg_filter = agg_filter

    def peek(self) -> _Tok | None:
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def at(self, kind: str, val=None) -> bool:
        t = self.peek()
        return t is not None and t.kind == kind and (
            val is None or t.val == val
        )

    def take(self) -> _Tok:
        t = self.peek()
        if t is None:
            raise ValueError("ES|QL: unexpected end of expression")
        self.pos += 1
        return t

    def expect(self, kind: str, val=None) -> _Tok:
        t = self.take()
        if t.kind != kind or (val is not None and t.val != val):
            raise ValueError(f"ES|QL: expected {val or kind}, got {t!r}")
        return t

    # precedence: OR < AND < NOT < comparison/IN/LIKE/IS < add < mul
    def parse(self) -> Column:
        return self._or()

    def _or(self) -> Column:
        left = self._and()
        while self.at("kw", "OR"):
            self.take()
            left = left | self._and()
        return left

    def _and(self) -> Column:
        left = self._not()
        while self.at("kw", "AND"):
            self.take()
            left = left & self._not()
        return left

    def _not(self) -> Column:
        if self.at("kw", "NOT"):
            self.take()
            return ~self._not()
        return self._cmp()

    def _cmp(self) -> Column:
        left = self._add()
        t = self.peek()
        if t is None:
            return left
        if t.kind == "op" and t.val in ("==", "!=", "<", "<=", ">", ">="):
            self.take()
            right = self._add()
            return {
                "==": lambda a, b: a == b,
                "!=": lambda a, b: a != b,
                "<": lambda a, b: a < b,
                "<=": lambda a, b: a <= b,
                ">": lambda a, b: a > b,
                ">=": lambda a, b: a >= b,
            }[t.val](left, right)
        if t.kind == "kw" and t.val == "IN":
            self.take()
            self.expect("op", "(")
            vals = [self._add()]
            while self.at("op", ","):
                self.take()
                vals.append(self._add())
            self.expect("op", ")")
            out = left == vals[0]
            for v in vals[1:]:
                out = out | (left == v)
            return out
        if t.kind == "kw" and t.val in ("LIKE", "RLIKE"):
            self.take()
            pat = self.expect("str").val
            if t.val == "RLIKE":
                return left.rlike(f"^(?:{pat})$")
            esc = (pat.replace("\\", "\\\\").replace("%", r"\%")
                   .replace("_", r"\_").replace("*", "%")
                   .replace("?", "_"))
            return left.like(esc)
        if t.kind == "kw" and t.val == "IS":
            self.take()
            neg = False
            if self.at("kw", "NOT"):
                self.take()
                neg = True
            self.expect("kw", "NULL")
            return left.isNotNull() if neg else left.isNull()
        return left

    def _add(self) -> Column:
        left = self._mul()
        while self.at("op", "+") or self.at("op", "-"):
            op = self.take().val
            right = self._mul()
            left = left + right if op == "+" else left - right
        return left

    def _mul(self) -> Column:
        left = self._unary()
        while self.at("op", "*") or self.at("op", "/") or self.at("op", "%"):
            op = self.take().val
            right = self._unary()
            left = (left * right if op == "*"
                    else left / right if op == "/" else left % right)
        return left

    def _unary(self) -> Column:
        if self.at("op", "-"):
            self.take()
            return -self._unary()
        return self._primary()

    def _primary(self) -> Column:
        t = self.take()
        if t.kind == "op" and t.val == "(":
            inner = self._or()
            self.expect("op", ")")
            return inner
        if t.kind == "num":
            # "1 day"-style intervals reach DATE_TRUNC as a following
            # ident — rejoin them into a string literal
            if self.at("ident") and str(self.toks[self.pos].val).lower() in (
                "second", "seconds", "minute", "minutes", "hour",
                "hours", "day", "days", "week", "weeks", "month",
                "months", "quarter", "quarters", "year", "years",
            ):
                unit = self.take().val
                return _lit_str(f"{t.val} {unit}")
            return _lit_num(t.val)
        if t.kind == "str":
            return _lit_str(t.val)
        if t.kind == "kw" and t.val in ("TRUE", "FALSE"):
            return F.lit(t.val == "TRUE")
        if t.kind == "kw" and t.val == "NULL":
            return F.lit(None)
        if t.kind == "ident":
            name = t.val
            if self.at("op", "("):
                return self._call(name)
            # dotted path (struct field access)
            while self.at("op", "."):
                self.take()
                name += "." + self.expect("ident").val
            return F.col(name)
        raise ValueError(f"ES|QL: unexpected token {t!r}")

    def _call(self, name: str) -> Column:
        up = name.upper()
        self.expect("op", "(")
        args: list[Column] = []
        star = False
        if self.at("op", "*"):
            self.take()
            star = True
        elif not self.at("op", ")"):
            args.append(self._or())
            while self.at("op", ","):
                self.take()
                args.append(self._or())
        self.expect("op", ")")
        if up in _AGGS:
            if not self.allow_aggs:
                raise ValueError(
                    f"ES|QL: aggregate {up} outside STATS"
                )
            return self._agg(up, args, star)
        fn = _FUNCTIONS.get(up)
        if fn is None:
            raise ValueError(f"ES|QL: unknown function {name!r}")
        return fn(args)

    def _agg(self, up: str, args: list[Column], star: bool) -> Column:
        if self.agg_filter is not None:
            # WHERE-masked aggregate: non-matching rows feed NULL,
            # which every aggregate below skips (COUNT(*) counts the
            # mask itself)
            if args:
                args = [F.when(self.agg_filter, args[0]), *args[1:]]
        if up == "COUNT":
            if star or not args:
                if self.agg_filter is not None:
                    return F.count(F.when(self.agg_filter, F.lit(1)))
                return F.count(F.lit(1))
            return F.count(args[0])
        if up == "SUM":
            return F.sum(args[0])
        if up == "MIN":
            return F.min(args[0])
        if up == "MAX":
            return F.max(args[0])
        if up == "AVG":
            # the engine's exact-decimal avg tree (association-free
            # doubles across engines — the es_search discipline)
            return (
                F.sum(args[0].cast("decimal(18,6)")).cast("double")
                / F.count(args[0])
            )
        if up == "COUNT_DISTINCT":
            # exact (ES|QL approximates; the PARITY cardinality
            # divergence — exactness makes oracle rows hash-checkable)
            return F.count_distinct(args[0])
        if up == "VALUES":
            # ES|QL VALUES(x): the distinct multi-value set; ES|QL
            # leaves the order UNDEFINED — the engine documents the
            # sorted-ascending reading (deterministic, oracle-able);
            # NULLs skip (collect_set)
            return F.sort_array(F.collect_set(args[0]))
        if up == "TOP":
            # TOP(x, n, "asc"|"desc") — the n extreme values as a
            # multi-value result; n and the order must be plan-time
            # literals (ES|QL's own contract)
            if len(args) != 3:
                raise ValueError('ES|QL: TOP(x, n, "asc"|"desc")')
            n = int(_literal_number_of(args[1]))
            if n < 1:
                raise ValueError("ES|QL TOP: n must be >= 1")
            order = _literal_string_of(args[2]).lower()
            if order not in ("asc", "desc"):
                raise ValueError('ES|QL TOP: order is "asc" or "desc"')
            return F.slice(
                F.sort_array(F.collect_list(args[0]),
                             asc=(order == "asc")),
                1, n,
            )
        if up == "MEDIAN":
            return F.percentile(args[0], F.lit(0.5))
        if up == "PERCENTILE":
            frac = args[1]
            return F.percentile(args[0], frac / F.lit(100.0))
        raise ValueError(up)  # pragma: no cover


# --- command compiler ----------------------------------------------------

def esql(tables, query: str) -> DataFrame:
    """Compile and run an ES|QL query against the lake.

    ``tables``: a ``{name: DataFrame}`` dict (FROM resolves here), or
    a single DataFrame (then FROM accepts any single name)."""
    _LIT_STRINGS.clear()
    _LIT_NUMS.clear()
    toks = _tokenize(query)
    if not toks:
        raise ValueError("ES|QL: empty query")
    # split on top-level pipes
    stages: list[list[_Tok]] = [[]]
    for t in toks:
        if t.kind == "pipe":
            stages.append([])
        else:
            stages[-1].append(t)
    df = _source(stages[0], tables)
    for stage in stages[1:]:
        if not stage:
            raise ValueError("ES|QL: empty pipe stage")
        df = _command(df, stage, tables)
    return df


def _source(stage: list[_Tok], tables) -> DataFrame:
    if not stage or stage[0].kind != "kw":
        raise ValueError("ES|QL: query must start with FROM or ROW")
    head = stage[0].val
    if head == "ROW":
        # ROW name = literal, ... — a one-row literal source
        p = _ExprParser(stage, 1)
        names, cols = _assignments(p)
        if p.peek() is not None:
            raise ValueError(f"ES|QL: trailing tokens at {p.peek()!r}")
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        one = spark.range(1).drop("id")
        return one.select(*[c.alias(n) for n, c in zip(names, cols)])
    if head != "FROM":
        raise ValueError(
            f"ES|QL: query must start with FROM or ROW, got {head}"
        )
    names = []
    i = 1
    while i < len(stage):
        t = stage[i]
        if t.kind == "ident":
            names.append(t.val)
            i += 1
            if i < len(stage) and stage[i].kind == "op" and stage[i].val == ",":
                i += 1
                continue
            break
        raise ValueError(f"ES|QL: FROM expects index names, got {t!r}")
    if i < len(stage):
        extra = stage[i]
        if extra.kind == "kw" and extra.val == "METADATA" or (
            extra.kind == "ident" and extra.val.upper() == "METADATA"
        ):
            raise ValueError(
                "ES|QL METADATA: " + _UNSUPPORTED_COMMANDS["METADATA"]
            )
        raise ValueError(f"ES|QL: trailing tokens after FROM: {extra!r}")
    if isinstance(tables, DataFrame):
        if len(names) != 1:
            raise ValueError("single-frame esql() accepts one FROM name")
        return tables
    missing = [n for n in names if n not in tables]
    if missing:
        raise ValueError(f"ES|QL: unknown index {missing[0]!r}")
    df = tables[names[0]]
    for n in names[1:]:
        df = df.unionByName(tables[n], allowMissingColumns=True)
    return df


def _assignments(p: _ExprParser) -> tuple[list[str], list[Column]]:
    """``name = expr [, name = expr...]`` — later EVAL assignments
    see earlier ones via select-chaining in the caller."""
    names, cols = [], []
    while True:
        name = p.expect("ident").val
        p.expect("op", "=")
        cols.append(p._or())
        names.append(name)
        if p.at("op", ","):
            p.take()
            continue
        return names, cols


def _command(df: DataFrame, stage: list[_Tok], tables=None) -> DataFrame:
    head = stage[0]
    if head.kind == "ident" and head.val.upper() in _UNSUPPORTED_COMMANDS:
        up = head.val.upper()
        raise ValueError(f"ES|QL {up}: {_UNSUPPORTED_COMMANDS[up]}")
    if head.kind == "ident" and head.val.upper() in ("LOOKUP", "ENRICH"):
        return _lookup_or_enrich(df, stage, tables)
    if head.kind == "ident" and head.val.upper() == "SAMPLE":
        # round 17 (VERDICT r16 Next #6): the ES 9.x `| SAMPLE
        # probability` as the random_sampler portable-hash filter
        # (PARITY #35's determinism discipline): ES samples
        # pseudo-randomly per row, which has no deterministic lake
        # reading, so the engine requires a doc-identity column via
        # the `SAMPLE p ON field` extension — a row is kept iff the
        # md5 bucket of its identity lands under p (quantized
        # 1/10000, the hash_bucket primitive, spelled identically
        # in the DuckDB oracle). The retired tech-preview seed form
        # (`SAMPLE p seed`) raises.
        if len(stage) < 2 or stage[1].kind != "num":
            raise ValueError("ES|QL: SAMPLE <probability> ON <field>")
        p = float(stage[1].val)
        if not (0.0 < p < 1.0):
            raise ValueError(
                "ES|QL SAMPLE probability must be in (0, 1) "
                "exclusive (the ES contract)"
            )
        if len(stage) == 2:
            raise ValueError(
                "ES|QL SAMPLE: per-row randomness has no "
                "deterministic lake reading — name a doc-identity "
                "column with `SAMPLE p ON field` (the random_sampler "
                "'field' discipline, PARITY #35)"
            )
        if (len(stage) != 4 or stage[2].kind != "ident"
                or stage[2].val.upper() != "ON"
                or stage[3].kind != "ident"):
            if len(stage) == 3 and stage[2].kind == "num":
                raise ValueError(
                    "ES|QL SAMPLE: the tech-preview seed argument "
                    "was retired at GA — use `SAMPLE p ON field` "
                    "(PARITY #35)"
                )
            raise ValueError("ES|QL: SAMPLE <probability> ON <field>")
        from .sampling import hash_bucket

        key = F.concat(
            F.lit("0:"), F.col(stage[3].val).cast("string")
        )
        return df.filter(
            hash_bucket(key) < F.lit(int(round(p * 10_000)))
        )
    if head.kind == "kw" and head.val == "WHERE":
        p = _ExprParser(stage, 1)
        cond = p.parse()
        if p.peek() is not None:
            raise ValueError(f"ES|QL: trailing tokens at {p.peek()!r}")
        return df.filter(cond)
    if head.kind == "kw" and head.val == "EVAL":
        p = _ExprParser(stage, 1)
        # left-to-right binding: each assignment lands before the
        # next parses... parsing is name-agnostic (columns resolve
        # lazily), so chaining withColumn gives the ES|QL scoping
        pos = 1
        out = df
        while True:
            p = _ExprParser(stage, pos)
            name = p.expect("ident").val
            p.expect("op", "=")
            col = p._or()
            out = out.withColumn(name, col)
            if p.at("op", ","):
                pos = p.pos + 1
                continue
            if p.peek() is not None:
                raise ValueError(
                    f"ES|QL: trailing tokens at {p.peek()!r}"
                )
            return out
    if head.kind == "kw" and head.val == "STATS":
        return _stats(df, stage)
    if head.kind == "kw" and head.val == "SORT":
        p = _ExprParser(stage, 1)
        keys = []
        while True:
            c = p.parse()
            desc = False
            if p.at("kw", "ASC") or p.at("kw", "DESC"):
                desc = p.take().val == "DESC"
            nulls = None
            if p.at("kw", "NULLS"):
                p.take()
                t = p.take()
                if t.kind != "kw" or t.val not in ("FIRST", "LAST"):
                    raise ValueError("ES|QL: NULLS FIRST or NULLS LAST")
                nulls = t.val
            if desc:
                c = (c.desc_nulls_first() if nulls == "FIRST"
                     else c.desc_nulls_last() if nulls == "LAST"
                     else c.desc())
            else:
                c = (c.asc_nulls_first() if nulls == "FIRST"
                     else c.asc_nulls_last() if nulls == "LAST"
                     else c.asc())
            keys.append(c)
            if p.at("op", ","):
                p.take()
                continue
            if p.peek() is not None:
                raise ValueError(f"ES|QL: trailing tokens at {p.peek()!r}")
            break
        return df.orderBy(*keys)
    if head.kind == "kw" and head.val == "LIMIT":
        if len(stage) != 2 or stage[1].kind != "num":
            raise ValueError("ES|QL: LIMIT <n>")
        return df.limit(int(stage[1].val))
    if head.kind == "kw" and head.val in ("KEEP", "DROP"):
        # ES|QL KEEP/DROP accept * wildcards; patterns expand against
        # the frame's columns in pattern order (a pattern matching
        # nothing is fine, a PLAIN missing name errors like ES|QL)
        import fnmatch

        pats = _pattern_list(stage[1:])
        names: list[str] = []
        for p in pats:
            if "*" in p:
                names.extend(
                    c for c in df.columns
                    if fnmatch.fnmatchcase(c, p) and c not in names
                )
            else:
                if p not in df.columns:
                    raise ValueError(
                        f"ES|QL {head.val}: unknown column {p!r}"
                    )
                if p not in names:
                    names.append(p)
        if head.val == "KEEP":
            return df.select(*names)
        return df.drop(*names)
    if head.kind == "kw" and head.val == "RENAME":
        out = df
        i = 1
        while i < len(stage):
            if stage[i].kind != "ident":
                raise ValueError("ES|QL: RENAME old AS new")
            old = stage[i].val
            if not (i + 2 < len(stage) and stage[i + 1].kind == "kw"
                    and stage[i + 1].val == "AS"
                    and stage[i + 2].kind == "ident"):
                raise ValueError("ES|QL: RENAME old AS new")
            out = out.withColumnRenamed(old, stage[i + 2].val)
            i += 3
            if i < len(stage) and stage[i].kind == "op" and stage[i].val == ",":
                i += 1
        return out
    if head.kind == "ident" and head.val.upper() == "DISSECT":
        # DISSECT col "pattern": %{key} captures non-greedy up to the
        # next literal chunk (the trailing key captures to end),
        # %{} / %{?name} skip — the whole pattern compiles to ONE
        # anchored (?s) regex, leftmost-delimiter semantics exactly
        # like ES dissect; a non-matching row gets NULL fields
        # (ES|QL behavior). Modifiers +/->/*/& and APPEND_SEPARATOR
        # raise (multi-pass append logic, not modeled).
        if (len(stage) != 3 or stage[1].kind != "ident"
                or stage[2].kind != "str"):
            raise ValueError('ES|QL: DISSECT <column> "pattern"')
        col = F.col(stage[1].val)
        pat, keys = _dissect_regex(stage[2].val)
        matched = col.rlike(pat)
        # all captures in ONE select so every extract (and the match
        # guard) reads the ORIGINAL column even when a capture key
        # equals the source column name — overwriting the input is
        # legal ES|QL, and a chained withColumn would re-resolve the
        # source against the just-overwritten value
        return _select_with_captures(
            df,
            {key: F.when(matched, F.regexp_extract(col, pat, gi))
             for gi, key in keys},
        )
    if head.kind == "ident" and head.val.upper() == "GROK":
        # GROK col "pattern": %{PATTERN:name[:type]} captures through
        # the bundled core Logstash pattern set (_GROK_PATTERNS —
        # grok pattern files are public content); literal text
        # between holes is RAW regex, exactly grok's contract; the
        # match is UNANCHORED like grok (anchor with ^$ explicitly);
        # a non-matching row gets NULL fields; int/long/float/double
        # type suffixes try_cast. Patterns outside the bundled set
        # raise with the list (custom pattern definitions and
        # pattern_definitions maps are not modeled).
        if (len(stage) != 3 or stage[1].kind != "ident"
                or stage[2].kind != "str"):
            raise ValueError('ES|QL: GROK <column> "pattern"')
        col = F.col(stage[1].val)
        pat, keys = _grok_regex(stage[2].val)
        matched = col.rlike(pat)
        # one select, same reason as DISSECT: a capture key equal to
        # the source column must not poison later captures
        caps: dict[str, Column] = {}
        for gi, key, typ in keys:
            c = F.when(matched, F.regexp_extract(col, pat, gi))
            caps[key] = c.try_cast(typ) if typ else c
        return _select_with_captures(df, caps)
    if head.kind == "kw" and head.val == "MV_EXPAND":
        names = _name_list(stage[1:])
        if len(names) != 1:
            raise ValueError("ES|QL: MV_EXPAND <one column>")
        n = names[0]
        others = [c for c in df.columns if c != n]
        return df.select(*others, F.explode_outer(F.col(n)).alias(n))
    raise ValueError(f"ES|QL: unknown command {head.val!r}")


def _resolve_lookup_table(tables, name: str) -> DataFrame:
    if tables is None or isinstance(tables, DataFrame):
        raise ValueError(
            f"ES|QL: lookup index {name!r} needs the {{name: DataFrame}} "
            "tables form of esql()"
        )
    if name not in tables:
        raise ValueError(f"ES|QL: unknown lookup index {name!r}")
    return tables[name]


def _lookup_or_enrich(df: DataFrame, stage: list[_Tok], tables) -> DataFrame:
    """``LOOKUP JOIN idx ON key`` / ``ENRICH policy ON key [WITH
    [new =] field, ...]`` — both are BROADCAST left joins against a
    dimension-class table (ES constrains lookup indexes to
    ``index.mode=lookup`` single-shard and enrich indexes are
    policy-materialized — bounded by construction, so broadcast is
    the 100 TB plan: zero shuffle on the fact side).

    LOOKUP JOIN: multiple matches multiply rows (real join
    semantics); non-key lookup columns SHADOW same-named left
    columns (NULL where unmatched) — the ES field-precedence rule.
    ENRICH: ES applies ``max_matches=1`` — a policy table with
    duplicate match keys raises loudly instead of silently picking
    one (the validation is ONE bounded limit(1) collect over the
    dimension-sized table)."""
    up = stage[0].val.upper()
    if up == "LOOKUP":
        if not (len(stage) == 5 and stage[1].kind == "ident"
                and stage[1].val.upper() == "JOIN"
                and stage[2].kind == "ident"
                and stage[3].kind == "ident"
                and stage[3].val.upper() == "ON"
                and stage[4].kind == "ident"):
            raise ValueError("ES|QL: LOOKUP JOIN <index> ON <field>")
        lkp = _resolve_lookup_table(tables, stage[2].val)
        key = stage[4].val
        if key not in df.columns or key not in lkp.columns:
            raise ValueError(
                f"ES|QL LOOKUP JOIN: field {key!r} must exist on both "
                "sides (RENAME/EVAL the left key first)"
            )
        shadowed = [c for c in df.columns
                    if c != key and c in lkp.columns]
        return df.drop(*shadowed).join(
            F.broadcast(lkp), on=key, how="left"
        )
    # ENRICH policy ON key [WITH [new =] field, ...]
    if len(stage) < 4 or stage[1].kind != "ident":
        raise ValueError(
            "ES|QL: ENRICH <policy> ON <field> [WITH fields] — the "
            "bare form needs the policy's match_field, which lives "
            "server-side; name it with ON"
        )
    lkp = _resolve_lookup_table(tables, stage[1].val)
    i = 2
    if not (stage[i].kind == "ident" and stage[i].val.upper() == "ON"
            and i + 1 < len(stage) and stage[i + 1].kind == "ident"):
        raise ValueError("ES|QL: ENRICH <policy> ON <field> [WITH ...]")
    key = stage[i + 1].val
    i += 2
    picks: list[tuple[str, str]] = []  # (out name, lookup column)
    if i < len(stage):
        if not (stage[i].kind == "ident" and stage[i].val.upper() == "WITH"):
            raise ValueError("ES|QL ENRICH: expected WITH")
        i += 1
        while i < len(stage):
            if stage[i].kind != "ident":
                raise ValueError(
                    f"ES|QL ENRICH WITH: expected field, got {stage[i]!r}"
                )
            if (i + 2 < len(stage) and stage[i + 1].kind == "op"
                    and stage[i + 1].val == "="
                    and stage[i + 2].kind == "ident"):
                picks.append((stage[i].val, stage[i + 2].val))
                i += 3
            else:
                picks.append((stage[i].val, stage[i].val))
                i += 1
            if i < len(stage) and stage[i].kind == "op" and stage[i].val == ",":
                i += 1
    else:
        picks = [(c, c) for c in lkp.columns if c != key]
    if key not in df.columns or key not in lkp.columns:
        raise ValueError(
            f"ES|QL ENRICH: match field {key!r} must exist on both "
            "sides (RENAME/EVAL the left key first)"
        )
    for out, src in picks:
        if src not in lkp.columns:
            raise ValueError(f"ES|QL ENRICH: {src!r} not in the policy table")
        if out == key:
            raise ValueError(
                f"ES|QL ENRICH: output name {out!r} collides with the "
                "match field"
            )
    if len({out for out, _ in picks}) != len(picks):
        raise ValueError("ES|QL ENRICH: duplicate WITH output name")
    # max_matches=1: duplicate match keys in the policy table are a
    # request error, not a silent pick — ONE limit(1) collect over
    # the dimension-sized policy table (bounded: ≤1 row returned)
    dup = (lkp.groupBy(key).count().filter(F.col("count") > 1)
           .limit(1).collect())
    if dup:
        raise ValueError(
            f"ES|QL ENRICH: policy table has duplicate match key "
            f"{dup[0][0]!r} (ES enrich is max_matches=1)"
        )
    proj = lkp.select(key, *[F.col(src).alias(out) for out, src in picks])
    shadowed = [c for c in df.columns
                if c != key and c in [out for out, _ in picks]]
    return df.drop(*shadowed).join(F.broadcast(proj), on=key, how="left")


def _select_with_captures(df: DataFrame, caps: dict[str, Column]) -> DataFrame:
    """Apply DISSECT/GROK captures in ONE projection: replaced
    columns keep their position, new captures append in pattern
    order — the withColumn contract, without withColumn's
    re-resolution hazard when a capture overwrites its own source."""
    replaced = dict(caps)
    exprs = [
        replaced.pop(c).alias(c) if c in replaced else F.col(c)
        for c in df.columns
    ]
    exprs.extend(e.alias(k) for k, e in replaced.items())
    return df.select(*exprs)


def _dissect_regex(pattern: str) -> tuple[str, list[tuple[int, str]]]:
    """ES dissect pattern → (anchored regex, [(group index, key)]).
    Literal chunks escape verbatim; every placeholder becomes a
    group — non-greedy except the last, so each key captures up to
    the LEFTMOST occurrence of the following literal (dissect's
    delimiter rule). ``%{}`` and ``%{?name}`` are skips (grouped but
    not emitted); other modifiers raise."""
    parts = re.split(r"(%\{[^}]*\})", pattern)
    regex: list[str] = ["(?s)^"]
    keys: list[tuple[int, str]] = []
    gi = 0
    holes = [i for i, p in enumerate(parts)
             if p.startswith("%{") and p.endswith("}")]
    if not holes:
        raise ValueError("ES|QL DISSECT: pattern has no %{key} holes")
    last_hole = holes[-1]
    for i, p in enumerate(parts):
        if not p:
            continue
        if p.startswith("%{") and p.endswith("}"):
            name = p[2:-1]
            if name.startswith("?"):
                name = ""  # named skip
            if any(m in name for m in ("+", "->", "*", "&", "/")):
                raise ValueError(
                    f"ES|QL DISSECT modifier in {p!r}: append/pad/"
                    "reference modifiers are not modeled"
                )
            gi += 1
            regex.append("(.*)" if i == last_hole else "(.*?)")
            if name:
                keys.append((gi, name))
        else:
            regex.append(re.escape(p))
    regex.append("$")
    if not keys:
        raise ValueError("ES|QL DISSECT: every hole is a skip")
    return "".join(regex), keys


def _grok_regex(pattern: str) -> tuple[str, list[tuple[int, str, str | None]]]:
    """Grok pattern → (java regex, [(group index, key, cast type)]).
    ``%{PATTERN}`` matches without capturing, ``%{PATTERN:name}``
    captures, ``%{PATTERN:name:int}`` casts; inter-hole text is raw
    regex (grok's contract — escape regex metachars yourself)."""
    parts = re.split(r"(%\{[^}]*\})", pattern)
    regex: list[str] = []
    keys: list[tuple[int, str, str | None]] = []
    gi = 0
    for p in parts:
        if not p:
            continue
        if p.startswith("%{") and p.endswith("}"):
            bits = p[2:-1].split(":")
            pname = bits[0]
            body = _GROK_PATTERNS.get(pname)
            if body is None:
                raise ValueError(
                    f"ES|QL GROK pattern {pname!r}: the bundled set is "
                    f"{sorted(_GROK_PATTERNS)} (custom pattern "
                    "definitions are not modeled)"
                )
            if len(bits) == 1:
                regex.append(f"(?:{body})")
                continue
            if len(bits) > 3:
                raise ValueError(f"ES|QL GROK hole {p!r}")
            typ = None
            if len(bits) == 3:
                typ = _GROK_TYPES.get(bits[2])
                if typ is None:
                    raise ValueError(
                        f"ES|QL GROK type {bits[2]!r}: one of "
                        f"{sorted(_GROK_TYPES)}"
                    )
            gi += 1
            regex.append(f"({body})")
            keys.append((gi, bits[1], typ))
        else:
            # a bare capturing group in the literal text would shift
            # every hole's group index and silently mis-assign
            # captures — require (?:...) (round-15 self-review)
            if re.search(r"(?<!\\)\((?!\?)", p):
                raise ValueError(
                    f"ES|QL GROK: literal text {p!r} contains a "
                    "capturing group — use (?:...) so hole captures "
                    "keep their indices"
                )
            regex.append(p)
    if not keys:
        raise ValueError("ES|QL GROK: no named captures in pattern")
    return "".join(regex), keys


def _pattern_list(toks: list[_Tok]) -> list[str]:
    """Comma-separated column names where each item may mix idents
    and ``*`` wildcards (``tmp*``, ``*_id``) — the tokenizer splits
    them, this glues them back into patterns. Only TEXTUALLY
    ADJACENT tokens glue (source spans): ``KEEP a b`` is a missing
    comma and errors like ES|QL's parser, never the pattern ``ab``."""
    pats: list[str] = []
    cur: list[str] = []
    prev_end = -1

    def _extend(piece: str, t: _Tok):
        nonlocal prev_end
        if cur and t.start != prev_end:
            raise ValueError(
                "ES|QL: missing comma between names "
                f"(before {t.val!r})"
            )
        cur.append(piece)
        prev_end = t.end

    for t in toks:
        if t.kind == "op" and t.val == ",":
            if not cur:
                raise ValueError("ES|QL: empty name in list")
            pats.append("".join(cur))
            cur = []
        elif t.kind == "ident":
            _extend(t.val, t)
        elif t.kind == "op" and t.val == "*":
            _extend("*", t)
        else:
            raise ValueError(f"ES|QL: expected column name, got {t!r}")
    if not cur:
        raise ValueError("ES|QL: empty name in list")
    pats.append("".join(cur))
    return pats


def _name_list(toks: list[_Tok]) -> list[str]:
    names = []
    i = 0
    while i < len(toks):
        if toks[i].kind != "ident":
            raise ValueError(f"ES|QL: expected column name, got {toks[i]!r}")
        names.append(toks[i].val)
        i += 1
        if i < len(toks):
            if toks[i].kind == "op" and toks[i].val == ",":
                i += 1
            else:
                raise ValueError(f"ES|QL: expected ',', got {toks[i]!r}")
    return names


def _stats(df: DataFrame, stage: list[_Tok]) -> DataFrame:
    # split the stage at a top-level BY
    depth = 0
    by_at = None
    for i, t in enumerate(stage):
        if t.kind == "op" and t.val == "(":
            depth += 1
        elif t.kind == "op" and t.val == ")":
            depth -= 1
        elif depth == 0 and t.kind == "kw" and t.val == "BY":
            by_at = i
            break
    agg_toks = stage[1:by_at] if by_at is not None else stage[1:]
    by_toks = stage[by_at + 1:] if by_at is not None else []

    def _named_exprs(toks: list[_Tok], allow_aggs: bool):
        out: list[tuple[str | None, Column]] = []
        pos = 0
        while pos < len(toks):
            name = None
            if (pos + 1 < len(toks) and toks[pos].kind == "ident"
                    and toks[pos + 1].kind == "op"
                    and toks[pos + 1].val == "="):
                name = toks[pos].val
                pos += 2
            start = pos
            p = _ExprParser(toks, pos, allow_aggs=allow_aggs)
            col = p._or()
            pos = p.pos
            if (allow_aggs and pos < len(toks)
                    and toks[pos].kind == "kw"
                    and toks[pos].val == "WHERE"):
                # `agg WHERE cond` (ES|QL 8.13): parse the condition,
                # then RE-parse the aggregate expression with the
                # filter bound so every aggregate input masks
                cp = _ExprParser(toks, pos + 1, allow_aggs=False)
                cond = cp._or()
                p2 = _ExprParser(toks, start, allow_aggs=True,
                                 agg_filter=cond)
                col = p2._or()
                pos = cp.pos
            if name is None:
                # default name: the expression's source text is not
                # kept — require explicit names for hash-stable
                # output (ES|QL's auto-names quote the source text)
                raise ValueError(
                    "ES|QL STATS/BY: name each expression "
                    "(`name = expr`) — auto-named columns are not "
                    "modeled"
                )
            out.append((name, col))
            if pos < len(toks):
                if toks[pos].kind == "op" and toks[pos].val == ",":
                    pos += 1
                else:
                    raise ValueError(
                        f"ES|QL: expected ',', got {toks[pos]!r}"
                    )
        return out

    aggs = _named_exprs(agg_toks, allow_aggs=True)
    if not aggs:
        raise ValueError("ES|QL: STATS needs at least one aggregate")
    keys = _named_exprs(by_toks, allow_aggs=False) if by_toks else []
    names = [n for n, _ in aggs] + [n for n, _ in keys]
    dupes = sorted({n for n in names if names.count(n) > 1})
    if dupes:
        # a BY key named like an aggregate (or any repeat) would
        # silently emit duplicate columns after the temp rename
        raise ValueError(
            f"ES|QL STATS: duplicate output name {dupes[0]!r}"
        )
    agg_cols = [c.alias(n) for n, c in aggs]
    if keys:
        # key expressions evaluate under TEMP names over the ORIGINAL
        # frame, so a BY alias that shadows an input column (BY value
        # = FLOOR(value / 100)) cannot change what the aggregates
        # read — the aggregates and the keys both see the input row,
        # exactly ES|QL's evaluation order; the temps rename to the
        # requested key names after the groupBy
        temps = [f"__by{i}" for i in range(len(keys))]
        keyed = df.select(
            *[c.alias(t) for t, (_, c) in zip(temps, keys)],
            *df.columns,
        )
        out = keyed.groupBy(*temps).agg(*agg_cols)
        for t, (n, _) in zip(temps, keys):
            out = out.withColumnRenamed(t, n)
        return out
    return df.agg(*agg_cols)


def q_esql_events_rollup(spark, sf_dir: str) -> DataFrame:
    """Oracle row (round 15): a saved ES|QL dashboard query replayed
    on the lake — WHERE / left-to-right EVAL / STATS..BY with the
    exact-decimal AVG and an exact COUNT_DISTINCT / SORT / LIMIT.
    SUM goes through an integer expression (FLOOR cents) so both
    engines add exactly."""
    from .tables import load

    return esql(
        {"events": load(spark, sf_dir, "events")},
        """
        FROM events
        | WHERE value IS NOT NULL AND event_type IN ("click", "view", "error")
        | EVAL day = DATE_TRUNC(1 day, ts),
               band = FLOOR(value / 100),
               cents = TO_LONG(FLOOR(value * 100))
        | STATS n = COUNT(*), total_cents = SUM(cents),
                avg_v = AVG(value), users = COUNT_DISTINCT(user_id)
            BY day = day, band = band
        | SORT day, band
        | LIMIT 200
        """,
    )


def q_esql_docs_tokens(spark, sf_dir: str) -> DataFrame:
    """Oracle row (round 15): the text-pipeline shape — SPLIT +
    MV_EXPAND re-bases rows onto tokens, LIKE filters by wildcard,
    STATS counts per token with an explicit deterministic SORT."""
    from .tables import load

    return esql(
        {"documents": load(spark, sf_dir, "documents")},
        """
        FROM documents
        | EVAL toks = SPLIT(text, " ")
        | MV_EXPAND toks
        | WHERE toks LIKE "s*" AND LENGTH(toks) >= 4
        | STATS n = COUNT(*) BY tok = toks
        | SORT n DESC, tok ASC
        | LIMIT 15
        """,
    )


def q_esql_lookup_enrich(spark, sf_dir: str) -> DataFrame:
    """Oracle row (round 16): LOOKUP JOIN + ENRICH — the lake
    reading of ES 8.18 lookup joins and materialized enrich
    policies. Customer facts pick up the nation dimension via a
    broadcast LOOKUP JOIN (key renamed to match, ES|QL's own
    recipe), then the region name via an ENRICH policy with a WITH
    rename; exact-integer SUM keeps the rollup hash-stable."""
    from .tables import load

    return esql(
        {
            "customer": load(spark, sf_dir, "customer"),
            "nation": load(spark, sf_dir, "nation"),
            "region": load(spark, sf_dir, "region"),
        },
        """
        FROM customer
        | EVAL cents = TO_LONG(FLOOR(c_acctbal * 100))
        | RENAME c_nationkey AS n_nationkey
        | LOOKUP JOIN nation ON n_nationkey
        | EVAL r_regionkey = n_regionkey
        | ENRICH region ON r_regionkey WITH region_name = r_name
        | STATS n = COUNT(*), acct_cents = SUM(cents)
            BY nation = n_name, region = region_name
        | SORT nation
        """,
    )


def q_esql_sample(spark, sf_dir: str) -> DataFrame:
    """Oracle row (round 17, VERDICT r16 Next #6): the ES 9.x
    ``SAMPLE`` command under the engine's deterministic reading —
    a 25% portable-hash sample keyed on event_id (``SAMPLE 0.25 ON
    event_id``, the random_sampler 'field' discipline, PARITY #35)
    feeding a STATS rollup; the oracle spells the identical md5
    bucket."""
    from .tables import load

    return esql(
        {"events": load(spark, sf_dir, "events")},
        """
        FROM events
        | WHERE event_type IS NOT NULL AND value IS NOT NULL
        | SAMPLE 0.25 ON event_id
        | EVAL cents = TO_LONG(FLOOR(value * 100))
        | STATS n = COUNT(*), total_cents = SUM(cents)
            BY etype = event_type
        | SORT etype
        | LIMIT 50
        """,
    )


def q_esql_values_top(spark, sf_dir: str) -> DataFrame:
    """Oracle row (round 16): the multi-value aggregates — VALUES
    (sorted distinct set, joined to a string for the cross-engine
    hash) and TOP (n extremes) composed with MV_SUM into a top-3
    sum, per user."""
    from .tables import load

    return esql(
        {"events": load(spark, sf_dir, "events")},
        """
        FROM events
        | WHERE event_type IS NOT NULL AND value IS NOT NULL
        | EVAL cents = TO_LONG(FLOOR(value * 100))
        | STATS kinds = MV_CONCAT(VALUES(event_type), "|"),
                top3_cents = MV_SUM(TOP(cents, 3, "desc")),
                n = COUNT(*)
            BY user = user_id
        | SORT user
        | LIMIT 100
        """,
    )
