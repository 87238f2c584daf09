"""ES|QL compiler semantics (round 15): command coverage, the
expression grammar's precedence and NULL behavior, left-to-right
EVAL binding, STATS discipline (exact-decimal AVG, exact
COUNT_DISTINCT), the loud out-of-scope raises, and a randomized
WHERE pin against a pure-Python evaluator."""

import datetime as dt

import pytest
from pyspark.sql import functions as F  # noqa: F401 — fixtures

from dump_es_parquet_spark.operators.esql import esql


@pytest.fixture(scope="module")
def tables(spark):
    ev = spark.createDataFrame(
        [(1, "click", 10.0, dt.datetime(2024, 1, 1, 5), "10.0.0.5",
          ["a", "b"]),
         (2, "view", 25.0, dt.datetime(2024, 1, 1, 9), "10.0.1.9",
          ["a"]),
         (3, "click", None, dt.datetime(2024, 1, 2, 7), "192.168.0.1",
          None),
         (4, "error", 99.5, dt.datetime(2024, 1, 2, 8), None, ["c"])],
        "id int, etype string, value double, ts timestamp, ip string, "
        "tags array<string>")
    return {"events": ev}


def test_esql_commands(tables):
    r = esql(tables, 'FROM events | WHERE etype == "click" AND '
                     'value >= 5 | KEEP id, value | SORT id').collect()
    assert [(x.id, x.value) for x in r] == [(1, 10.0)]

    r = esql(tables, '''FROM events
        | EVAL day = DATE_TRUNC(1 day, ts),
               v2 = COALESCE(value, 0.0) * 2
        | STATS n = COUNT(*), total = SUM(v2), avg_v = AVG(value)
            BY day = day
        | SORT day''').collect()
    assert [x.n for x in r] == [2, 2]
    assert abs(r[0].total - 70.0) < 1e-9
    assert abs(r[0].avg_v - 17.5) < 1e-9  # NULL value skipped

    # EVAL binds left-to-right: the second assignment sees the first
    r = esql(tables, 'FROM events | EVAL a = id * 10, b = a + id '
                     '| WHERE id == 2 | KEEP b').collect()
    assert r[0].b == 22

    r = esql(tables, 'FROM events | MV_EXPAND tags '
                     '| WHERE tags IS NOT NULL '
                     '| STATS n = COUNT(*) BY t = tags | SORT t').collect()
    assert [(x.t, x.n) for x in r] == [("a", 2), ("b", 1), ("c", 1)]

    r = esql(tables, 'FROM events | RENAME etype AS kind '
                     '| WHERE kind IN ("view", "error") | SORT id '
                     '| KEEP id, kind').collect()
    assert [(x.id, x.kind) for x in r] == [(2, "view"), (4, "error")]

    r = esql(tables, 'ROW x = 5, msg = "hi" | EVAL y = x * 2').collect()
    assert (r[0].x, r[0].msg, r[0].y) == (5, "hi", 10)

    r = esql(tables, 'FROM events | DROP tags, ip | LIMIT 1')
    assert "tags" not in r.columns and "ip" not in r.columns

    # SORT with NULLS FIRST/LAST and DESC
    r = esql(tables, 'FROM events | SORT value DESC NULLS LAST '
                     '| KEEP id').collect()
    assert [x.id for x in r] == [4, 2, 1, 3]
    r = esql(tables, 'FROM events | SORT value ASC NULLS FIRST '
                     '| KEEP id').collect()
    assert [x.id for x in r] == [3, 1, 2, 4]


def test_esql_expressions(tables):
    def ids(where):
        r = esql(tables, f"FROM events | WHERE {where} | SORT id "
                         "| KEEP id").collect()
        return [x.id for x in r]

    # precedence: AND binds tighter than OR; NOT tighter than AND
    assert ids('etype == "view" OR etype == "click" AND value >= 5') \
        == [1, 2]
    assert ids('NOT etype == "click" AND value > 20') == [2, 4]
    # arithmetic precedence and unary minus
    assert ids('value * 2 - 1 > 48 AND value < 100') == [2, 4]
    assert ids('-value < -90') == [4]
    # LIKE wildcards are * and ?; RLIKE anchors both ends
    assert ids('etype LIKE "c*"') == [1, 3]
    assert ids('etype LIKE "v?ew"') == [2]
    assert ids('etype RLIKE "cl.ck|err.r"') == [1, 3, 4]
    # IS NULL / IS NOT NULL; three-valued drop
    assert ids('value IS NULL') == [3]
    assert ids('value != 10') == [2, 4]  # NULL verdict drops row 3
    # functions
    assert ids('STARTS_WITH(TO_UPPER(etype), "CL")') == [1, 3]
    assert ids('LENGTH(SUBSTRING(etype, 1, 2)) == 2') == [1, 2, 3, 4]
    assert ids('CIDR_MATCH(ip, "10.0.0.0/16")') == [1, 2]
    # CASE: row 2 (25.0) takes the FALSE branch; rows 1/3 fall to the
    # default (row 3's NULL conditions skip like Spark CASE WHEN)
    assert ids('CASE(value >= 50, TRUE, value >= 20, FALSE, TRUE)') \
        == [1, 3, 4]


def test_esql_case_null_default(tables):
    # pin the CASE+NULL reading explicitly: NULL conditions fall
    # through to the default (Spark's CASE WHEN, same as ES|QL)
    r = esql(tables, 'FROM events | EVAL c = CASE(value >= 50, 1, 2) '
                     '| SORT id | KEEP id, c').collect()
    assert [(x.id, x.c) for x in r] == [(1, 2), (2, 2), (3, 2), (4, 1)]


def test_esql_raises(tables):
    for bad, msg in [
        ('FROM events | ENRICH policy', "ENRICH"),
        ('FROM events | EVAL t = NOW()', "deterministic"),
        ('FROM events METADATA _id', "METADATA"),
        ('FROM nope', "unknown index"),
        ('FROM events | STATS COUNT(*)', "name each"),
        ('FROM events | WHERE SUM(value) > 1', "outside STATS"),
        ('FROM events | LIMIT x', "LIMIT"),
        ('WHERE id == 1', "must start with FROM"),
        ('FROM events | NOPECMD x', "unknown"),
        ('FROM events | STATS n = COUNT(*) BY n = etype',
         "duplicate output name"),
    ]:
        with pytest.raises(ValueError, match="") as ei:
            esql(tables, bad)
        assert msg.lower() in str(ei.value).lower(), (bad, ei.value)


def test_esql_where_randomized_vs_python(spark):
    """Property pin: randomized WHERE expressions over int columns
    agree with a pure-Python three-valued evaluator."""
    import random

    rng = random.Random(15150)
    rows = [
        (i,
         rng.choice([None, rng.randrange(-5, 6)]),
         rng.choice([None, rng.randrange(-5, 6)]))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "id int, a int, b int")
    tables = {"t": df}

    def py_eval(a, b, expr):
        # three-valued mini-evaluator for the generated shapes
        def cmp(x, op, y):
            if x is None or y is None:
                return None
            return {"<": x < y, ">": x > y, "==": x == y,
                    "!=": x != y}[op]

        def conj(x, y):
            if x is False or y is False:
                return False
            if x is None or y is None:
                return None
            return x and y

        def disj(x, y):
            if x is True or y is True:
                return True
            if x is None or y is None:
                return None
            return x or y

        kind, parts = expr
        if kind == "cmp":
            lhs, op, lit = parts
            return cmp(a if lhs == "a" else b, op, lit)
        if kind == "and":
            return conj(py_eval(a, b, parts[0]), py_eval(a, b, parts[1]))
        if kind == "or":
            return disj(py_eval(a, b, parts[0]), py_eval(a, b, parts[1]))
        if kind == "not":
            v = py_eval(a, b, parts[0])
            return None if v is None else not v
        raise AssertionError(kind)

    def gen(depth):
        if depth == 0 or rng.random() < 0.4:
            lhs = rng.choice(["a", "b"])
            op = rng.choice(["<", ">", "==", "!="])
            lit = rng.randrange(-5, 6)
            return ("cmp", (lhs, op, lit)), f"{lhs} {op} {lit}"
        k = rng.choice(["and", "or", "not"])
        e1, s1 = gen(depth - 1)
        if k == "not":
            return ("not", (e1,)), f"NOT ({s1})"
        e2, s2 = gen(depth - 1)
        return (k, (e1, e2)), f"({s1}) {k.upper()} ({s2})"

    for _ in range(25):
        expr, text = gen(3)
        got = sorted(
            r.id for r in esql(
                tables, f"FROM t | WHERE {text} | KEEP id"
            ).collect()
        )
        want = sorted(
            i for i, a, b in rows if py_eval(a, b, expr) is True
        )
        assert got == want, text


def test_esql_bucket_and_dissect(spark, tables):
    """Round 15: BUCKET (calendar truncation / numeric band starts)
    and DISSECT (delimiter extraction as one anchored regex,
    non-matching rows NULL, modifiers raise)."""
    r = esql(tables, '''FROM events
        | STATS n = COUNT(*) BY d = BUCKET(ts, 1 day),
                                b = BUCKET(COALESCE(value, 0.0), 50)
        | SORT d, b''').collect()
    assert [(str(x.d)[:10], x.b, x.n) for x in r] == [
        ("2024-01-01", 0.0, 2), ("2024-01-02", 0.0, 1),
        ("2024-01-02", 50.0, 1)]
    with pytest.raises(ValueError, match="adaptive"):
        esql(tables, 'FROM events | STATS n = COUNT(*) '
                     'BY b = BUCKET(value, 10, 0, 100)')

    logs = spark.createDataFrame(
        [(1, "10.0.0.1 [2024-01-01] GET /idx 200"),
         (2, "malformed line"),
         (3, "10.9.9.9 [2024-02-02] PUT /x 503")],
        "id int, line string")
    r = esql({"logs": logs},
             'FROM logs | DISSECT line '
             '"%{ip} [%{day}] %{?verb} %{path} %{status}" '
             '| SORT id | KEEP id, ip, day, path, status').collect()
    assert [(x.id, x.ip, x.day, x.path, x.status) for x in r] == [
        (1, "10.0.0.1", "2024-01-01", "/idx", "200"),
        (2, None, None, None, None),
        (3, "10.9.9.9", "2024-02-02", "/x", "503")]
    # %{?name} is a named skip: grouped for matching, never emitted
    assert "rest" not in esql(
        {"logs": logs},
        'FROM logs | DISSECT line "%{ip} %{?rest}" | LIMIT 1'
    ).columns
    with pytest.raises(ValueError, match="modifier"):
        esql({"logs": logs}, 'FROM logs | DISSECT line "%{+a} %{b}"')
    # GROK: the bundled core pattern set, typed captures, unanchored
    glogs = spark.createDataFrame(
        [(1, "10.0.0.1 [2024-01-01T10:00:00] GET /idx 200 0.25"),
         (2, "malformed line"),
         (3, "10.9.9.9 [2024-02-02T11:30:00] PUT /x 503 1.5")],
        "id int, line string")
    r = esql({"logs": glogs},
             'FROM logs | GROK line '
             '"%{IP:ip} \\[%{TIMESTAMP_ISO8601:t}\\] '
             '%{WORD} %{NOTSPACE:path} %{NUMBER:status:int} '
             '%{NUMBER:dur:float}" '
             '| SORT id | KEEP id, ip, path, status, dur').collect()
    assert [(x.id, x.ip, x.path, x.status, x.dur) for x in r] == [
        (1, "10.0.0.1", "/idx", 200, 0.25),
        (2, None, None, None, None),
        (3, "10.9.9.9", "/x", 503, 1.5)]
    with pytest.raises(ValueError, match="bundled set"):
        esql({"logs": logs}, 'FROM logs | GROK line "%{NOPE:a}"')
    with pytest.raises(ValueError, match="no named"):
        esql({"logs": logs}, 'FROM logs | GROK line "%{WORD}"')
    with pytest.raises(ValueError, match="capturing group"):
        esql({"logs": logs}, 'FROM logs | GROK line "(x) %{WORD:a}"')


def test_esql_stats_where(tables):
    """ES|QL 8.13 per-aggregate WHERE: each aggregate masks its own
    rows; siblings with different conditions coexist in one STATS."""
    r = esql(tables, '''FROM events
        | STATS clicks = COUNT(*) WHERE etype == "click",
                big = SUM(value) WHERE value > 20,
                all_n = COUNT(*),
                avg_click = AVG(value) WHERE etype == "click"
            BY d = BUCKET(ts, 1 day)
        | SORT d''').collect()
    assert [(str(x.d)[:10], x.clicks, x.big, x.all_n, x.avg_click)
            for x in r] == [
        ("2024-01-01", 1, 25.0, 2, 10.0),
        ("2024-01-02", 1, 99.5, 2, None)]


def test_esql_sql_surface(spark, sf_dir):
    """The one-shot esql_query face resolves FROM names to the lake
    tables and agrees with the equivalent spark.sql plan."""
    from dump_es_parquet_spark.sql_surface import esql_query, sql

    a = esql_query(
        spark, sf_dir,
        "FROM events | WHERE value >= 100 "
        "| STATS n = COUNT(*) BY t = event_type | SORT t",
    ).collect()
    b = sql(
        spark, sf_dir,
        "SELECT event_type AS t, count(*) AS n FROM events "
        "WHERE value >= 100 GROUP BY 1 ORDER BY 1",
    ).collect()
    assert [(r.t, r.n) for r in a] == [(r.t, r.n) for r in b]


def test_esql_by_alias_shadowing_input_column(tables):
    """A BY alias that shadows an input column must not change what
    the aggregates read — keys and aggregates both evaluate over the
    input row (ES|QL's evaluation order; keys compute under temp
    names internally)."""
    r = esql(tables, '''FROM events
        | STATS total = SUM(value), n = COUNT(value)
            BY value = FLOOR(COALESCE(value, 0.0) / 50)
        | SORT value''').collect()
    # bands: floor(v/50) -> 10->0, 25->0, NULL->0, 99.5->1
    assert [(x.value, x.total, x.n) for x in r] == [
        (0, 35.0, 2), (1, 99.5, 1)]


def test_esql_keep_drop_wildcards(tables):
    """KEEP/DROP accept * wildcards, expanding in pattern order; a
    plain missing name errors, a pattern matching nothing is fine."""
    r = esql(tables, 'FROM events | EVAL tmp_a = 1, tmp_b = 2 '
                     '| KEEP id, tmp* | LIMIT 1')
    assert r.columns == ["id", "tmp_a", "tmp_b"]
    r = esql(tables, 'FROM events | DROP t*, value | LIMIT 1')
    assert r.columns == ["id", "etype", "ip"]
    r = esql(tables, 'FROM events | KEEP id, nope* | LIMIT 1')
    assert r.columns == ["id"]
    with pytest.raises(ValueError, match="unknown column"):
        esql(tables, 'FROM events | KEEP id, nope')


def test_esql_capture_overwriting_source_column(spark):
    """Round 16 (ADVICE): a GROK/DISSECT capture key may legally
    equal the SOURCE column — every later capture (and the match
    guard) must still read the original value, not the overwritten
    one. All captures land in one projection."""
    logs = spark.createDataFrame(
        [(1, "alpha 42"), (2, "beta 7")], "id int, line string")
    r = esql({"logs": logs},
             'FROM logs | GROK line "%{WORD:line} %{NUMBER:n:int}" '
             '| SORT id').collect()
    assert [(x.line, x.n) for x in r] == [("alpha", 42), ("beta", 7)]
    r = esql({"logs": logs},
             'FROM logs | DISSECT line "%{line} %{rest}" '
             '| SORT id').collect()
    assert [(x.line, x.rest) for x in r] == [
        ("alpha", "42"), ("beta", "7")]
    # replaced column keeps its position; new captures append
    assert esql({"logs": logs},
                'FROM logs | DISSECT line "%{line} %{rest}" | LIMIT 1'
                ).columns == ["id", "line", "rest"]


def test_esql_keep_missing_comma_errors(tables):
    """Round 16 (ADVICE): non-adjacent idents in KEEP/DROP are a
    missing comma — never silently glued into one pattern (`KEEP a
    b` must not select a column named `ab`)."""
    with pytest.raises(ValueError, match="missing comma"):
        esql(tables, 'FROM events | EVAL idetype = 1 | KEEP id etype')
    with pytest.raises(ValueError, match="missing comma"):
        esql(tables, 'FROM events | DROP id etype')
    # adjacent tokens still glue: tmp* is one pattern
    r = esql(tables, 'FROM events | EVAL tmp_a = 1 | KEEP id, tmp* '
                     '| LIMIT 1')
    assert r.columns == ["id", "tmp_a"]


def test_esql_lookup_join(spark, tables):
    """Round 16: LOOKUP JOIN — broadcast left join against a lookup
    index from the same tables dict; multiple matches multiply rows;
    non-key lookup columns shadow same-named left columns (NULL
    where unmatched); a key missing on either side raises."""
    lkp = spark.createDataFrame(
        [("click", "ui", 1), ("view", "read", 2), ("view", "scan", 3)],
        "etype string, kind string, pri int")
    t = dict(tables, lookups=lkp)
    r = esql(t, 'FROM events | LOOKUP JOIN lookups ON etype '
                '| SORT id, pri | KEEP id, etype, kind, pri').collect()
    # id=2 (view) matches TWO lookup rows; error matches none
    assert [(x.id, x.kind, x.pri) for x in r] == [
        (1, "ui", 1), (2, "read", 2), (2, "scan", 3),
        (3, "ui", 1), (4, None, None)]
    # shadowing: a lookup column named like a LEFT column replaces it
    lk2 = spark.createDataFrame(
        [("click", 999.0)], "etype string, value double")
    r = esql(dict(tables, lk=lk2),
             'FROM events | LOOKUP JOIN lk ON etype | SORT id '
             '| KEEP id, value').collect()
    assert [(x.id, x.value) for x in r] == [
        (1, 999.0), (2, None), (3, 999.0), (4, None)]
    with pytest.raises(ValueError, match="both"):
        esql(t, 'FROM events | LOOKUP JOIN lookups ON nope')
    with pytest.raises(ValueError, match="unknown lookup"):
        esql(t, 'FROM events | LOOKUP JOIN missing ON etype')
    # the join is a BROADCAST hash join — no shuffle on the fact side
    plan = esql(t, 'FROM events | LOOKUP JOIN lookups ON etype') \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_esql_enrich(spark, tables):
    """Round 16: ENRICH — the materialized-policy broadcast join;
    WITH picks/renames enrich fields; duplicate match keys raise
    (ES enrich is max_matches=1); bare ENRICH (no ON) raises since
    the policy's match_field lives server-side."""
    pol = spark.createDataFrame(
        [("click", "Clicks", 1.5), ("view", "Views", 2.5)],
        "etype string, label string, weight double")
    t = dict(tables, policy=pol)
    r = esql(t, 'FROM events | ENRICH policy ON etype '
                'WITH name = label | SORT id | KEEP id, name').collect()
    assert [(x.id, x.name) for x in r] == [
        (1, "Clicks"), (2, "Views"), (3, "Clicks"), (4, None)]
    # bare WITH-less form adds every non-key policy column
    r = esql(t, 'FROM events | ENRICH policy ON etype | SORT id '
                '| KEEP id, label, weight').collect()
    assert [(x.id, x.label, x.weight) for x in r] == [
        (1, "Clicks", 1.5), (2, "Views", 2.5), (3, "Clicks", 1.5),
        (4, None, None)]
    dup = spark.createDataFrame(
        [("click", "a"), ("click", "b")], "etype string, label string")
    with pytest.raises(ValueError, match="max_matches"):
        esql(dict(tables, p=dup),
             'FROM events | ENRICH p ON etype WITH label').collect()
    with pytest.raises(ValueError, match="ON"):
        esql(t, 'FROM events | ENRICH policy')
    with pytest.raises(ValueError, match="not in the policy"):
        esql(t, 'FROM events | ENRICH policy ON etype WITH nope')


def test_esql_function_table_round16(spark):
    """Round 16: the widened function table — string/math/date/mv
    helpers and IP_PREFIX through the octet tree."""
    df = spark.createDataFrame(
        [(1, "hello world", "10.0.3.200",
          dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 11),
          [3.0, None, 1.0]),
         (2, "abc", "garbage",
          dt.datetime(2024, 1, 1), dt.datetime(2024, 3, 1), []),
         ],
        "id int, s string, ip string, t0 timestamp, t1 timestamp, "
        "xs array<double>")
    r = esql({"t": df}, '''FROM t
        | EVAL l = LEFT(s, 3), r = RIGHT(s, 3),
               pos = LOCATE(s, "o"),
               rev = REVERSE(s),
               net = IP_PREFIX(ip, 20),
               dd = DATE_DIFF("day", t0, t1),
               fmt = DATE_FORMAT("yyyy-MM", t1),
               ms = MV_SUM(xs), ma = MV_AVG(xs),
               mf = MV_FIRST(xs), ml = MV_LAST(xs),
               sg = SIGNUM(0 - id)
        | SORT id''').collect()
    a, b = r
    assert (a.l, a.r, a.pos, a.rev) == ("hel", "rld", 5, "dlrow olleh")
    assert a.net == "10.0.0.0" and b.net is None
    assert (a.dd, b.dd) == (10, 60)
    assert (a.fmt, b.fmt) == ("2024-01", "2024-03")
    assert (a.ms, a.ma, a.mf, a.ml) == (4.0, 2.0, 3.0, 1.0)
    assert b.ms is None and b.ma is None and b.mf is None
    assert a.sg == -1.0
    # literal-argument guards raise at compile time
    with pytest.raises(ValueError, match="numeric literal"):
        esql({"t": df}, 'FROM t | EVAL x = IP_PREFIX(ip, id)')
    with pytest.raises(ValueError, match="out of"):
        esql({"t": df}, 'FROM t | EVAL x = IP_PREFIX(ip, 40)')
    with pytest.raises(ValueError, match="DATE_DIFF unit"):
        esql({"t": df}, 'FROM t | EVAL x = DATE_DIFF("fortnight", t0, t1)')


def test_esql_sample(spark):
    """Round 17 (VERDICT r16 Next #6, PARITY #35): SAMPLE = the
    deterministic portable-hash filter keyed by `ON field`;
    deterministic across runs, ~p of the rows; the plain ES form
    (no ON), the retired seed form, and out-of-range probabilities
    raise."""
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(400)], "id int, v double")
    q = 'FROM t | SAMPLE 0.25 ON id | STATS n = COUNT(*)'
    a = esql({"t": df}, q).collect()[0].n
    b = esql({"t": df}, q).collect()[0].n
    assert a == b  # deterministic
    assert abs(a - 100) < 40  # ~25% of 400
    # sampled ids are a SUBSET (a filter, not a reshuffle)
    ids = {r.id for r in esql(
        {"t": df}, 'FROM t | SAMPLE 0.5 ON id').collect()}
    assert ids < set(range(400)) and len(ids) > 100
    with pytest.raises(ValueError, match="deterministic lake"):
        esql({"t": df}, 'FROM t | SAMPLE 0.25')
    with pytest.raises(ValueError, match="seed"):
        esql({"t": df}, 'FROM t | SAMPLE 0.25 42')
    with pytest.raises(ValueError, match="probability"):
        esql({"t": df}, 'FROM t | SAMPLE 1.5 ON id')
    with pytest.raises(ValueError, match="SAMPLE <probability>"):
        esql({"t": df}, 'FROM t | SAMPLE 0.25 ON 7')


def test_esql_mv_sort_order_arg(spark):
    """ADVICE r16: MV_SORT honors its optional "ASC"/"DESC" literal
    order argument (case-insensitive) instead of silently dropping
    it; any other order literal raises."""
    df = spark.createDataFrame(
        [(1, [3.0, 1.0, 2.0])], "id int, xs array<double>")
    r = esql({"t": df}, '''FROM t
        | EVAL a = MV_SORT(xs), b = MV_SORT(xs, "DESC"),
               c = MV_SORT(xs, "asc")''').collect()[0]
    assert r.a == [1.0, 2.0, 3.0]
    assert r.b == [3.0, 2.0, 1.0]
    assert r.c == [1.0, 2.0, 3.0]
    with pytest.raises(ValueError, match="MV_SORT order"):
        esql({"t": df}, 'FROM t | EVAL x = MV_SORT(xs, "down")')
    with pytest.raises(ValueError, match="string literal"):
        esql({"t": df}, 'FROM t | EVAL x = MV_SORT(xs, id)')


def test_esql_values_and_top(spark):
    """Round 16: VALUES (sorted-ascending distinct set — the
    engine's deterministic reading of ES|QL's undefined order) and
    TOP(x, n, order); both skip NULLs and compose with MV_*."""
    df = spark.createDataFrame(
        [(1, "b", 5.0), (1, "a", 9.0), (1, "b", 7.0), (1, None, 1.0),
         (2, "c", None), (2, "c", 2.0)],
        "g int, t string, v double")
    r = esql({"x": df}, '''FROM x
        | STATS ks = VALUES(t), t2 = TOP(v, 2, "desc"),
                lo = TOP(v, 1, "asc") BY g = g
        | SORT g''').collect()
    a, b = r
    assert a.ks == ["a", "b"] and b.ks == ["c"]
    assert a.t2 == [9.0, 7.0] and a.lo == [1.0]
    assert b.t2 == [2.0] and b.lo == [2.0]
    with pytest.raises(ValueError, match="asc"):
        esql({"x": df}, 'FROM x | STATS k = TOP(v, 2, "sideways") BY g = g')
    with pytest.raises(ValueError, match=">= 1"):
        esql({"x": df}, 'FROM x | STATS k = TOP(v, 0, "asc") BY g = g')
    # per-aggregate WHERE masks compose
    r = esql({"x": df}, '''FROM x
        | STATS ks = VALUES(t) WHERE v > 4 BY g = g | SORT g''').collect()
    assert r[0].ks == ["a", "b"] and r[1].ks == []
