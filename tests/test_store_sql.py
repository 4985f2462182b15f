"""SQL DML boundary (sources/store_sql.py, VERDICT r12 missing #2):
the router maps the simple DELETE/UPDATE forms EXACTLY onto
delete_where/update_where (twin-equal, count-equal), and everything
richer is refused loudly with the Python API named — never whatever
Spark happens to throw."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geo_explorer_etl_spark.sources.store import PARTITION_COL, TableStore

T = "IndicatorValues"


def _store(spark, path, n=20):
    store = TableStore(spark, str(path / "wh"))
    df = spark.createDataFrame(
        [(k, "live" if k % 2 else "even", float(k)) for k in range(n)],
        "k LONG, status STRING, amount DOUBLE",
    ).withColumn(PARTITION_COL, F.lit(3).cast("long"))
    store.append(T, df)
    store.adopt_manifests(T)
    return store


def _rows(store):
    return sorted(
        tuple(r) for r in store.read(T).select("k", "status", "amount").collect()
    )


def test_delete_routes_to_delete_where_twin(spark, tmp_path):
    a = _store(spark, tmp_path / "a")
    b = _store(spark, tmp_path / "b")
    na = a.sql("DELETE FROM IndicatorValues WHERE amount >= 10 AND k IN (10, 12, 99)")
    nb = b.delete_where(T, [("amount", ">=", 10.0), ("k", "in", [10, 12, 99])])
    assert na == nb == 2
    assert _rows(a) == _rows(b)


def test_update_routes_with_exprs_and_literals(spark, tmp_path):
    a = _store(spark, tmp_path / "a")
    b = _store(spark, tmp_path / "b")
    stmt = (
        "UPDATE IndicatorValues SET status = 'patched', "
        "amount = amount + 0.5 WHERE k BETWEEN 4 AND 7;"
    )
    na = a.sql(stmt)
    nb = b.update_where(
        T,
        {"status": "'patched'", "amount": "amount + 0.5"},
        [("k", "between", (4, 7))],
    )
    assert na == nb == 4
    assert _rows(a) == _rows(b)


def test_bare_delete_and_operator_spellings(spark, tmp_path):
    store = _store(spark, tmp_path)
    assert store.sql("DELETE FROM IndicatorValues WHERE status <> 'live'") == 10
    assert store.sql("DELETE FROM IndicatorValues WHERE k = 1") == 1
    assert store.sql("DELETE FROM IndicatorValues") == 9  # every row
    assert store.read(T) is None


def test_or_predicates_route_with_and_precedence(spark, tmp_path):
    """WHERE ... OR ... routes to the store's disjunct grammar with
    standard precedence (AND binds tighter than OR), for DELETE and
    UPDATE both — twin-checked against the Python API's OR form."""
    from geo_explorer_etl_spark.sources.store_sql import _parse_preds

    # parser shape: a AND b OR c == [[a, b], "or", [c]]
    assert _parse_preds("k = 1 AND status = 'live' OR amount > 18", "t") == [
        [("k", "==", 1), ("status", "==", "live")],
        "or",
        [("amount", ">", 18)],
    ]
    a = _store(spark, tmp_path / "a")
    b = _store(spark, tmp_path / "b")
    na = a.sql(
        "DELETE FROM IndicatorValues WHERE k < 3 AND status = 'live' OR amount >= 18"
    )
    nb = b.delete_where(
        T,
        [[("k", "<", 3), ("status", "==", "live")], "or", [("amount", ">=", 18)]],
    )
    assert na == nb == 3  # k=1 plus k in (18, 19)
    assert _rows(a) == _rows(b)
    na = a.sql(
        "UPDATE IndicatorValues SET amount = amount + 100 "
        "WHERE k IN (2, 4) OR k BETWEEN 14 AND 15"
    )
    nb = b.update_where(
        T,
        {"amount": "amount + 100"},
        [[("k", "in", [2, 4])], "or", [("k", "between", (14, 15))]],
    )
    assert na == nb == 4
    assert _rows(a) == _rows(b)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="expected AND, OR or end"):
        a.sql("DELETE FROM IndicatorValues WHERE k = 1 OR")


def test_quoted_and_qualified_table_names_route(spark, tmp_path):
    """Backtick- / double-quoted and spark_catalog/default-qualified
    table names resolve to the store table (VERDICT r13 missing #4);
    any OTHER qualifier refuses loudly instead of silently routing to
    a same-named table of this store."""
    import pytest as _pytest

    store = _store(spark, tmp_path)
    assert store.sql("DELETE FROM `IndicatorValues` WHERE k = 1") == 1
    assert store.sql('DELETE FROM "IndicatorValues" WHERE k = 2') == 1
    assert store.sql("DELETE FROM default.IndicatorValues WHERE k = 3") == 1
    assert (
        store.sql(
            "UPDATE spark_catalog.default.`IndicatorValues` "
            "SET amount = 0.0 WHERE k = 4"
        )
        == 1
    )
    assert store.read(T).filter("k = 4").collect()[0]["amount"] == 0.0
    with _pytest.raises(ValueError, match="not addressable"):
        store.sql("DELETE FROM otherdb.IndicatorValues WHERE k = 5")
    assert store.read(T).filter("k = 5").count() == 1  # refusal touched nothing


def test_repeated_selects_reuse_catalog_registration(spark, tmp_path, monkeypatch):
    """The session catalog doubles as the registration cache: the
    first SELECT registers the table, later SELECTs against the same
    schema never re-register (spy), and a schema change (rename)
    re-registers automatically instead of raising the stale-schema
    error."""
    import geo_explorer_etl_spark.sources.store_source as SS

    store = _store(spark, tmp_path)
    calls: list = []
    real = SS.create_catalog_table

    def spy(*a, **k):
        calls.append(a)
        return real(*a, **k)

    monkeypatch.setattr(SS, "create_catalog_table", spy)
    assert store.sql("SELECT COUNT(*) AS n FROM IndicatorValues").collect()[0][0] == 20
    assert len(calls) == 1
    assert store.sql("SELECT MAX(k) AS mk FROM IndicatorValues").collect()[0][0] == 19
    assert store.sql("SELECT COUNT(*) AS n FROM IndicatorValues WHERE status = 'live'").collect()[0][0] == 10
    assert len(calls) == 1  # reused — no DROP/CREATE round-trips
    store.rename_column(T, "amount", "amt")
    got = store.sql(
        "SELECT COUNT(*) AS n FROM IndicatorValues WHERE amt > 10"
    ).collect()[0][0]
    assert got == 9
    assert len(calls) == 2  # schema change re-registered exactly once


def test_unroutable_statements_refused_loudly(spark, tmp_path):
    store = _store(spark, tmp_path)
    before = _rows(store)
    for stmt, hint in [
        ("MERGE INTO IndicatorValues USING x ON 1=1", "merge_apply"),
        ("INSERT INTO nosuch VALUES (1)", "no existing store table"),
        # parens and every NOT form route since r16 (their own tests);
        # column-vs-column and arithmetic stay out of scope
        ("DELETE FROM IndicatorValues WHERE k % 2 = 0", "delete_where"),
        ("UPDATE IndicatorValues SET k = (SELECT 1)", "update_where"),
        ("DROP TABLE IndicatorValues", "delete_where"),
        ("DELETE FROM IndicatorValues WHERE amount >= k", "delete_where"),
    ]:
        with pytest.raises(ValueError, match="store.sql: cannot route") as ei:
            store.sql(stmt)
        assert hint in str(ei.value)
    assert _rows(store) == before  # refusals touched nothing


def test_string_literal_escapes_round_trip(spark, tmp_path):
    store = _store(spark, tmp_path)
    store.sql("UPDATE IndicatorValues SET status = 'it''s, ok' WHERE k = 2")
    got = store.read(T).filter("k = 2").select("status").collect()[0][0]
    assert got == "it's, ok"


def test_select_and_insert_delegate_to_spark_sql(spark, tmp_path):
    """SELECT/WITH/INSERT are full Spark SQL over auto-registered
    catalog tables — store.sql is the one-stop surface: the SELECT
    reads the pruned serving path, the INSERT lands through the
    sink's txn publish and is visible to the next statement."""
    store = _store(spark, tmp_path)
    got = store.sql(
        "SELECT count(*) AS n FROM IndicatorValues WHERE amount >= 10"
    ).collect()
    assert got[0]["n"] == 10
    store.sql(
        "INSERT INTO IndicatorValues "
        "SELECT 999 AS k, 'ins' AS status, 9.5 AS amount, "
        "3 AS IndicatorThemeId"
    )
    [r] = store.sql(
        "SELECT status, amount FROM IndicatorValues WHERE k = 999"
    ).collect()
    assert (r["status"], r["amount"]) == ("ins", 9.5)
    # and the row is visible to the store's own reader too
    assert store.read(T).filter("k = 999").count() == 1


def test_select_serves_matviews_user_facing(spark, tmp_path):
    """A materialized view named in a SELECT serves its USER-FACING
    projection — hidden sketch/counter columns and tombstoned groups
    never leak through store.sql."""
    from geo_explorer_etl_spark.operators import matview as MV

    store = _store(spark, tmp_path)
    MV.create_matview(
        store, "by_status", T, ["status"],
        {"n": ("count", None), "total": ("sum", "amount")},
    )
    store.delete_where(T, [("status", "==", "even")])
    MV.refresh_matview(store, "by_status")  # 'even' is now a tombstone
    rows = store.sql("SELECT * FROM by_status ORDER BY status").collect()
    assert [r["status"] for r in rows] == ["live"]
    assert set(rows[0].asDict()) == {"status", "n", "total"}
    assert rows[0]["n"] == 10


def test_is_null_predicates_route(spark, tmp_path):
    """IS NULL / IS NOT NULL route to the store's isnull/notnull ops
    (the grammar's only null-accepting predicates), composing with
    AND/OR — twin-checked against the Python API."""
    a = _store(spark, tmp_path / "a")
    b = _store(spark, tmp_path / "b")
    for s in (a, b):
        s.sql("UPDATE IndicatorValues SET status = NULL WHERE k IN (3, 6, 9)")
    assert a.sql("SELECT COUNT(*) AS n FROM IndicatorValues WHERE status IS NULL").collect()[0][0] == 3
    na = a.sql("DELETE FROM IndicatorValues WHERE status IS NULL AND k > 5")
    nb = b.delete_where(T, [("status", "isnull", None), ("k", ">", 5)])
    assert na == nb == 2
    na = a.sql(
        "UPDATE IndicatorValues SET amount = -1.0 "
        "WHERE status IS NULL OR k = 19"
    )
    nb = b.update_where(
        T, {"amount": "-1.0"},
        [[("status", "isnull", None)], "or", [("k", "==", 19)]],
    )
    assert na == nb == 2
    assert _rows(a) == _rows(b)
    assert (
        a.sql("DELETE FROM IndicatorValues WHERE status IS NOT NULL")
        == b.delete_where(T, [("status", "notnull", None)])
    )


def test_like_predicates_route(spark, tmp_path):
    """WHERE col LIKE 'pattern' routes into the tuple grammar (VERDICT
    r14 next #4): prefix, suffix and infix patterns all twin-equal the
    Python API; NOT LIKE stays refused (pinned above)."""
    a = _store(spark, tmp_path / "a")
    b = _store(spark, tmp_path / "b")
    na = a.sql("DELETE FROM IndicatorValues WHERE status LIKE 'ev%'")
    nb = b.delete_where(T, [("status", "like", "ev%")])
    assert na == nb == 10
    assert _rows(a) == _rows(b)
    # suffix (non-prefix) pattern: honest scan, same result as filter
    na = a.sql("UPDATE IndicatorValues SET status = 'x' WHERE status LIKE '%ve'")
    nb = b.update_where(T, {"status": "'x'"}, [("status", "like", "%ve")])
    assert na == nb == 10
    assert _rows(a) == _rows(b)
    # LIKE OR LIKE keeps disjunct precedence
    a2 = _store(spark, tmp_path / "a2")
    n = a2.sql(
        "DELETE FROM IndicatorValues WHERE status LIKE 'li%' AND k < 5 "
        "OR status LIKE '%en'"
    )
    assert n == 10 + 2  # all 10 'even' rows + k in (1, 3)


@pytest.mark.slow
def test_in_subquery_predicates_route(spark, tmp_path, monkeypatch):
    """WHERE col IN (SELECT ...) materializes through the router's own
    SELECT delegation into the tuple grammar (VERDICT r14 missing #4):
    twin-equal the Python API, NULL subquery values drop (they can
    never match), multi-column subqueries and over-cap value sets
    refuse loudly without touching rows."""
    import geo_explorer_etl_spark.sources.store_sql as SQ

    a = _store(spark, tmp_path / "a")
    b = _store(spark, tmp_path / "b")
    na = a.sql(
        "DELETE FROM IndicatorValues WHERE k IN "
        "(SELECT k FROM IndicatorValues WHERE amount >= 16.0)"
    )
    nb = b.delete_where(T, [("k", "in", [16, 17, 18, 19])])
    assert na == nb == 4
    assert _rows(a) == _rows(b)
    # UPDATE with a subquery over ANOTHER relation (a temp view)
    spark.createDataFrame([(2,), (4,), (None,)], "kk LONG").createOrReplaceTempView(
        "picked_keys"
    )
    try:
        na = a.sql(
            "UPDATE IndicatorValues SET status = 'picked' "
            "WHERE k IN (SELECT kk FROM picked_keys)"
        )
        nb = b.update_where(T, {"status": "'picked'"}, [("k", "in", [2, 4])])
        assert na == nb == 2
        assert _rows(a) == _rows(b)
    finally:
        spark.catalog.dropTempView("picked_keys")
    # AND/OR composition around the subquery clause
    n = a.sql(
        "DELETE FROM IndicatorValues WHERE k IN "
        "(SELECT k FROM IndicatorValues WHERE status = 'picked') AND k < 3 "
        "OR k = 15"
    )
    assert n == 2  # k=2 (picked, <3) and k=15
    before = _rows(a)
    with pytest.raises(ValueError, match="exactly ONE column"):
        a.sql(
            "DELETE FROM IndicatorValues WHERE k IN "
            "(SELECT k, status FROM IndicatorValues)"
        )
    monkeypatch.setattr(SQ, "SUBQUERY_IN_CAP", 2)
    with pytest.raises(ValueError, match="more than 2 distinct"):
        a.sql(
            "DELETE FROM IndicatorValues WHERE k IN "
            "(SELECT k FROM IndicatorValues)"
        )
    assert _rows(a) == before  # refusals touched nothing


def test_in_subquery_scan_skips_comments_and_quoted_identifiers(
    spark, tmp_path
):
    """ADVICE r15: a close-paren inside a ``--`` comment, a backtick
    identifier or a double-quoted literal must not mis-split the
    IN (SELECT ...) scan."""
    a = _store(spark, tmp_path / "a")
    n = a.sql(
        "DELETE FROM IndicatorValues WHERE k IN "
        "(SELECT k -- weird ) comment\n"
        "FROM IndicatorValues WHERE amount >= 16.0)"
    )
    assert n == 4
    n2 = a.sql(
        "DELETE FROM IndicatorValues WHERE k IN "
        "(SELECT k AS `odd)name` FROM IndicatorValues WHERE k < 2)"
    )
    assert n2 == 2
    # Spark treats "..." as a string literal by default — the scanner
    # must skip its paren either way
    n3 = a.sql(
        "DELETE FROM IndicatorValues WHERE k IN "
        '(SELECT k FROM IndicatorValues WHERE status != "x)y" AND k < 4)'
    )
    assert n3 == 2


@pytest.mark.slow
def test_parenthesized_and_not_predicates_route(spark, tmp_path):
    """VERDICT r15 next #3 (router side): parentheses nest and
    distribute into the store's DNF grammar, NOT LIKE / NOT IN route
    (NULL-semantics exact), precedence still AND-over-OR, and the
    DNF expansion bound refuses loudly."""
    import pytest

    # (a OR b) AND c — the canonical paren override
    a = _store(spark, tmp_path / "a")
    b = _store(spark, tmp_path / "b")
    na = a.sql(
        "DELETE FROM IndicatorValues WHERE (k < 3 OR k > 16) "
        "AND status = 'live'"
    )
    nb = b.delete_where(
        T,
        [[("k", "<", 3), ("status", "==", "live")], "or",
         [("k", ">", 16), ("status", "==", "live")]],
    )
    assert na == nb == 3  # k=1, 17, 19
    assert _rows(a) == _rows(b)

    # paren-free twin keeps AND-over-OR precedence: a OR b AND c
    c = _store(spark, tmp_path / "c")
    nc = c.sql(
        "DELETE FROM IndicatorValues WHERE k < 3 OR k > 16 "
        "AND status = 'live'"
    )
    assert nc == 5  # k=0,1,2 OR (17,19)

    # nested parens + NOT LIKE + NOT IN in one statement
    d = _store(spark, tmp_path / "d")
    nd = d.sql(
        "DELETE FROM IndicatorValues WHERE "
        "((status NOT LIKE 'li%' AND k NOT IN (0, 2)) OR (k BETWEEN 18 AND 19))"
    )
    # evens except 0,2 -> 4,6,8,10,12,14,16,18 (8) plus 19
    assert nd == 9
    left = {r[0] for r in _rows(d)}
    assert left == {0, 1, 2, 3, 5, 7, 9, 11, 13, 15, 17}

    # NOT IN (SELECT ...) with a NULL member: never-true, deletes 0
    e = _store(spark, tmp_path / "e")
    spark.createDataFrame([(2,), (None,)], "kk LONG").createOrReplaceTempView(
        "nn_keys"
    )
    try:
        ne = e.sql(
            "DELETE FROM IndicatorValues WHERE k NOT IN "
            "(SELECT kk FROM nn_keys)"
        )
        assert ne == 0
        # without the NULL member the complement deletes
        ne2 = e.sql(
            "DELETE FROM IndicatorValues WHERE k NOT IN "
            "(SELECT kk FROM nn_keys WHERE kk IS NOT NULL)"
        )
        assert ne2 == 19  # everything but k=2
    finally:
        spark.catalog.dropTempView("nn_keys")

    # UPDATE with parens routes identically to the Python twin
    f1 = _store(spark, tmp_path / "f1")
    f2 = _store(spark, tmp_path / "f2")
    nf = f1.sql(
        "UPDATE IndicatorValues SET status = 'x' "
        "WHERE (k = 1 OR k = 2) AND amount < 10.0"
    )
    ng = f2.update_where(
        T, {"status": "'x'"},
        [[("k", "==", 1), ("amount", "<", 10.0)], "or",
         [("k", "==", 2), ("amount", "<", 10.0)]],
    )
    assert nf == ng == 2 and _rows(f1) == _rows(f2)

    # unbalanced parens and DNF blowup refuse loudly, touching nothing
    g = _store(spark, tmp_path / "g")
    before = _rows(g)
    with pytest.raises(ValueError, match="unbalanced parentheses"):
        g.sql("DELETE FROM IndicatorValues WHERE (k = 1 OR k = 2")
    blowup = " AND ".join("(k = 1 OR k = 2)" for _ in range(8))  # 2^8 disjuncts
    with pytest.raises(ValueError, match="expands past"):
        g.sql(f"DELETE FROM IndicatorValues WHERE {blowup}")
    assert _rows(g) == before


# -- differential property: router parse vs Spark's own SQL parse --------
from hypothesis import given, settings, strategies as st  # noqa: E402


def _clause_strategy():
    ints = st.integers(-5, 25)
    nums = st.integers(-5, 25).map(lambda i: f"{i}.5")
    strs = st.sampled_from(["live", "even", "ev", "li"])
    cmps = st.sampled_from(["=", "==", "!=", "<>", "<", "<=", ">", ">="])
    return st.one_of(
        st.tuples(cmps, ints).map(lambda t: f"k {t[0]} {t[1]}"),
        st.tuples(cmps, nums).map(lambda t: f"amount {t[0]} {t[1]}"),
        st.tuples(cmps, strs).map(lambda t: f"status {t[0]} '{t[1]}'"),
        st.tuples(ints, ints).map(
            lambda t: f"k BETWEEN {min(t)} AND {max(t)}"
        ),
        st.tuples(ints, ints).map(
            lambda t: f"k NOT BETWEEN {min(t)} AND {max(t)}"
        ),
        st.tuples(cmps, strs).map(
            lambda t: f"NOT status {t[0]} '{t[1]}'"
        ),
        st.lists(ints, min_size=1, max_size=4).map(
            lambda vs: f"k IN ({', '.join(map(str, vs))})"
        ),
        st.lists(ints, min_size=1, max_size=4).map(
            lambda vs: f"k NOT IN ({', '.join(map(str, vs))})"
        ),
        st.sampled_from(["li%", "%ve", "l_ve", "x%", "%v%"]).map(
            lambda p: f"status LIKE '{p}'"
        ),
        st.sampled_from(["li%", "%ve", "ev%"]).map(
            lambda p: f"status NOT LIKE '{p}'"
        ),
        st.just("status IS NULL"),
        st.just("status IS NOT NULL"),
    )


_pred_strategy = st.recursive(
    _clause_strategy(),
    lambda kids: st.one_of(
        st.tuples(kids, st.sampled_from(["AND", "OR"]), kids).map(
            lambda t: f"{t[0]} {t[1]} {t[2]}"
        ),
        kids.map(lambda s: f"({s})"),
        kids.map(lambda s: f"NOT ({s})"),
    ),
    max_leaves=6,
)


@settings(max_examples=60, deadline=None)
@given(_pred_strategy)
@pytest.mark.slow
def test_router_predicate_semantics_match_spark_sql(spark, text):
    """The r16 recursive-descent parser, differentially (VERDICT r15
    next #3): for ANY AND/OR/paren combination of the routed clause
    forms, the store grammar the router produces must evaluate
    row-for-row like Spark's own parse of the SAME predicate text —
    precedence, parens, 3VL NULL handling, NOT forms, everything."""
    from geo_explorer_etl_spark.sources.store import _where_expr
    from geo_explorer_etl_spark.sources.store_sql import _parse_preds

    df = spark.createDataFrame(
        [
            (k, ["live", "even", None][k % 3], k + 0.5)
            for k in range(-2, 23)
        ],
        "k LONG, status STRING, amount DOUBLE",
    )
    preds = _parse_preds(text, text)
    got = df.select(
        "k",
        F.coalesce(F.expr(text), F.lit(False)).alias("want"),
        F.coalesce(_where_expr(preds), F.lit(False)).alias("have"),
    ).collect()
    bad = [(r["k"], r["want"], r["have"]) for r in got if r["want"] != r["have"]]
    assert not bad, (text, bad)


def test_general_not_and_not_between_route(spark, tmp_path):
    """r16: factor-level NOT (De Morgan through the DNF) and
    NOT BETWEEN (the < / > disjunction rewrite) route with 3VL-exact
    semantics, twin-checked against the Python API."""
    a = _store(spark, tmp_path / "a")
    b = _store(spark, tmp_path / "b")
    na = a.sql("DELETE FROM IndicatorValues WHERE k NOT BETWEEN 3 AND 16")
    nb = b.delete_where(T, [[("k", "<", 3)], "or", [("k", ">", 16)]])
    assert na == nb == 6  # 0,1,2,17,18,19
    assert _rows(a) == _rows(b)
    na = a.sql(
        "DELETE FROM IndicatorValues WHERE NOT (status = 'live' OR k < 6)"
    )
    nb = b.delete_where(T, [("status", "!=", "live"), ("k", ">=", 6)])
    assert na == nb == 6  # even rows 6..16
    assert _rows(a) == _rows(b)
    # double negation and NOT over AND both land exactly
    nc = a.sql(
        "DELETE FROM IndicatorValues WHERE NOT NOT k = 3"
    )
    assert nc == 1
    nd = a.sql(
        "DELETE FROM IndicatorValues WHERE NOT (k >= 5 AND status LIKE 'li%')"
    )
    # remaining: 4..16 odd/live minus 3; NOT(k>=5 AND live) keeps
    # live rows >= 5 only
    assert {r[0] for r in _rows(a)} == {5, 7, 9, 11, 13, 15}
    assert nd > 0


def test_not_over_in_subquery_keeps_null_semantics(spark, tmp_path):
    """r16 3VL pin: a NULL member of an IN-subquery must survive
    materialization so a WRAPPING NOT sees it — NOT(k IN (..., NULL))
    is never-true and deletes NOTHING (the old keep_null=only-for-
    direct-NOT-IN dropped the NULL before negation and deleted the
    complement)."""
    store = _store(spark, tmp_path)
    spark.createDataFrame([(2,), (None,)], "kk LONG").createOrReplaceTempView(
        "nn_keys2"
    )
    try:
        before = _rows(store)
        n = store.sql(
            "DELETE FROM IndicatorValues WHERE NOT "
            "(k IN (SELECT kk FROM nn_keys2))"
        )
        assert n == 0 and _rows(store) == before
        # double negation restores the positive IN exactly
        n2 = store.sql(
            "DELETE FROM IndicatorValues WHERE NOT (k NOT IN "
            "(SELECT kk FROM nn_keys2 WHERE kk IS NOT NULL))"
        )
        assert n2 == 1  # k = 2
        # and the POSITIVE in with a NULL member still matches its
        # non-null values (None member inert)
        n3 = store.sql(
            "DELETE FROM IndicatorValues WHERE k IN "
            "(SELECT kk FROM nn_keys2)"
        )
        assert n3 == 0  # k=2 already gone; NULL matches nothing
    finally:
        spark.catalog.dropTempView("nn_keys2")


def test_keyword_paren_adjacency_routes(spark, tmp_path):
    """r16 review find: NOT(/AND(/OR( without a trailing space are
    valid SQL (the common machine-generated form) and must route."""
    store = _store(spark, tmp_path)
    n = store.sql(
        "DELETE FROM IndicatorValues WHERE NOT(k = 1) AND(k < 4) OR(k = 19)"
    )
    assert n == 4  # 0, 2, 3, 19
    assert {r[0] for r in _rows(store)} == set(range(4, 19)) | {1}
