"""SQL DML front-door for SnapshotTable: parse the standard ``MERGE
INTO``, ``UPDATE`` and ``DELETE FROM`` statements and dispatch them to
:meth:`SnapshotTable.merge_into` / :meth:`update_where` /
:meth:`delete_where` — so a SQL-only consumer drives the same
transactional writes the DataFrame surface gets:

    from wopen_spark.sql_dml import execute_merge, execute_update, execute_delete
    execute_merge(spark, '''
        MERGE INTO tgt t
        USING (SELECT * FROM cdc_batch) s
        ON t.id = s.id
        WHEN MATCHED AND s.op = 'D' THEN DELETE
        WHEN MATCHED AND s.op = 'U' THEN UPDATE SET val = s.val
        WHEN NOT MATCHED AND s.op = 'I' THEN INSERT *
        WHEN NOT MATCHED BY SOURCE THEN DELETE
    ''', tables={"tgt": table})
    execute_update(spark, "UPDATE tgt SET val = val * 2 WHERE id = 7",
                   tables={"tgt": table})
    execute_delete(spark, "DELETE FROM tgt WHERE id % 10 = 3",
                   tables={"tgt": table})

Grammar notes (deliberately the Delta/ANSI shape, restricted):
- MERGE target aliases to ``t`` semantics, source to ``s`` — whatever
  alias names the statement declares are rewritten to the engine's t/s.
- ``ON`` must be a conjunction of ``t.k = s.k`` equi-terms (that is what
  a keyed merge IS; anything else raises).
- inserts are ``INSERT *`` (image = source row conformed to the table
  schema) or explicit-column ``INSERT (c1, c2) VALUES (e1, e2)`` (the
  Delta surface; unmentioned columns insert NULL).
- clause conditions and SET expressions pass through verbatim (they
  already speak s./t. after alias rewriting) — the parser never
  evaluates SQL, Spark does.
- UPDATE/DELETE predicates and SET expressions reference bare table
  columns (single-table statements have no alias ambiguity); a declared
  alias prefix is stripped.

Statement splitting is a paren/quote/CASE-aware token scan, NOT regex
lookahead: a SET expression containing ``CASE WHEN ... THEN ... END`` or
a USING subquery with arbitrarily nested parens parses correctly (the
r8-review regex version truncated both).

Reference parity: the reference's sql/ entry points (e.g.
/root/reference/sql/get_custom_search_data.sql) are SELECT-only; this
adds the write-side SQL surface its BigQuery tables got from the
warehouse for free.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from wopen_spark.localframe import local_df

_IDENT_RE = re.compile(r"[A-Za-z_]\w*")


def _tokens(text: str):
    """Yield (kind, value, start, paren_depth, case_depth) over ``text``:
    kind 'w' for identifier-ish words, 'q' for chars inside (or
    delimiting) string literals, 'c' for any other char — so keywords
    AND separators inside strings never match. Tracks paren depth and
    CASE..END depth."""
    i, n, q, depth, case_depth = 0, len(text), None, 0, 0
    while i < n:
        ch = text[i]
        if q:
            if ch == q:
                q = None
            yield ("q", ch, i, depth, case_depth)
            i += 1
            continue
        if ch in "'\"":
            q = ch
            yield ("q", ch, i, depth, case_depth)
            i += 1
            continue
        if ch == "(":
            depth += 1
            yield ("c", ch, i, depth, case_depth)
            i += 1
            continue
        if ch == ")":
            yield ("c", ch, i, depth, case_depth)
            depth -= 1
            i += 1
            continue
        m = _IDENT_RE.match(text, i)
        if m and (i == 0 or not (text[i - 1].isalnum() or text[i - 1] == "_")):
            w = m.group(0)
            low = w.lower()
            if low == "case":
                case_depth += 1
            yield ("w", w, i, depth, case_depth)
            if low == "end" and case_depth > 0:
                case_depth -= 1
            i = m.end()
            continue
        yield ("c", ch, i, depth, case_depth)
        i += 1


def _top_level_positions(text: str, word: str) -> list[int]:
    """Offsets where ``word`` appears as a standalone keyword at paren
    depth 0, outside string literals and outside CASE..END blocks — so a
    merge clause's WHEN/THEN is found but a CASE expression's never is."""
    wl = word.lower()
    return [
        start
        for kind, w, start, depth, cd in _tokens(text)
        if kind == "w" and depth == 0 and w.lower() == wl
        # the CASE keyword itself sits at case_depth 1 the moment it is
        # emitted; every keyword INSIDE the expression (WHEN/THEN/ELSE)
        # shares that depth, and END drops back after emission
        and (cd == 0 or (wl == "case" and cd == 1))
    ]


def _balanced_group(text: str, start: int) -> int:
    """``text[start]`` must be '(' — return the index just past its
    matching ')' (quote-aware, any nesting). Raises on unbalanced."""
    assert text[start] == "("
    for kind, ch, i, depth, _ in _tokens(text[start:]):
        # a ')' token is emitted BEFORE its depth decrement, so the
        # close paren matching the depth-1 open also carries depth 1
        if kind == "c" and ch == ")" and depth == 1:
            return start + i + 1
    raise ValueError(f"unbalanced parentheses in {text[start:start+80]!r}...")


def _split_top_level(text: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` at paren/quote depth 0 — SET lists contain
    function calls and string literals with embedded commas."""
    parts, start = [], 0
    for kind, ch, i, depth, _ in _tokens(text):
        if kind == "c" and ch == sep and depth == 0:
            parts.append(text[start:i])
            start = i + 1
    parts.append(text[start:])
    return [p.strip() for p in parts if p.strip()]


def _alias_prefix_re(alias: str) -> re.Pattern:
    """``alias.`` as a qualified-reference prefix — handles dotted
    (multi-segment) aliases, i.e. a ``db.tbl`` target used UNALIASED in
    expressions (``UPDATE db.tbl SET x = db.tbl.x + 1``). Each segment
    must match exactly (``db.tblx.`` never matches alias ``db.tbl``)."""
    return re.compile(
        r"\.".join(re.escape(seg) for seg in alias.split(".")) + r"\.",
        re.IGNORECASE,
    )


def _rewrite_aliases(expr: str, talias: str, salias: str | None = None) -> str:
    """Rewrite the statement's declared aliases to the engine's t/s
    (MERGE) or strip them (single-table UPDATE/DELETE, ``salias=None``).
    Word-boundary qualified-reference rewrite only (``x.`` prefixes,
    including dotted ``db.tbl.`` when the target name itself is the
    alias) — never inside string literals."""
    # longest alias first: a dotted alias that extends the other must
    # win the match (target "db" vs source "db.src" on "db.src.x")
    cands = [(talias, "t.")]
    if salias is not None:
        cands.append((salias, "s."))
    cands.sort(key=lambda c: -len(c[0]))
    alias_res = [(_alias_prefix_re(a), rep) for a, rep in cands]
    out, i, q = [], 0, None
    while i < len(expr):
        ch = expr[i]
        if q:
            out.append(ch)
            if ch == q:
                q = None
            i += 1
            continue
        if ch in "'\"":
            q = ch
            out.append(ch)
            i += 1
            continue
        m = re.match(r"[A-Za-z_]\w*", expr[i:])
        if m and (i == 0 or not (expr[i - 1].isalnum() or expr[i - 1] in "_.")):
            hit = False
            for rx, rep in alias_res:
                am = rx.match(expr, i)
                if am:
                    if salias is not None:
                        out.append(rep)
                    # salias None: strip "alias." entirely
                    i = am.end()
                    hit = True
                    break
            if hit:
                continue
            # plain word: copy wholesale so its inner chars are never
            # re-checked as alias starts
            out.append(m.group(0))
            i += len(m.group(0))
            continue
        out.append(ch)
        i += 1
    return "".join(out)


_HEAD_RE = re.compile(
    r"^\s*MERGE\s+INTO\s+(?P<target>[A-Za-z_][\w.]*)"
    r"(?:\s+AS)?(?:\s+(?P<talias>(?!USING\b)[A-Za-z_]\w*))?"
    r"\s+USING\s+",
    re.IGNORECASE,
)

_ALIAS_RE = re.compile(r"\s*(?:AS\s+)?(?P<alias>(?!ON\b)[A-Za-z_]\w*)?\s*", re.IGNORECASE)

_EQ_TERM_RE = re.compile(
    r"^\s*(?P<l>[A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)\.(?P<lc>[A-Za-z_]\w*)\s*=\s*"
    r"(?P<r>[A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)\.(?P<rc>[A-Za-z_]\w*)\s*$"
)

_KIND_RE = re.compile(
    r"^\s*(?P<kind>NOT\s+MATCHED\s+BY\s+SOURCE|NOT\s+MATCHED|MATCHED)\b",
    re.IGNORECASE,
)

_INSERT_COLS_RE = re.compile(r"^\s*INSERT\s*", re.IGNORECASE)


def _parse_insert_action(action: str, rw) -> dict:
    """``INSERT *`` or ``INSERT (c1, c2) VALUES (e1, e2)`` -> clause dict
    (the latter carries ``values``: col -> rewritten SQL expr; unmentioned
    columns insert NULL — the Delta explicit-column surface)."""
    a = action.strip()
    if re.fullmatch(r"INSERT\s*\*", a, re.IGNORECASE):
        return {"action": "insert"}
    m = _INSERT_COLS_RE.match(a)
    rest = a[m.end():]
    if not rest.startswith("("):
        raise ValueError(
            f"WHEN NOT MATCHED supports INSERT * or INSERT (cols) VALUES "
            f"(exprs) only, got {action!r}"
        )
    close = _balanced_group(rest, 0)
    cols = _split_top_level(rest[1:close - 1])
    tail = rest[close:].strip()
    vm = re.match(r"^VALUES\s*", tail, re.IGNORECASE)
    if not vm or not tail[vm.end():].lstrip().startswith("("):
        raise ValueError(f"INSERT (cols) needs VALUES (exprs), got {action!r}")
    vtail = tail[vm.end():].lstrip()
    vclose = _balanced_group(vtail, 0)
    exprs = _split_top_level(vtail[1:vclose - 1])
    if vtail[vclose:].strip():
        raise ValueError(f"trailing text after VALUES list: {vtail[vclose:]!r}")
    if len(cols) != len(exprs):
        raise ValueError(
            f"INSERT column/value count mismatch: {len(cols)} vs {len(exprs)}"
        )
    values = {}
    for c, e in zip(cols, exprs):
        if not re.fullmatch(r"[A-Za-z_]\w*", c):
            raise ValueError(f"bad INSERT column {c!r}")
        if c in values:
            raise ValueError(f"INSERT column {c!r} listed twice")
        values[c] = rw(e)
    return {"action": "insert", "values": values}


def parse_merge(sql: str) -> dict:
    """Parse a MERGE statement into merge_into's clause structure.
    Returns {target, source_sql, keys, matched, not_matched,
    not_matched_by_source, leftover} (leftover always '' — the scanner
    parse consumes the whole statement or raises). Raises ValueError
    with the offending fragment on anything outside the grammar."""
    text = sql.strip().rstrip(";").strip()
    m = _HEAD_RE.match(text)
    if not m:
        raise ValueError("unparseable MERGE statement (expected MERGE INTO "
                         "<target> [alias] USING <view|(subquery)> [alias] "
                         "ON ... WHEN ...)")
    target = m.group("target")
    talias = (m.group("talias") or target).lower()
    pos = m.end()
    if text[pos:].lstrip().startswith("("):
        pos += len(text[pos:]) - len(text[pos:].lstrip())
        end = _balanced_group(text, pos)
        source = text[pos:end]
        pos = end
    else:
        sm = re.match(r"\s*(?P<src>[A-Za-z_][\w.]*)", text[pos:])
        if not sm:
            raise ValueError(f"bad USING source at {text[pos:pos+40]!r}")
        source = sm.group("src")
        pos += sm.end()
    am = _ALIAS_RE.match(text, pos)
    salias = (am.group("alias") or "").lower() if am else ""
    if am and am.group("alias"):
        pos = am.end()
    if not salias:
        if source.startswith("("):
            raise ValueError("a subquery source needs an alias: USING (...) s")
        salias = source.lower()
    om = re.match(r"\s*ON\s+", text[pos:], re.IGNORECASE)
    if not om:
        raise ValueError(f"expected ON after USING source, at {text[pos:pos+40]!r}")
    pos += om.end()
    tail = text[pos:]
    whens = _top_level_positions(tail, "when")
    if not whens:
        raise ValueError("MERGE needs at least one WHEN clause")
    on_text = tail[: whens[0]].strip()

    keys = []
    for term in _split_and_terms(on_text):
        em = _EQ_TERM_RE.match(term)
        if not em:
            raise ValueError(f"ON must be AND-ed t.k = s.k equi-terms, got {term!r}")
        sides = {em.group("l").lower(): em.group("lc"), em.group("r").lower(): em.group("rc")}
        if set(sides) != {talias, salias} or sides[talias] != sides[salias]:
            raise ValueError(
                f"ON term must equate the SAME column across target and "
                f"source aliases, got {term!r}"
            )
        keys.append(sides[talias])

    rw = lambda e: _rewrite_aliases(e, talias, salias)  # noqa: E731
    matched, not_matched, by_source = [], [], []
    bounds = whens + [len(tail)]
    for wi in range(len(whens)):
        chunk = tail[bounds[wi]:bounds[wi + 1]].strip()
        body = chunk[len("WHEN"):]  # the WHEN keyword itself
        km = _KIND_RE.match(body)
        if not km:
            raise ValueError(f"bad WHEN clause {chunk[:60]!r}")
        kind = re.sub(r"\s+", " ", km.group("kind").upper())
        rest = body[km.end():]
        thens = _top_level_positions(rest, "then")
        if not thens:
            raise ValueError(f"WHEN clause missing THEN: {chunk[:60]!r}")
        cond_text = rest[: thens[0]].strip()
        action = rest[thens[0] + len("THEN"):].strip()
        cond = None
        if cond_text:
            cm = re.match(r"^AND\s+", cond_text, re.IGNORECASE)
            if not cm:
                raise ValueError(
                    f"WHEN clause condition must start with AND, got "
                    f"{cond_text[:40]!r}"
                )
            cond = rw(cond_text[cm.end():].strip())
        a_up = action.upper()
        if a_up == "DELETE":
            clause = {"action": "delete", "cond": cond}
        elif a_up.startswith("UPDATE"):
            um = re.match(r"^UPDATE\s+SET\s+", action, re.IGNORECASE)
            if not um:
                raise ValueError(f"bad UPDATE action {action[:60]!r}")
            assignments = _parse_set_list(action[um.end():], talias, rw)
            clause = {"action": "update", "cond": cond, "set": assignments}
        elif a_up.startswith("INSERT"):
            clause = {**_parse_insert_action(action, rw), "cond": cond}
            # keep the canonical key order the DataFrame surface uses
            clause = {
                "action": "insert",
                "cond": cond,
                **(
                    {"values": clause["values"]} if "values" in clause else {}
                ),
            }
        else:
            raise ValueError(f"unsupported action {action!r}")
        if kind == "MATCHED":
            if clause["action"] == "insert":
                raise ValueError("WHEN MATCHED cannot INSERT")
            matched.append(clause)
        elif kind == "NOT MATCHED":
            if clause["action"] != "insert":
                raise ValueError(
                    "WHEN NOT MATCHED supports INSERT * only (or "
                    "INSERT (cols) VALUES (exprs))"
                )
            not_matched.append(clause)
        else:
            if clause["action"] == "insert":
                raise ValueError("WHEN NOT MATCHED BY SOURCE cannot INSERT")
            by_source.append(clause)
    return {
        "target": target,
        "source_sql": source,
        "keys": keys,
        "matched": matched,
        "not_matched": not_matched,
        "not_matched_by_source": by_source,
        "leftover": "",
    }


def _split_and_terms(text: str) -> list[str]:
    """Split an ON conjunction on top-level ANDs."""
    positions = _top_level_positions(text, "and")
    parts, start = [], 0
    for p in positions:
        parts.append(text[start:p])
        start = p + 3
    parts.append(text[start:])
    return [p.strip() for p in parts if p.strip()]


def _parse_set_list(set_text: str, talias: str, rw) -> dict[str, str]:
    """``col = expr, ...`` -> {col: rewritten expr}. Accepts a
    ``talias.col`` left side; expressions may contain CASE WHEN/END,
    nested calls, and literal commas (top-level split only)."""
    assignments = {}
    for item in _split_top_level(set_text):
        col, eq, expr = item.partition("=")
        col = col.strip()
        col = re.sub(rf"^{re.escape(talias)}\.", "", col, flags=re.IGNORECASE)
        if not eq or not re.fullmatch(r"[A-Za-z_]\w*", col) or not expr.strip():
            raise ValueError(f"bad SET assignment {item!r}")
        if col in assignments:
            raise ValueError(f"column {col!r} assigned twice in SET")
        assignments[col] = rw(expr.strip())
    return assignments


_UPDATE_RE = re.compile(
    r"^\s*UPDATE\s+(?P<target>[A-Za-z_][\w.]*)"
    r"(?:\s+AS)?(?:\s+(?P<alias>(?!SET\b)[A-Za-z_]\w*))?"
    r"\s+SET\s+",
    re.IGNORECASE,
)

_DELETE_RE = re.compile(
    r"^\s*DELETE\s+FROM\s+(?P<target>[A-Za-z_][\w.]*)"
    r"(?:\s+AS)?(?:\s+(?P<alias>(?!WHERE\b)[A-Za-z_]\w*))?"
    r"\s*(?:$|(?P<where>WHERE)\s+)",
    re.IGNORECASE,
)


def parse_update(sql: str) -> dict:
    """Parse ``UPDATE <table> [alias] SET col = expr, ... [WHERE pred]``
    into {target, set, where}. Alias prefixes are stripped (single-table
    statement); ``where`` is None for a whole-table update."""
    text = sql.strip().rstrip(";").strip()
    m = _UPDATE_RE.match(text)
    if not m:
        raise ValueError(
            "unparseable UPDATE statement (expected UPDATE <table> "
            "[alias] SET col = expr[, ...] [WHERE pred])"
        )
    target = m.group("target")
    alias = (m.group("alias") or target).lower()
    rw = lambda e: _rewrite_aliases(e, alias, None)  # noqa: E731
    tail = text[m.end():]
    wheres = _top_level_positions(tail, "where")
    where = None
    if wheres:
        set_text = tail[: wheres[0]]
        where = rw(tail[wheres[0] + len("WHERE"):].strip())
        if not where:
            raise ValueError("empty WHERE clause")
    else:
        set_text = tail
    assignments = _parse_set_list(set_text, alias, rw)
    if not assignments:
        raise ValueError("UPDATE needs at least one SET assignment")
    return {"target": target, "set": assignments, "where": where}


def parse_delete(sql: str) -> dict:
    """Parse ``DELETE FROM <table> [alias] [WHERE pred]`` into
    {target, where} (``where`` None = delete everything)."""
    text = sql.strip().rstrip(";").strip()
    m = _DELETE_RE.match(text)
    if not m:
        raise ValueError(
            "unparseable DELETE statement (expected DELETE FROM <table> "
            "[alias] [WHERE pred])"
        )
    target = m.group("target")
    alias = (m.group("alias") or target).lower()
    where = None
    if m.group("where"):
        where = _rewrite_aliases(text[m.end():].strip(), alias, None)
        if not where:
            raise ValueError("empty WHERE clause")
    return {"target": target, "where": where}


def _resolve_target(p: dict, tables: dict, verb: str, catalog=None, spark=None):
    """Explicit ``tables`` dict wins; otherwise fall back to the
    persisted :class:`wopen_spark.catalog.Catalog` (statements address
    targets by registered name — the reference's dataset.table
    contract)."""
    name = p["target"]
    if name in tables:
        return tables[name]
    if catalog is not None:
        try:
            return catalog.handle(spark, name)
        except KeyError:
            known = sorted(set(tables) | set(catalog.tables()))
            raise ValueError(
                f"unknown {verb} target {name!r}; registered: {known}"
            ) from None
    raise ValueError(
        f"unknown {verb} target {name!r}; registered: {sorted(tables)}"
    )


def execute_merge(
    spark: SparkSession,
    sql: str,
    tables: dict | None = None,
    mode: str = "cow",
    txn_app: str | None = None,
    txn_version: int | None = None,
    catalog=None,
) -> dict:
    """Run a MERGE INTO statement against registered SnapshotTables.
    ``tables`` maps target names (as written in the statement) to
    SnapshotTable handles; the USING source is a view name or
    parenthesized subquery resolved by Spark SQL. Returns merge_into's
    report."""
    p = parse_merge(sql)
    if p["leftover"]:
        raise ValueError(f"unparsed MERGE fragment: {p['leftover']!r}")
    t = _resolve_target(p, tables or {}, "merge", catalog, spark)
    src_sql = p["source_sql"]
    source: DataFrame = (
        spark.sql(src_sql[1:-1]) if src_sql.startswith("(") else spark.table(src_sql)
    )
    return t.merge_into(
        source,
        p["keys"],
        matched=p["matched"] or None,
        not_matched=p["not_matched"] or None,
        not_matched_by_source=p["not_matched_by_source"] or None,
        mode=mode,
        txn_app=txn_app,
        txn_version=txn_version,
    )


def execute_update(
    spark: SparkSession, sql: str, tables: dict | None = None,
    mode: str = "cow", catalog=None,
) -> dict:
    """Run an UPDATE statement against a registered SnapshotTable —
    dispatches to :meth:`SnapshotTable.update_where` (cow or dv). A
    missing WHERE updates every row (predicate ``true``), the ANSI
    contract."""
    p = parse_update(sql)
    t = _resolve_target(p, tables or {}, "update", catalog, spark)
    return t.update_where(p["where"] or "true", p["set"], mode=mode)


def execute_delete(
    spark: SparkSession, sql: str, tables: dict | None = None,
    mode: str = "cow", catalog=None,
) -> dict:
    """Run a DELETE FROM statement against a registered SnapshotTable —
    dispatches to :meth:`SnapshotTable.delete_where`. A missing WHERE
    deletes every row."""
    p = parse_delete(sql)
    t = _resolve_target(p, tables or {}, "delete", catalog, spark)
    return t.delete_where(p["where"] or "true", mode=mode)


_INSERT_RE = re.compile(
    r"^\s*INSERT\s+INTO\s+(?P<target>[A-Za-z_][\w.]*)\s*", re.IGNORECASE
)


def parse_insert(sql: str) -> dict:
    """Parse ``INSERT INTO <table> [(cols)] VALUES (...)[, ...]`` or
    ``INSERT INTO <table> [(cols)] SELECT ...`` into {target, cols,
    values_sql, select_sql} (exactly one of the last two set). The
    VALUES rows / SELECT text pass through verbatim — Spark evaluates
    them, the parser never does."""
    text = sql.strip().rstrip(";").strip()
    m = _INSERT_RE.match(text)
    if not m:
        raise ValueError(
            "unparseable INSERT statement (expected INSERT INTO <table> "
            "[(cols)] VALUES (...) | SELECT ...)"
        )
    target = m.group("target")
    rest = text[m.end():].lstrip()
    cols = None
    if rest.startswith("("):
        # could be a column list OR a parenthesized SELECT — peek inside
        close = _balanced_group(rest, 0)
        inner = rest[1:close - 1].strip()
        if not re.match(r"^SELECT\b", inner, re.IGNORECASE):
            cols = [c.strip() for c in _split_top_level(inner)]
            for c in cols:
                if not re.fullmatch(r"[A-Za-z_]\w*", c):
                    raise ValueError(f"bad INSERT column {c!r}")
            if len(set(cols)) != len(cols):
                raise ValueError("INSERT column listed twice")
            rest = rest[close:].lstrip()
    if re.match(r"^VALUES\b", rest, re.IGNORECASE):
        return {"target": target, "cols": cols, "values_sql": rest,
                "select_sql": None}
    if re.match(r"^SELECT\b", rest, re.IGNORECASE) or rest.startswith("("):
        return {"target": target, "cols": cols, "values_sql": None,
                "select_sql": rest}
    raise ValueError(
        f"INSERT needs VALUES (...) or SELECT ..., got {rest[:40]!r}"
    )


def execute_insert(
    spark: SparkSession, sql: str, tables: dict | None = None, catalog=None
) -> dict:
    """Run an INSERT INTO statement against a registered SnapshotTable —
    dispatches to the transactional :meth:`SnapshotTable.append`.
    Columns bind POSITIONALLY (the ANSI contract): without a column
    list the select/values arity must equal the table arity; with one,
    it must equal the list (unlisted columns land NULL — appends accept
    subset schemas)."""
    from pyspark.sql import types as T

    p = parse_insert(sql)
    t = _resolve_target(p, tables or {}, "insert", catalog, spark)
    if p["values_sql"] is not None:
        src = spark.sql(f"SELECT * FROM ({p['values_sql']})")
    else:
        sel = p["select_sql"]
        src = spark.sql(sel[1:-1] if sel.startswith("(") else sel)
    table_cols = [
        f.name
        for f in T.StructType.fromJson(t._state()["schema"]).fields
    ]
    names = p["cols"] if p["cols"] is not None else table_cols
    if p["cols"] is not None:
        unknown = [c for c in names if c not in table_cols]
        if unknown:
            raise ValueError(f"INSERT into unknown column(s): {unknown}")
    if len(names) != len(src.columns):
        raise ValueError(
            f"INSERT arity mismatch: {len(src.columns)} values for "
            f"{len(names)} column(s)"
        )
    # ANSI store assignment: each value coerces to its target column's
    # type (a VALUES literal like 20.0 arrives as decimal(3,1))
    from pyspark.sql import functions as F

    types = {
        f.name: f.dataType
        for f in T.StructType.fromJson(t._state()["schema"]).fields
    }
    src = src.toDF(*names).select(
        *[F.col(c).cast(types[c]).alias(c) for c in names]
    )
    version = t.append(src)
    return {"version": version}


# ---------------------------------------------------------------- admin SQL

_VACUUM_RE = re.compile(
    r"^\s*VACUUM\s+(?P<target>[A-Za-z_][\w.]*)"
    r"(?:\s+RETAIN\s+(?P<retain>\d+)\s+VERSIONS)?\s*$",
    re.IGNORECASE,
)
_OPTIMIZE_RE = re.compile(
    r"^\s*OPTIMIZE\s+(?P<target>[A-Za-z_][\w.]*)"
    r"(?:\s+ZORDER\s+BY\s*(?P<zcols>\([^)]*\)|[A-Za-z_]\w*(?:\s*,\s*[A-Za-z_]\w*)*))?\s*$",
    re.IGNORECASE,
)
_OPTIMIZE_WHERE_RE = re.compile(
    r"^\s*OPTIMIZE\s+(?P<target>[A-Za-z_][\w.]*)\s+WHERE\s+(?P<pred>.+)$",
    re.IGNORECASE | re.DOTALL,
)
_BETWEEN_TERM = r"[A-Za-z_]\w*\s+BETWEEN\s+(?:'[^']*'|-?\d+(?:\.\d+)?)\s+AND\s+(?:'[^']*'|-?\d+(?:\.\d+)?)"
_BETWEEN_TERM_CAP = re.compile(
    r"([A-Za-z_]\w*)\s+BETWEEN\s+('[^']*'|-?\d+(?:\.\d+)?)"
    r"\s+AND\s+('[^']*'|-?\d+(?:\.\d+)?)",
    re.IGNORECASE,
)


def _parse_between_ranges(pred: str) -> dict:
    """``col BETWEEN a AND b [AND col2 BETWEEN c AND d]...`` -> ranges
    dict for stats-scoped OPTIMIZE. Only BETWEEN conjunctions — the
    file-selection predicate language is deliberately the one footer
    stats can serve."""
    if not re.fullmatch(
        rf"{_BETWEEN_TERM}(?:\s+AND\s+{_BETWEEN_TERM})*",
        pred.strip(),
        re.IGNORECASE,
    ):
        raise ValueError(
            "OPTIMIZE ... WHERE takes only conjunctions of "
            "col BETWEEN lo AND hi (the stats-prunable predicate shape), "
            f"got {pred[:60]!r}"
        )

    def val(s: str):
        if s.startswith("'"):
            return s[1:-1]
        return float(s) if "." in s else int(s)

    out = {}
    for m in _BETWEEN_TERM_CAP.finditer(pred):
        out[m.group(1)] = (val(m.group(2)), val(m.group(3)))
    return out


_HISTORY_RE = re.compile(
    r"^\s*DESCRIBE\s+HISTORY\s+(?P<target>[A-Za-z_][\w.]*)\s*$",
    re.IGNORECASE,
)
_RESTORE_RE = re.compile(
    r"^\s*RESTORE\s+(?:TABLE\s+)?(?P<target>[A-Za-z_][\w.]*)"
    r"\s+TO\s+VERSION\s+AS\s+OF\s+(?P<version>\d+)\s*$",
    re.IGNORECASE,
)
_RESTORE_TS_RE = re.compile(
    r"^\s*RESTORE\s+(?:TABLE\s+)?(?P<target>[A-Za-z_][\w.]*)"
    r"\s+TO\s+TIMESTAMP\s+AS\s+OF\s+'(?P<ts>[^']+)'\s*$",
    re.IGNORECASE,
)
_SHOW_TABLES_RE = re.compile(r"^\s*SHOW\s+TABLES\s*$", re.IGNORECASE)
_CREATE_HEAD_RE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?"
    r"(?P<target>[A-Za-z_][\w.]*)\s*",
    re.IGNORECASE,
)
_DROP_RE = re.compile(
    r"^\s*DROP\s+TABLE\s+(?P<ie>IF\s+EXISTS\s+)?"
    r"(?P<target>[A-Za-z_][\w.]*)\s*$",
    re.IGNORECASE,
)


def _parse_cluster_location(tail: str) -> tuple[list[str] | None, str | None, str]:
    """Shared ``[CLUSTER BY (cols)] [LOCATION '<path>']`` suffix scan;
    returns (cluster_by, location, remaining_tail)."""
    cluster_by = None
    cm = re.match(r"^CLUSTER\s+BY\s*\(", tail, re.IGNORECASE)
    if cm:
        cclose = _balanced_group(tail, cm.end() - 1)
        cluster_by = _split_top_level(tail[cm.end():cclose - 1])
        for c in cluster_by:
            if not re.fullmatch(r"[A-Za-z_]\w*", c):
                raise ValueError(f"bad CLUSTER BY column {c!r}")
        tail = tail[cclose:].strip()
    location = None
    lm = re.match(r"^LOCATION\s+'(?P<loc>[^']+)'\s*", tail, re.IGNORECASE)
    if lm:
        location = lm.group("loc")
        tail = tail[lm.end():].strip()
    return cluster_by, location, tail


def parse_create_table(sql: str) -> dict:
    """``CREATE TABLE [IF NOT EXISTS] <name> (col type, ...)
    [CLUSTER BY (c1, ...)] [LOCATION '<path>']`` or the CTAS form
    ``CREATE TABLE [IF NOT EXISTS] <name> [CLUSTER BY (...)] [LOCATION
    '<path>'] AS SELECT ...`` -> {target, if_not_exists, ddl|select,
    cluster_by, location}. The column list is balanced-paren scanned
    (types like ``decimal(10,2)`` nest) and passed to Spark's DDL
    parser verbatim — this parser never interprets types; the CTAS
    SELECT text goes to ``spark.sql`` verbatim."""
    text = sql.strip().rstrip(";").strip()
    m = _CREATE_HEAD_RE.match(text)
    if not m:
        raise ValueError(
            "unparseable CREATE TABLE (expected CREATE TABLE [IF NOT "
            "EXISTS] <name> (col type, ...) [CLUSTER BY (cols)] "
            "[LOCATION '<path>'] | ... AS SELECT ...)"
        )
    out = {
        "target": m.group("target"),
        "if_not_exists": bool(m.group("ine")),
        "ddl": None,
        "select": None,
        "cluster_by": None,
        "location": None,
    }
    rest = text[m.end():]
    if rest.startswith("("):
        close = _balanced_group(rest, 0)
        ddl = rest[1:close - 1].strip()
        if not ddl:
            raise ValueError("CREATE TABLE needs at least one column")
        out["ddl"] = ddl
        rest = rest[close:].strip()
    out["cluster_by"], out["location"], tail = _parse_cluster_location(rest)
    am = re.match(r"^AS\s+", tail, re.IGNORECASE)
    if am:
        if out["ddl"] is not None:
            raise ValueError(
                "CREATE TABLE takes a column list OR AS SELECT, not both "
                "(CTAS derives the schema from the query)"
            )
        select = tail[am.end():].strip()
        if not re.match(r"^(SELECT|WITH)\b", select, re.IGNORECASE):
            raise ValueError(f"CTAS expects AS SELECT ..., got {select[:40]!r}")
        out["select"] = select
    elif tail:
        raise ValueError(f"trailing text after CREATE TABLE: {tail[:60]!r}")
    elif out["ddl"] is None:
        raise ValueError(
            "CREATE TABLE needs a column list or AS SELECT, got neither"
        )
    return out
_DESCRIBE_RE = re.compile(
    r"^\s*DESCRIBE\s+(?:TABLE\s+)?"
    r"(?P<target>(?!HISTORY\b)(?!DETAIL\b)[A-Za-z_][\w.]*)\s*$",
    re.IGNORECASE,
)
_DETAIL_RE = re.compile(
    r"^\s*DESCRIBE\s+DETAIL\s+(?P<target>[A-Za-z_][\w.]*)\s*$",
    re.IGNORECASE,
)
_SHOW_CREATE_RE = re.compile(
    r"^\s*SHOW\s+CREATE\s+TABLE\s+(?P<target>[A-Za-z_][\w.]*)\s*$",
    re.IGNORECASE,
)


def _reconstruct_ddl(t, name: str) -> str:
    """Round-trippable DDL: a script that, run through
    :func:`execute_sql_script` against an empty location, recreates the
    table's SHAPE (schema, identity, clustering, constraints — not
    data). Identity START WITH resumes above the current high-water mark
    so a recreated table never re-issues ids."""
    st = t._state()
    fields = T.StructType.fromJson(st["schema"]).fields
    defs = []
    for f in fields:
        d = f"{f.name} {f.dataType.simpleString().upper()}"
        spec = st["identity"].get(f.name)
        if spec is not None:
            nxt = (
                spec["start"]
                if spec["high"] is None
                else spec["high"] + spec["step"]
            )
            d += (
                f" GENERATED ALWAYS AS IDENTITY (START WITH {nxt} "
                f"INCREMENT BY {spec['step']})"
            )
        defs.append(d)
    stmt = f"CREATE TABLE {name} ({', '.join(defs)})"
    if st["cluster_by"]:
        stmt += f" CLUSTER BY ({', '.join(st['cluster_by'])})"
    stmt += f" LOCATION '{t.path}'"
    lines = [stmt + ";"]
    for cname, expr in sorted(st["constraints"].items()):
        lines.append(f"ALTER TABLE {name} ADD CONSTRAINT {cname} CHECK ({expr});")
    return "\n".join(lines)
_COPY_RE = re.compile(
    r"^\s*COPY\s+INTO\s+(?P<target>[A-Za-z_][\w.]*)\s+"
    r"FROM\s+'(?P<path>[^']+)'\s*(?P<tail>.*)$",
    re.IGNORECASE | re.DOTALL,
)


def execute_copy_into(
    spark: SparkSession, sql: str, tables: dict | None = None, catalog=None
) -> dict:
    """``COPY INTO t FROM '<dir>' [FILEFORMAT = PARQUET|CSV|JSON]
    [PATTERN = '<glob>'] [FORMAT_OPTIONS (k = 'v', ...)]`` ->
    :meth:`SnapshotTable.copy_into` — file-level exactly-once ingestion
    (re-runs skip already-loaded files)."""
    text = sql.strip().rstrip(";").strip()
    m = _COPY_RE.match(text)
    if not m:
        raise ValueError(
            "unparseable COPY INTO (expected COPY INTO t FROM '<dir>' "
            "[FILEFORMAT = PARQUET|CSV|JSON] [PATTERN = '<glob>'] "
            "[FORMAT_OPTIONS (k = 'v', ...)])"
        )
    tail = m.group("tail").strip()
    file_format, pattern, options = "parquet", None, {}
    fm = re.match(r"^FILEFORMAT\s*=\s*(\w+)\s*", tail, re.IGNORECASE)
    if fm:
        file_format = fm.group(1).lower()
        tail = tail[fm.end():].strip()
    pm = re.match(r"^PATTERN\s*=\s*'([^']+)'\s*", tail, re.IGNORECASE)
    if pm:
        pattern = pm.group(1)
        tail = tail[pm.end():].strip()
    om = re.match(r"^FORMAT_OPTIONS\s*\(", tail, re.IGNORECASE)
    if om:
        close = _balanced_group(tail, om.end() - 1)
        for item in _split_top_level(tail[om.end():close - 1]):
            kv = re.match(r"^([A-Za-z_]\w*)\s*=\s*'([^']*)'$", item.strip())
            if not kv:
                raise ValueError(f"bad FORMAT_OPTIONS entry {item!r}")
            options[kv.group(1)] = kv.group(2)
        tail = tail[close:].strip()
    if tail:
        raise ValueError(f"trailing text after COPY INTO: {tail[:60]!r}")
    t = _resolve_target(
        {"target": m.group("target")}, tables or {}, "copy into",
        catalog, spark,
    )
    return t.copy_into(
        m.group("path"), file_format=file_format, pattern=pattern,
        options=options or None,
    )


_CONVERT_RE = re.compile(
    r"^\s*CONVERT\s+TO\s+SNAPSHOT\s+'(?P<path>[^']+)'\s*(?P<tail>.*)$",
    re.IGNORECASE | re.DOTALL,
)
_ALTER_HEAD_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<target>[A-Za-z_][\w.]*)\s+(?P<rest>.+)$",
    re.IGNORECASE | re.DOTALL,
)


def _parse_column_defs(ddl: str) -> list[tuple[str, str]]:
    """``c1 T1, c2 T2`` -> [(name, type_ddl), ...]; types parse later
    by Spark's DDL parser, so commas inside ``decimal(10,2)`` survive
    the top-level split."""
    out = []
    for item in _split_top_level(ddl):
        m = re.match(r"^([A-Za-z_]\w*)\s+(.+)$", item.strip(), re.DOTALL)
        if not m:
            raise ValueError(f"bad column definition {item!r} (want: name TYPE)")
        out.append((m.group(1), m.group(2).strip()))
    return out


def execute_alter(
    spark: SparkSession, sql: str, tables: dict | None = None, catalog=None
) -> dict:
    """``ALTER TABLE t <action>`` — the schema/layout evolution verbs,
    every one an O(metadata) commit (no data rewrite, at any size):

    - ``ADD COLUMN[S] [(]c1 T1[, c2 T2][)]`` -> :meth:`add_columns`
      (nullable; existing rows read NULL).
    - ``RENAME COLUMN a TO b`` -> :meth:`rename_column` (mapping-only).
    - ``DROP COLUMN c`` -> :meth:`drop_column` (physical retired).
    - ``ALTER COLUMN c TYPE T`` -> :meth:`widen_column` (lossless
      widening only).
    - ``ADD CONSTRAINT n CHECK (expr)`` / ``DROP CONSTRAINT n`` ->
      :meth:`add_constraint` / :meth:`drop_constraint`.
    - ``CLUSTER BY (c1, ...)`` / ``CLUSTER BY NONE`` ->
      :meth:`set_cluster_by` (future writes re-cluster; old files stay).
    - ``RENAME TO new.name`` -> catalog rename (name-only; needs a
      catalog — the table's path never changes).
    """
    text = sql.strip().rstrip(";").strip()
    m = _ALTER_HEAD_RE.match(text)
    if not m:
        raise ValueError("unparseable ALTER TABLE (expected ALTER TABLE t <action>)")
    name, rest = m.group("target"), m.group("rest").strip()

    # RENAME TO is catalog-level: resolve nothing, rename the entry
    rm = re.match(r"^RENAME\s+TO\s+(?P<new>[A-Za-z_][\w.]*)\s*$", rest, re.IGNORECASE)
    if rm:
        if catalog is None:
            raise ValueError("ALTER TABLE ... RENAME TO needs a catalog")
        catalog.rename(name, rm.group("new"))
        return {"renamed": rm.group("new")}

    t = _resolve_target({"target": name}, tables or {}, "alter", catalog, spark)
    am = re.match(r"^ADD\s+COLUMNS?\s+", rest, re.IGNORECASE)
    if am:
        body = rest[am.end():].strip()
        if body.startswith("("):
            close = _balanced_group(body, 0)
            if body[close:].strip():
                raise ValueError(
                    f"trailing text after ADD COLUMNS: {body[close:][:40]!r}"
                )
            body = body[1:close - 1]
        return {"version": t.add_columns(_parse_column_defs(body))}
    rm = re.match(
        r"^RENAME\s+COLUMN\s+([A-Za-z_]\w*)\s+TO\s+([A-Za-z_]\w*)\s*$",
        rest, re.IGNORECASE,
    )
    if rm:
        return {"version": t.rename_column(rm.group(1), rm.group(2))}
    dm = re.match(r"^DROP\s+COLUMN\s+([A-Za-z_]\w*)\s*$", rest, re.IGNORECASE)
    if dm:
        return {"version": t.drop_column(dm.group(1))}
    wm = re.match(
        r"^ALTER\s+COLUMN\s+([A-Za-z_]\w*)\s+TYPE\s+(.+)$", rest, re.IGNORECASE
    )
    if wm:
        return {"version": t.widen_column(wm.group(1), wm.group(2).strip())}
    cm = re.match(
        r"^ADD\s+CONSTRAINT\s+([A-Za-z_]\w*)\s+CHECK\s*\(", rest, re.IGNORECASE
    )
    if cm:
        close = _balanced_group(rest, cm.end() - 1)
        if rest[close:].strip():
            raise ValueError(
                f"trailing text after CHECK constraint: {rest[close:][:40]!r}"
            )
        return {
            "version": t.add_constraint(
                cm.group(1), rest[cm.end():close - 1].strip()
            )
        }
    cm = re.match(r"^DROP\s+CONSTRAINT\s+([A-Za-z_]\w*)\s*$", rest, re.IGNORECASE)
    if cm:
        return {"version": t.drop_constraint(cm.group(1))}
    cm = re.match(r"^CLUSTER\s+BY\s+NONE\s*$", rest, re.IGNORECASE)
    if cm:
        return {"version": t.set_cluster_by(None)}
    cm = re.match(r"^CLUSTER\s+BY\s*\(", rest, re.IGNORECASE)
    if cm:
        close = _balanced_group(rest, cm.end() - 1)
        if rest[close:].strip():
            raise ValueError(
                f"trailing text after CLUSTER BY: {rest[close:][:40]!r}"
            )
        cols = _split_top_level(rest[cm.end():close - 1])
        for c in cols:
            if not re.fullmatch(r"[A-Za-z_]\w*", c):
                raise ValueError(f"bad CLUSTER BY column {c!r}")
        return {"version": t.set_cluster_by(cols)}
    raise ValueError(
        f"unsupported ALTER TABLE action {rest[:60]!r} (expected ADD "
        "COLUMN[S] | RENAME COLUMN a TO b | DROP COLUMN | ALTER COLUMN c "
        "TYPE T | ADD/DROP CONSTRAINT | CLUSTER BY | RENAME TO)"
    )


def execute_admin(
    spark: SparkSession, sql: str, tables: dict | None = None, catalog=None
) -> object:
    """The table-maintenance statements a SQL-only consumer needs
    (Delta-shaped grammar, dispatched to the engine methods):

    - ``VACUUM t [RETAIN n VERSIONS]`` -> :meth:`SnapshotTable.vacuum`
      (default retain 1); returns {"removed": n}.
    - ``OPTIMIZE t`` -> incremental bin-packing
      (:meth:`optimize_small_files`); ``OPTIMIZE t ZORDER BY (c1, c2)``
      -> :meth:`optimize_zorder`. Returns the engine report.
    - ``DESCRIBE HISTORY t`` -> the commit log as a DataFrame.
    - ``DESCRIBE [TABLE] t`` -> the logical schema as a DataFrame
      (col_name, data_type, nullable).
    - ``SHOW TABLES`` -> the addressable names as a DataFrame (name,
      path): catalog registrations plus any explicit ``tables`` dict
      entries (the dict wins on collision, matching target resolution).
    - ``RESTORE [TABLE] t TO VERSION AS OF n`` -> :meth:`restore`;
      returns {"version": new_head}.
    - ``CREATE TABLE [IF NOT EXISTS] t (col type, ...) [CLUSTER BY
      (cols)] [LOCATION '<path>']`` -> an empty transactional table,
      registered in the catalog (location derived from the catalog root
      when omitted).
    - ``DROP TABLE [IF EXISTS] t`` -> unregister from the catalog
      (external-table semantics: files untouched).
    """
    text = sql.strip().rstrip(";")
    m = _VACUUM_RE.match(text)
    if m:
        t = _resolve_target(
            {"target": m.group("target")}, tables or {}, "vacuum",
            catalog, spark,
        )
        retain = int(m.group("retain")) if m.group("retain") else 1
        return {"removed": t.vacuum(retain_last=retain)}
    m = _OPTIMIZE_WHERE_RE.match(text)
    if m:
        t = _resolve_target(
            {"target": m.group("target")}, tables or {}, "optimize",
            catalog, spark,
        )
        return t.optimize_small_files(
            where_ranges=_parse_between_ranges(m.group("pred"))
        )
    m = _OPTIMIZE_RE.match(text)
    if m:
        t = _resolve_target(
            {"target": m.group("target")}, tables or {}, "optimize",
            catalog, spark,
        )
        z = m.group("zcols")
        if z:
            cols = [c.strip() for c in z.strip("() \t").split(",") if c.strip()]
            return t.optimize_zorder(cols)
        return t.optimize_small_files()
    m = _HISTORY_RE.match(text)
    if m:
        t = _resolve_target(
            {"target": m.group("target")}, tables or {}, "describe",
            catalog, spark,
        )
        rows = t.history()
        # bind columns BY NAME (not dict insertion order) so extending
        # or reordering history()'s dict can never silently shift values
        schema = T.StructType(
            [
                T.StructField("version", T.IntegerType()),
                T.StructField("ts_unix", T.DoubleType()),
                T.StructField("operation", T.StringType()),
                T.StructField("n_added", T.IntegerType()),
                T.StructField("n_removed", T.IntegerType()),
                T.StructField("n_rows_dv_masked", T.LongType()),
            ]
        )
        return local_df(
            spark, [tuple(r[f.name] for f in schema.fields) for r in rows], schema
        )
    m = _RESTORE_RE.match(text)
    if m:
        t = _resolve_target(
            {"target": m.group("target")}, tables or {}, "restore",
            catalog, spark,
        )
        return {"version": t.restore(int(m.group("version")))}
    m = _RESTORE_TS_RE.match(text)
    if m:
        from datetime import datetime, timezone

        t = _resolve_target(
            {"target": m.group("target")}, tables or {}, "restore",
            catalog, spark,
        )
        dt = datetime.fromisoformat(m.group("ts"))
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return {"version": t.restore(t._version_asof(dt.timestamp()))}
    m = _SHOW_TABLES_RE.match(text)
    if m:
        # explicit dict entries + catalog registrations, deduped by name
        # (dict wins, matching _resolve_target precedence)
        entries: dict[str, str] = {}
        if catalog is not None:
            for name in catalog.tables():
                entries[name] = catalog.resolve(name)["path"]
        for name, t in (tables or {}).items():
            entries[name] = t.path
        schema = T.StructType(
            [
                T.StructField("name", T.StringType()),
                T.StructField("path", T.StringType()),
            ]
        )
        return local_df(spark, sorted(entries.items()), schema)
    m = _DESCRIBE_RE.match(text)
    if m:
        t = _resolve_target(
            {"target": m.group("target")}, tables or {}, "describe",
            catalog, spark,
        )
        st = t._state()
        fields = T.StructType.fromJson(st["schema"]).fields
        schema = T.StructType(
            [
                T.StructField("col_name", T.StringType()),
                T.StructField("data_type", T.StringType()),
                T.StructField("nullable", T.BooleanType()),
                T.StructField("extra", T.StringType()),
            ]
        )

        def extra(name: str) -> str:
            spec = st["identity"].get(name)
            if spec is not None:
                return (
                    f"identity(start={spec['start']}, step={spec['step']})"
                )
            g = st["generated"].get(name)
            if g is not None:
                return f"generated always as ({g['expr']})"
            return ""

        return local_df(
            spark,
            [
                (f.name, f.dataType.simpleString(), f.nullable, extra(f.name))
                for f in fields
            ],
            schema,
        )
    if re.match(r"^\s*CREATE\s+TABLE\b", text, re.IGNORECASE):
        return _execute_create_table(spark, text, catalog)
    m = _CONVERT_RE.match(text)
    if m:
        from wopen_spark.catalog import build_handle

        tail = m.group("tail").strip()
        cluster_by, location, tail = _parse_cluster_location(tail)
        if location is not None:
            raise ValueError("CONVERT TO SNAPSHOT takes the path first, not LOCATION")
        name = None
        am = re.match(r"^AS\s+(?P<name>[A-Za-z_][\w.]*)\s*$", tail, re.IGNORECASE)
        if am:
            name = am.group("name")
        elif tail:
            raise ValueError(f"trailing text after CONVERT: {tail[:60]!r}")
        if name is not None and catalog is None:
            raise ValueError("CONVERT ... AS <name> needs a catalog")
        t = build_handle(spark, m.group("path"))
        t.convert_from_parquet(cluster_by=cluster_by)
        if name is not None:
            catalog.register(name, m.group("path"))
        return {"converted": m.group("path"), "version": 1,
                "files": len(t._state()["files"]),
                **({"registered": name} if name else {})}
    m = _SHOW_CREATE_RE.match(text)
    if m:
        name = m.group("target")
        t = _resolve_target(
            {"target": name}, tables or {}, "show create", catalog, spark
        )
        return {"script": _reconstruct_ddl(t, name)}
    m = _DETAIL_RE.match(text)
    if m:
        t = _resolve_target(
            {"target": m.group("target")}, tables or {}, "describe detail",
            catalog, spark,
        )
        st = t._state()
        schema = T.StructType(
            [
                T.StructField("format", T.StringType()),
                T.StructField("location", T.StringType()),
                T.StructField("version", T.LongType()),
                T.StructField("num_files", T.LongType()),
                T.StructField("size_bytes", T.LongType()),
                T.StructField("num_dv_masked_files", T.LongType()),
                T.StructField("cluster_by", T.ArrayType(T.StringType())),
                T.StructField("num_constraints", T.LongType()),
                T.StructField("num_identity_columns", T.LongType()),
            ]
        )
        return local_df(
            spark,
            [
                (
                    "wopen_snapshot",
                    t.path,
                    st["version"],
                    len(st["files"]),
                    sum(m_.get("bytes", 0) for m_ in st["files"].values()),
                    len(st["dvs"]),
                    st["cluster_by"] or [],
                    len(st["constraints"]),
                    len(st["identity"]),
                )
            ],
            schema,
        )
    m = _DROP_RE.match(text)
    if m:
        name = m.group("target")
        if catalog is None:
            raise ValueError(
                "DROP TABLE needs a catalog (it unlinks a registered "
                "name; table files are never deleted — use VACUUM for "
                "space)"
            )
        try:
            catalog.unregister(name)
            return {"dropped": name}
        except KeyError:
            if m.group("ie"):
                return {"dropped": None}
            raise ValueError(
                f"unknown drop target {name!r}; registered: "
                f"{catalog.tables()}"
            ) from None
    raise ValueError(
        "unparseable admin statement (expected CREATE TABLE [AS SELECT] "
        "| DROP TABLE | CONVERT TO SNAPSHOT | VACUUM | OPTIMIZE [ZORDER "
        "BY] | DESCRIBE [HISTORY|DETAIL] | SHOW TABLES | SHOW CREATE "
        "TABLE | RESTORE ... TO VERSION|TIMESTAMP AS OF)"
    )


def _execute_create_table(spark: SparkSession, text: str, catalog) -> dict:
    """``CREATE TABLE`` — an EMPTY transactional table at LOCATION (or a
    catalog-derived path ``<root>/tables/<name>``), registered in the
    catalog when one is passed. External-table semantics throughout:
    DROP unlinks the name, never the files. IF NOT EXISTS is a no-op
    when the name is registered (or, uncataloged, when the location
    already holds a table)."""
    from wopen_spark.catalog import build_handle

    p = parse_create_table(text)
    name, location = p["target"], p["location"]
    if catalog is not None and name in catalog.tables():
        if p["if_not_exists"]:
            return {"created": False, "path": catalog.resolve(name)["path"]}
        raise ValueError(f"table {name!r} already exists; DROP it first")
    if location is None:
        if catalog is None:
            raise ValueError(
                "CREATE TABLE needs a LOCATION '<path>' or a catalog to "
                "derive one from"
            )
        location = f"{catalog.root.rstrip('/')}/tables/{name}"
    t = build_handle(spark, location)
    if t.latest_version() is not None:
        if p["if_not_exists"] and catalog is None:
            return {"created": False, "path": location}
        raise ValueError(
            f"a table already exists at {location!r} (register it "
            f"instead of re-creating)"
        )
    identity: list[tuple[str, int, int]] = []
    if p["select"] is not None:
        # CTAS: the schema IS the query's schema; the data rides the
        # same create commit (one atomic version, like any other write)
        df = spark.sql(p["select"])
    else:
        ddl, identity = _strip_identity_clauses(p["ddl"])
        df = local_df(spark, [], T.StructType.fromDDL(ddl))
    t.create(df, cluster_by=p["cluster_by"])
    for col, start, step in identity:
        t.set_identity_column(col, start=start, step=step)
    if catalog is not None:
        catalog.register(name, location)
    return {"created": True, "path": location, "version": 1}


_IDENTITY_CLAUSE_RE = re.compile(
    r"\s+GENERATED\s+ALWAYS\s+AS\s+IDENTITY"
    r"(?:\s*\(\s*(?:START\s+WITH\s+(?P<start>-?\d+)\s*)?"
    r"(?:INCREMENT\s+BY\s+(?P<step>-?\d+)\s*)?\))?\s*$",
    re.IGNORECASE,
)


def _strip_identity_clauses(ddl: str) -> tuple[str, list[tuple[str, int, int]]]:
    """Split the CREATE column list, peel ``GENERATED ALWAYS AS IDENTITY
    [(START WITH n INCREMENT BY k)]`` off any column definition (Spark's
    DDL parser does not know the clause), and return (clean_ddl,
    [(col, start, step), ...])."""
    defs, identity = [], []
    for item in _split_top_level(ddl):
        m = _IDENTITY_CLAUSE_RE.search(item)
        if m:
            item = item[: m.start()].strip()
            col = item.split(None, 1)[0]
            identity.append(
                (
                    col,
                    int(m.group("start") or 1),
                    int(m.group("step") or 1),
                )
            )
        defs.append(item)
    return ", ".join(defs), identity


def execute_sql(
    spark: SparkSession, sql: str, tables: dict | None = None,
    mode: str = "cow", catalog=None,
) -> object:
    """ONE SQL entry point for the whole DML + DDL + admin surface:
    routes by leading keyword to MERGE / UPDATE / DELETE / INSERT /
    CREATE TABLE [AS SELECT] / ALTER TABLE / DROP TABLE / VACUUM /
    OPTIMIZE / DESCRIBE [HISTORY] / SHOW TABLES / RESTORE. ``mode``
    applies to the DML statements that take one (merge/update/delete)."""
    head = sql.strip().split(None, 2)
    kw = head[0].upper() if head else ""
    kw2 = head[1].upper() if len(head) > 1 else ""
    if kw == "MERGE":
        return execute_merge(spark, sql, tables, mode=mode, catalog=catalog)
    if kw == "UPDATE":
        return execute_update(spark, sql, tables, mode=mode, catalog=catalog)
    if kw == "DELETE":
        return execute_delete(spark, sql, tables, mode=mode, catalog=catalog)
    if kw == "INSERT":
        return execute_insert(spark, sql, tables, catalog=catalog)
    if kw == "ALTER" and kw2 == "TABLE":
        return execute_alter(spark, sql, tables, catalog=catalog)
    if kw == "COPY" and kw2 == "INTO":
        return execute_copy_into(spark, sql, tables, catalog=catalog)
    if kw in ("VACUUM", "OPTIMIZE", "RESTORE", "DESCRIBE", "DROP", "CONVERT") or (
        kw == "SHOW" and kw2 in ("TABLES", "CREATE")
    ) or (kw == "CREATE" and kw2 == "TABLE"):
        return execute_admin(spark, sql, tables, catalog=catalog)
    raise ValueError(f"unsupported statement {kw!r} (SELECTs go to spark.sql)")


def _split_statements(script: str) -> list[str]:
    """Split a script on top-level semicolons (quote/paren-aware via the
    token scanner) after stripping ``--`` line comments outside string
    literals. Quote state carries ACROSS newlines — a string literal may
    legally contain line breaks (and even ``--``), so comment stripping
    cannot be a per-line pass."""
    out, q, i, n = [], None, 0, len(script)
    while i < n:
        ch = script[i]
        if q:
            out.append(ch)
            if ch == q:
                q = None
            i += 1
            continue
        if ch in "'\"":
            q = ch
            out.append(ch)
            i += 1
            continue
        if ch == "-" and script[i:i + 2] == "--":
            j = script.find("\n", i)
            i = n if j == -1 else j  # the newline itself survives
            continue
        out.append(ch)
        i += 1
    return [s for s in _split_top_level("".join(out), ";") if s.strip()]


def execute_sql_script(
    spark: SparkSession, script: str, tables: dict | None = None,
    mode: str = "cow", catalog=None,
) -> list:
    """Run a multi-statement SQL script (semicolon-separated, ``--``
    comments allowed) through :func:`execute_sql`, in order, stopping at
    the first error. SELECT statements run via ``spark.sql``. Returns
    the per-statement results — the migration-script surface: a
    SQL-only consumer ships one file that creates, loads, mutates and
    maintains tables by name."""
    out = []
    for stmt in _split_statements(script):
        kw = stmt.strip().split(None, 1)[0].upper()
        if kw in ("SELECT", "WITH"):
            out.append(spark.sql(stmt))
        else:
            out.append(
                execute_sql(spark, stmt, tables, mode=mode, catalog=catalog)
            )
    return out
