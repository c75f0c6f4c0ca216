"""SQL DML front-door for SnapshotTable: parse the standard ``MERGE
INTO`` statement (conditional matched UPDATE/DELETE, NOT MATCHED INSERT,
NOT MATCHED BY SOURCE UPDATE/DELETE) and dispatch it to
:meth:`SnapshotTable.merge_into` — so a SQL-only consumer drives the
same transactional CDC-apply the DataFrame surface gets:

    from wopen_spark.sql_dml import execute_merge
    execute_merge(spark, '''
        MERGE INTO tgt t
        USING (SELECT * FROM cdc_batch) s
        ON t.id = s.id
        WHEN MATCHED AND s.op = 'D' THEN DELETE
        WHEN MATCHED AND s.op = 'U' THEN UPDATE SET val = s.val
        WHEN NOT MATCHED AND s.op = 'I' THEN INSERT *
        WHEN NOT MATCHED BY SOURCE THEN DELETE
    ''', tables={"tgt": table})

Grammar notes (deliberately the Delta/ANSI shape, restricted):
- target aliases to ``t`` semantics, source to ``s`` — whatever alias
  names the statement declares are rewritten to the engine's t/s.
- ``ON`` must be a conjunction of ``t.k = s.k`` equi-terms (that is what
  a keyed merge IS; anything else raises).
- ``INSERT *`` only (the insert image is the source row conformed to
  the table schema — merge_into's contract).
- clause conditions and SET expressions pass through verbatim (they
  already speak s./t. after alias rewriting) — the parser never
  evaluates SQL, Spark does.

Reference parity: the reference's sql/ entry points (e.g.
/root/reference/sql/get_custom_search_data.sql) are SELECT-only; this
adds the write-side SQL surface its BigQuery tables got from the
warehouse for free.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_MERGE_RE = re.compile(
    r"^\s*MERGE\s+INTO\s+(?P<target>[A-Za-z_][\w.]*)"
    r"(?:\s+AS)?(?:\s+(?P<talias>[A-Za-z_]\w*))?"
    r"\s+USING\s+(?P<source>\((?:[^()]|\([^()]*\))*\)|[A-Za-z_][\w.]*)"
    r"(?:\s+AS)?(?:\s+(?P<salias>[A-Za-z_]\w*))?"
    r"\s+ON\s+(?P<on>.*?)"
    r"(?P<clauses>\s+WHEN\s+.*)$",
    re.IGNORECASE | re.DOTALL,
)

_WHEN_RE = re.compile(
    r"WHEN\s+(?P<kind>NOT\s+MATCHED\s+BY\s+SOURCE|NOT\s+MATCHED|MATCHED)"
    r"(?:\s+AND\s+(?P<cond>.*?))?"
    r"\s+THEN\s+(?P<action>UPDATE\s+SET\s+.*?|DELETE|INSERT\s+\*)"
    r"(?=\s+WHEN\s+|\s*$)",
    re.IGNORECASE | re.DOTALL,
)

_EQ_TERM_RE = re.compile(
    r"^\s*(?P<l>[A-Za-z_]\w*)\.(?P<lc>[A-Za-z_]\w*)\s*=\s*"
    r"(?P<r>[A-Za-z_]\w*)\.(?P<rc>[A-Za-z_]\w*)\s*$"
)


def _split_top_level(text: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` at paren/quote depth 0 — SET lists contain
    function calls and string literals with embedded commas."""
    parts, depth, start, i, q = [], 0, 0, 0, None
    while i < len(text):
        ch = text[i]
        if q:
            if ch == q:
                q = None
        elif ch in "'\"":
            q = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == sep and depth == 0:
            parts.append(text[start:i])
            start = i + 1
        i += 1
    parts.append(text[start:])
    return [p.strip() for p in parts if p.strip()]


def _rewrite_aliases(expr: str, talias: str, salias: str) -> str:
    """Rewrite the statement's declared aliases to the engine's t/s.
    Word-boundary qualified-reference rewrite only (``x.`` prefixes) —
    never inside string literals."""
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
            word = m.group(0)
            rest = expr[i + len(word):]
            if rest.startswith("."):
                low = word.lower()
                if low == talias:
                    out.append("t")
                elif low == salias:
                    out.append("s")
                else:
                    out.append(word)
                i += len(word)
                continue
        out.append(ch)
        i += 1
    return "".join(out)


def parse_merge(sql: str) -> dict:
    """Parse a MERGE statement into merge_into's clause structure.
    Returns {target, source_sql, keys, matched, not_matched,
    not_matched_by_source}. Raises ValueError with the offending
    fragment on anything outside the supported grammar."""
    m = _MERGE_RE.match(sql.strip().rstrip(";"))
    if not m:
        raise ValueError("unparseable MERGE statement (expected MERGE INTO "
                         "<target> [alias] USING <view|(subquery)> [alias] "
                         "ON ... WHEN ...)")
    target = m.group("target")
    talias = (m.group("talias") or target).lower()
    source = m.group("source")
    salias = (m.group("salias") or (source if not source.startswith("(") else "")).lower()
    if talias in ("as",) or salias in ("as",):
        raise ValueError("alias parsing error")
    if not salias:
        raise ValueError("a subquery source needs an alias: USING (...) s")

    keys = []
    for term in re.split(r"\s+AND\s+", m.group("on").strip(), flags=re.IGNORECASE):
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
    clause_text = m.group("clauses")
    spans = list(_WHEN_RE.finditer(clause_text))
    if not spans:
        raise ValueError("MERGE needs at least one WHEN clause")
    gaps, pos = [], 0
    for s in spans:
        gaps.append(clause_text[pos:s.start()])
        pos = s.end()
    gaps.append(clause_text[pos:])
    leftover = "".join(gaps).strip()
    for w in spans:
        kind = re.sub(r"\s+", " ", w.group("kind").upper())
        cond = rw(w.group("cond").strip()) if w.group("cond") else None
        action = w.group("action").strip()
        a_up = action.upper()
        if a_up == "DELETE":
            clause = {"action": "delete", "cond": cond}
        elif a_up.startswith("UPDATE"):
            set_text = re.sub(r"^UPDATE\s+SET\s+", "", action, flags=re.IGNORECASE)
            assignments = {}
            for item in _split_top_level(set_text):
                col, _, expr = item.partition("=")
                col = col.strip()
                # accept `t.col =` as well as bare `col =`
                col = re.sub(rf"^{talias}\.", "", col, flags=re.IGNORECASE)
                if not re.match(r"^[A-Za-z_]\w*$", col) or not expr.strip():
                    raise ValueError(f"bad SET assignment {item!r}")
                assignments[col] = rw(expr.strip())
            clause = {"action": "update", "cond": cond, "set": assignments}
        elif a_up.replace(" ", "") == "INSERT*":
            clause = {"action": "insert", "cond": cond}
        else:
            raise ValueError(f"unsupported action {action!r}")
        if kind == "MATCHED":
            if clause["action"] == "insert":
                raise ValueError("WHEN MATCHED cannot INSERT")
            matched.append(clause)
        elif kind == "NOT MATCHED":
            if clause["action"] != "insert":
                raise ValueError("WHEN NOT MATCHED supports INSERT * only")
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
        "leftover": leftover,
    }


def execute_merge(
    spark: SparkSession,
    sql: str,
    tables: dict,
    mode: str = "cow",
    txn_app: str | None = None,
    txn_version: int | None = None,
) -> dict:
    """Run a MERGE INTO statement against registered SnapshotTables.
    ``tables`` maps target names (as written in the statement) to
    SnapshotTable handles; the USING source is a view name or
    parenthesized subquery resolved by Spark SQL. Returns merge_into's
    report."""
    p = parse_merge(sql)
    if p["leftover"]:
        raise ValueError(f"unparsed MERGE fragment: {p['leftover']!r}")
    if p["target"] not in tables:
        raise ValueError(
            f"unknown merge target {p['target']!r}; registered: "
            f"{sorted(tables)}"
        )
    src_sql = p["source_sql"]
    source: DataFrame = (
        spark.sql(src_sql[1:-1]) if src_sql.startswith("(") else spark.table(src_sql)
    )
    return tables[p["target"]].merge_into(
        source,
        p["keys"],
        matched=p["matched"] or None,
        not_matched=p["not_matched"] or None,
        not_matched_by_source=p["not_matched_by_source"] or None,
        mode=mode,
        txn_app=txn_app,
        txn_version=txn_version,
    )
