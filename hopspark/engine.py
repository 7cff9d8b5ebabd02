"""Engine front door: `Engine.sql()` — the Spark analogue of the reference's
query lifecycle (SURVEY.md §3).

Reference pipeline: HS2 ExecuteStatement → CUP parse → analyze/rewrite →
single-node plan → distributed plan → coordinator execution
(be/src/service/impala-server.h:197; fe/.../service/Frontend.java:2004-2018;
fe/.../planner/Planner.java:248-256). On Spark, everything from parse
onwards is Catalyst + AQE; the engine contributes the dialect translation,
the function library registration, and the table catalog binding.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from hopspark import catalog
from hopspark.ddl import AlterTableMixin
from hopspark.dialect import translate
from hopspark.functions import register_all
from hopspark.session import get_spark


class Engine(AlterTableMixin):
    """A bound analytics-engine session: catalog + functions + dialect."""

    def __init__(
        self,
        spark: SparkSession | None = None,
        sf_dir: str = catalog.DEFAULT_SF_DIR,
        register_tables: bool = True,
        options: dict[str, bool] | None = None,
    ) -> None:
        """`options` mirrors the reference's query options
        (be/src/service/query-options.h); supported:
        appx_count_distinct — rewrite COUNT(DISTINCT x) to the approximate
        ndv (fe/.../rewrite/CountDistinctToNdvRule.java)."""
        self.spark = spark or get_spark()
        self.sf_dir = sf_dir
        self.options = dict(options or {})
        # original (untranslated) CREATE VIEW definitions, keyed by
        # lowercased view name — SHOW CREATE VIEW must render the view's
        # own definition (ShowCreateTableStmt / ToSqlUtils.getCreateViewSql),
        # not a table-shaped DDL reconstruction
        self._view_defs: dict[str, str] = {}
        # UDA names (lowercased) registered with a merge callback: sql()
        # rewrites canonical aggregate statements calling these into the
        # salted two-stage partial/merge plan (hopspark/uda.py)
        self._mergeable_udas: set[str] = set()
        # lazily-built catalog knowledge for the translator's type
        # dispatches (|| on bare boolean columns; string->int cast
        # parse guards); invalidated on view DDL
        self._schema_cols_cache: (
            tuple[
                frozenset[str],
                frozenset[str],
                frozenset[str],
                frozenset[str],
            ]
            | None
        ) = None
        register_all(self.spark)
        if register_tables:
            catalog.register(self.spark, sf_dir)

    # -- query surface ------------------------------------------------------

    _SET_RE = re.compile(r"^\s*SET\s+(\w+)\s*=\s*(\S+)\s*;?\s*$", re.I)
    #: options with engine-side semantics — SET coerces these to bool;
    #: everything else is stored verbatim (accepted no-ops, query-options.h)
    _BOOL_OPTIONS = frozenset(
        {"appx_count_distinct", "utf8_mode", "decimal_v2", "explain_verbose"}
    )
    _COMPUTE_STATS_RE = re.compile(
        r"^\s*COMPUTE\s+STATS\s+(\w+)\s*;?\s*$", re.I
    )
    _COMPUTE_INC_STATS_RE = re.compile(
        r"^\s*COMPUTE\s+INCREMENTAL\s+STATS\s+(\w+)\s*;?\s*$", re.I
    )
    _DROP_STATS_RE = re.compile(
        r"^\s*DROP\s+(INCREMENTAL\s+)?STATS\s+(\w+)\s*;?\s*$", re.I
    )
    _SHOW_STATS_RE = re.compile(
        r"^\s*SHOW\s+(TABLE|COLUMN)\s+STATS\s+(\w+)\s*;?\s*$", re.I
    )
    _REFRESH_RE = re.compile(
        r"^\s*(?:REFRESH\s+(\w+)|INVALIDATE\s+METADATA(?:\s+(\w+))?)\s*;?\s*$",
        re.I,
    )
    _CREATE_VIEW_RE = re.compile(
        r"^\s*(CREATE|ALTER)\s+VIEW\s+(IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s*"
        r"(\([^)]*\))?\s*AS\s+(.*?);?\s*$",
        re.I | re.S,
    )
    _DROP_VIEW_RE = re.compile(
        r"^\s*DROP\s+VIEW\s+(IF\s+EXISTS\s+)?(\w+)\s*;?\s*$", re.I
    )
    _EXPLAIN_RE = re.compile(r"^\s*EXPLAIN\s+(.*?);?\s*$", re.I | re.S)
    _SHOW_FILES_RE = re.compile(
        r"^\s*SHOW\s+FILES\s+IN\s+([\w.]+)\s*;?\s*$", re.I
    )
    _CREATE_JAVA_FN_RE = re.compile(
        r"^\s*CREATE\s+FUNCTION\s+(?:IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s*"
        r"(?:\(([^)]*)\)\s*RETURNS\s+([\w(),]+)\s*)?"
        r"LOCATION\s+'([^']+)'\s+SYMBOL\s*=\s*'([^']+)'\s*;?\s*$",
        re.I,
    )
    _SHOW_PARTITIONS_RE = re.compile(
        r"^\s*SHOW\s+PARTITIONS\s+([\w.]+)\s*;?\s*$", re.I
    )
    _TS_LIT = r"(?:'[^']*'|\d+)"
    _DESCRIBE_HISTORY_RE = re.compile(
        r"^\s*DESCRIBE\s+HISTORY\s+'([^']+)'\s*"
        rf"(?:FROM\s+({_TS_LIT})|BETWEEN\s+({_TS_LIT})\s+AND\s+({_TS_LIT}))?"
        r"\s*;?\s*$",
        re.I,
    )
    _SHOW_CREATE_RE = re.compile(
        r"^\s*SHOW\s+CREATE\s+(TABLE|VIEW)\s+(\w+)\s*;?\s*$", re.I
    )

    def sql(self, impala_sql: str) -> DataFrame:
        """Run an Impala-dialect SQL statement; returns a lazy DataFrame.

        `SET <option>=<value>` statements update engine query options
        (query-options.h parity); `COMPUTE STATS` / `SHOW TABLE|COLUMN
        STATS` run the stats surface; everything else is translated and
        handed to Catalyst."""
        m = re.match(r"^\s*SET\s*;?\s*$", impala_sql, re.I)
        if m:
            # bare SET lists the session's query options (the reference
            # prints every option with its current value)
            rows = [(k, str(v)) for k, v in sorted(self.options.items())]
            return self.spark.createDataFrame(
                rows or [("", "")], "option string, value string"
            ).filter("option <> ''")
        m = self._SET_RE.match(impala_sql)
        if m:
            name, raw = m.group(1).lower(), m.group(2).strip().strip("'\"")
            if name in self._BOOL_OPTIONS:
                self.set_option(
                    name, raw.lower() in ("1", "true", "yes", "on")
                )
            else:
                # non-semantic options (MEM_LIMIT, BATCH_SIZE, …) are
                # accepted and recorded so reference scripts run unchanged;
                # they have no Spark-side effect (documented delta)
                self.options[name] = raw
            return self.spark.sql("SELECT 1 AS ok WHERE false")
        m = self._COMPUTE_INC_STATS_RE.match(impala_sql)
        if m:
            return self.compute_incremental_stats(m.group(1))
        m = self._DROP_STATS_RE.match(impala_sql)
        if m:
            # DROP [INCREMENTAL] STATS (DropStatsStmt): discard cached
            # table/partition statistics so the next COMPUTE starts clean
            t = m.group(2).lower()
            getattr(self, "_stats", {}).pop(t, None)
            getattr(self, "_inc_stats", {}).pop(t, None)
            return self.spark.sql("SELECT 1 AS ok WHERE false")
        m = self._COMPUTE_STATS_RE.match(impala_sql)
        if m:
            return self.compute_stats(m.group(1))
        m = self._SHOW_STATS_RE.match(impala_sql)
        if m:
            if m.group(1).upper() == "TABLE":
                return self.show_table_stats(m.group(2))
            return self.show_column_stats(m.group(2))
        m = self._REFRESH_RE.match(impala_sql)
        if m:
            self.refresh(m.group(1) or m.group(2))
            return self.spark.sql("SELECT 1 AS ok WHERE false")
        m = self._CREATE_VIEW_RE.match(impala_sql)
        if m:
            verb, if_not_exists, name, col_list, body = m.groups()
            # Impala CREATE/ALTER VIEW (sql-parser.cup view DDL). The engine
            # catalog is session-scoped temp views, so views land there too;
            # the body goes through the same dialect translation as queries.
            # Db-qualified names have no home in a temp-view catalog — reject
            # explicitly rather than failing downstream with a parse error.
            if "." in name:
                raise ValueError(
                    f"view name {name!r}: database-qualified views are not "
                    "supported by the session (temp-view) catalog"
                )
            # Spark's catalog is case-insensitive; compare lowercased so
            # IF NOT EXISTS V no-ops against an existing v (Impala
            # analyzer semantics: table/view names are case-insensitive).
            # SHOW TABLES (one round trip) instead of listTables (r13 —
            # listTables builds per-table metadata objects; see
            # _schema_columns_for).
            exists = any(
                r.tableName.lower() == name.lower() and r.isTemporary
                for r in self.spark.sql("SHOW TABLES").collect()
            )
            if verb.upper() == "CREATE" and exists:
                if if_not_exists:
                    return self.spark.sql("SELECT 1 AS ok WHERE false")
                # Impala raises AnalysisException: view already exists
                # (fe CreateViewStmt analysis) — plain CREATE must not
                # silently replace.
                raise ValueError(f"view already exists: {name}")
            body = self._qualify_collection_fields(body)
            body = self._rewrite_table_path_scans(body)
            body = self._rewrite_subplan_derived_tables(body)
            body = self._rewrite_relative_struct_scans(body)
            _b, _s, _t, _d, _bi = self._schema_columns_for(body)
            translated = translate(
                body,
                options=self.options,
                bool_columns=_b,
                string_columns=_s,
                timestamp_columns=_t,
                double_columns=_d,
                bigint_columns=_bi,
            )
            if col_list:
                cols = [c.strip() for c in col_list.strip("()").split(",")]
                if any(not c.isidentifier() for c in cols):
                    raise ValueError(f"bad view column list: {col_list}")
                translated = (
                    f"SELECT * FROM ({translated}) AS "
                    f"hopspark_view_body({', '.join(cols)})"
                )
            self.spark.sql(
                f"CREATE OR REPLACE TEMPORARY VIEW {name} AS " + translated
            )
            body_sql = body.strip()
            if col_list:
                body_sql = f"{col_list.strip()} AS {body_sql}"
            else:
                body_sql = f"AS {body_sql}"
            self._view_defs[name.lower()] = f"CREATE VIEW {name} {body_sql}"
            self._schema_cols_cache = None
            return self.spark.sql("SELECT 1 AS ok WHERE false")
        m = self._DROP_VIEW_RE.match(impala_sql)
        if m:
            if_exists, name = m.groups()
            dropped = self.spark.catalog.dropTempView(name)
            self._view_defs.pop(name.lower(), None)
            self._schema_cols_cache = None
            # Dropping a CATALOG table's view invalidates the session's
            # registration marker, mirroring _replace_view: the next
            # Engine() restores the pristine catalog view (pre-r12
            # behavior) instead of skipping on a stale marker.
            if name.lower() in catalog.SCHEMAS and hasattr(
                self.spark, "_hopspark_tables_registered"
            ):
                self.spark._hopspark_tables_registered = None
            if not dropped and not if_exists:
                raise ValueError(f"view does not exist: {name}")
            return self.spark.sql("SELECT 1 AS ok WHERE false")
        m = self._SHOW_CREATE_RE.match(impala_sql)
        if m:
            # SHOW CREATE TABLE/VIEW (ShowCreateTableStmt): reconstruct the
            # DDL from catalog schema — one row, 'result' column (the HS2
            # shape the reference returns). Temp-view-backed tables get a
            # CREATE EXTERNAL TABLE rendering with Impala type names; views
            # created through this engine get their ORIGINAL CREATE VIEW
            # definition (ToSqlUtils.getCreateViewSql emits the view's own
            # SQL, never a table-shaped DDL).
            name = m.group(2)
            view_def = self._view_defs.get(name.lower())
            if view_def is not None:
                return self.spark.createDataFrame(
                    [(view_def,)], "`result` string"
                )
            if m.group(1).upper() == "VIEW":
                # SHOW CREATE VIEW over a name we did not create as a view:
                # the reference raises for non-view targets
                raise ValueError(f"{name} is not a view")
            fields = self.spark.table(name).schema.fields
            cols = ",\n".join(
                f"  {f.name} {_impala_type_name(f.dataType)}" for f in fields
            )
            ddl = f"CREATE EXTERNAL TABLE {name} (\n{cols}\n) STORED AS PARQUET"
            return self.spark.createDataFrame([(ddl,)], "`result` string")
        m = self._CREATE_JAVA_FN_RE.match(impala_sql)
        if m:
            name, _params, returns, jar, symbol = m.groups()
            self.create_java_function(name, jar, symbol, returns)
            return self.spark.sql("SELECT 1 AS ok WHERE false")
        m = self._SHOW_FILES_RE.match(impala_sql)
        if m:
            return self.show_files(m.group(1))
        m = self._SHOW_PARTITIONS_RE.match(impala_sql)
        if m:
            return self.show_partitions(m.group(1))
        m = self._DESCRIBE_HISTORY_RE.match(impala_sql)
        if m:
            return self.describe_history(
                m.group(1), m.group(2), m.group(3), m.group(4)
            )
        up0 = impala_sql.lstrip()[:8].upper()
        if up0.startswith(
            ("ALTER", "DESCRIBE", "DESC", "COMMENT", "TRUNCATE", "LOAD")
        ):
            out = self.try_alter_or_describe(impala_sql)
            if out is not None:
                return out
        m = self._EXPLAIN_RE.match(impala_sql)
        if m:
            # Impala EXPLAIN returns the plan as rows of 'Explain String'
            # (impala-server HS2 result shape); surface Catalyst's formatted
            # plan the same way.
            lines = self.explain(m.group(1)).splitlines()
            return self.spark.createDataFrame(
                [(ln,) for ln in lines], "`Explain String` string"
            )
        impala_sql = self._qualify_collection_fields(impala_sql)
        impala_sql = self._rewrite_table_path_scans(impala_sql)
        impala_sql = self._rewrite_subplan_derived_tables(impala_sql)
        impala_sql = self._rewrite_relative_struct_scans(impala_sql)
        bools, strs, tss, dbls, bigints = self._schema_columns_for(impala_sql)
        translated = translate(
            impala_sql,
            options=self.options,
            bool_columns=bools,
            string_columns=strs,
            timestamp_columns=tss,
            double_columns=dbls,
            bigint_columns=bigints,
        )
        if self._mergeable_udas and re.search(
            r"\b(" + "|".join(map(re.escape, self._mergeable_udas)) + r")\s*\(",
            translated,
            re.I,
        ):
            from hopspark.uda import rewrite_mergeable_uda

            rewritten = rewrite_mergeable_uda(translated, self._mergeable_udas)
            if rewritten is not None:
                try:
                    return self.spark.sql(rewritten)
                except Exception:  # noqa: BLE001 — fall back to whole-group
                    pass
        return self.spark.sql(translated)

    #: words that may follow a FROM item and are therefore NOT an alias
    _FROM_TAIL_WORDS = frozenset({
        "WHERE", "GROUP", "ORDER", "HAVING", "LIMIT", "OFFSET", "UNION",
        "INTERSECT", "EXCEPT", "JOIN", "ON", "LEFT", "RIGHT", "FULL",
        "INNER", "CROSS", "OUTER", "LATERAL", "USING", "TABLESAMPLE",
        "WINDOW", "QUALIFY",
    })

    #: words never treated as bare element-field references
    _QCF_KEYWORDS = frozenset({
        "SELECT", "FROM", "WHERE", "GROUP", "BY", "ORDER", "HAVING",
        "LIMIT", "OFFSET", "AND", "OR", "NOT", "LIKE", "RLIKE", "ILIKE",
        "BETWEEN", "IN", "EXISTS", "CASE", "WHEN", "THEN", "ELSE", "END",
        "AS", "ON", "JOIN", "LEFT", "RIGHT", "FULL", "INNER", "OUTER",
        "CROSS", "SEMI", "ANTI", "UNION", "ALL", "DISTINCT", "ASC",
        "DESC", "NULLS", "FIRST", "LAST", "IS", "NULL", "TRUE", "FALSE",
        "INTERVAL", "WITH", "USING", "LATERAL", "VIEW", "OVER",
        "PARTITION", "ROWS", "RANGE", "VALUES", "DIV",
    })

    def _qualify_collection_fields(self, impala_sql: str) -> str:
        """Impala resolves a BARE column name against the struct element
        of any collection join item in scope — ``FROM customer c,
        c.c_orders o WHERE o_orderdate < ...`` binds ``o_orderdate`` to
        ``o``'s element (fe Path resolution; the nested TPC-H queries'
        pervasive idiom, tpch_nested-q3.test ff.).  The translate layer
        is schema-blind, so qualify such refs here: a bare word that
        matches exactly ONE same-block collection alias's element field
        (and no flat table column in that block) becomes
        ``alias.`field``."""
        if "." not in impala_sql:
            return impala_sql
        from pyspark.sql import types as T

        from hopspark.dialect.translate import (
            _in_from_clause, _next_code, _prev_code, tokenize, untokenize,
        )

        toks = tokenize(impala_sql)
        # ---- pass 1: FROM/JOIN/comma items -------------------------------
        items = []  # (first_tok_i, segs, alias, last_item_tok_i)
        i = 0
        while i < len(toks):
            t = toks[i]
            trig = (
                (t.kind == "word" and t.upper in ("FROM", "JOIN"))
                or (t.text == "," and _in_from_clause(toks, i))
            )
            if not trig:
                i += 1
                continue
            j = _next_code(toks, i + 1)
            if j >= len(toks) or toks[j].kind != "word":
                i += 1
                continue
            segs = [toks[j].text]
            end = j
            k = _next_code(toks, j + 1)
            while k < len(toks) and toks[k].text == ".":
                nx = _next_code(toks, k + 1)
                if nx >= len(toks) or toks[nx].kind not in ("word", "bquote"):
                    break
                segs.append(toks[nx].text)
                end = nx
                k = _next_code(toks, nx + 1)
            alias = None
            aend = end
            a = _next_code(toks, end + 1)
            if a < len(toks) and toks[a].kind == "word":
                if toks[a].upper == "AS":
                    b = _next_code(toks, a + 1)
                    if b < len(toks) and toks[b].kind == "word":
                        alias, aend = toks[b].text, b
                elif toks[a].upper not in self._FROM_TAIL_WORDS:
                    nxt = _next_code(toks, a + 1)
                    if not (nxt < len(toks)
                            and toks[nxt].text in (".", "(")):
                        alias, aend = toks[a].text, a
            if alias is None:
                alias = segs[-1]
            items.append((j, segs, alias, aend))
            i = aend + 1
        # catalog lookups only pay off when a dotted FROM item exists —
        # flat queries (the vast majority) exit with zero schema calls
        if not any(len(segs) > 1 for _j, segs, _a, _e in items):
            return impala_sql
        # ---- pass 2: resolve aliases to element types --------------------
        tables: set[str] | None = None
        alias_dtype: dict[str, tuple[str, object, tuple]] = {}
        bindings = []  # (alias_as_written, block, fields|None, kind)
        for j, segs, alias, aend in items:
            if tables is None:
                # SHOW TABLES: one round trip (r13; see _schema_columns_for)
                tables = {
                    r.tableName.lower()
                    for r in self.spark.sql("SHOW TABLES").collect()
                }
            root = segs[0].lower()
            blk = self._query_block_bounds(toks, j)
            if len(segs) == 1:
                if root in tables:
                    try:
                        schema = self.spark.table(segs[0]).schema
                    except Exception:  # noqa: BLE001
                        continue
                    alias_dtype[alias.lower()] = ("row", schema, blk)
                    bindings.append((
                        alias, blk,
                        {f.name.lower(): f.name for f in schema.fields},
                        "table",
                    ))
                continue
            base = alias_dtype.get(root)
            from_alias = base is not None
            if base is None and root in tables:
                try:
                    base = ("row", self.spark.table(segs[0]).schema, blk)
                except Exception:  # noqa: BLE001
                    base = None
            if base is None:
                continue
            if from_alias and base[2] != blk:
                # a subquery FROM rooted at an OUTER alias (table OR
                # collection) is a correlated SUBPLAN target — its own
                # rewrite resolves bare element fields; qualifying them
                # here would defeat the lambda substitution
                continue
            cur: object = base[1]
            ok = True
            for seg in segs[1:]:
                sl = seg.lower()
                if isinstance(cur, T.StructType):
                    fld = next(
                        (f for f in cur.fields
                         if f.name.lower() == sl), None,
                    )
                    if fld is None:
                        ok = False
                        break
                    cur = fld.dataType
                elif isinstance(cur, T.ArrayType):
                    el = cur.elementType
                    if sl == "item":
                        cur = el
                    elif isinstance(el, T.StructType):
                        fld = next(
                            (f for f in el.fields
                             if f.name.lower() == sl), None,
                        )
                        if fld is None:
                            ok = False
                            break
                        cur = fld.dataType
                    else:
                        ok = False
                        break
                elif isinstance(cur, T.MapType):
                    if sl == "value":
                        cur = cur.valueType
                    elif sl == "key":
                        cur = cur.keyType
                    else:
                        ok = False
                        break
                else:
                    ok = False
                    break
            if not ok:
                continue
            if isinstance(cur, T.ArrayType):
                el = cur.elementType
                alias_dtype[alias.lower()] = ("elem", el, blk)
                flds = (
                    {f.name.lower(): f.name for f in el.fields}
                    if isinstance(el, T.StructType) else None
                )
                bindings.append((alias, blk, flds, "elem"))
            elif isinstance(cur, T.MapType):
                alias_dtype[alias.lower()] = ("elem", cur.valueType, blk)
        # ---- pass 3: qualify bare field refs -----------------------------
        elem_binds = [
            (alias, blk, flds) for alias, blk, flds, kind in bindings
            if kind == "elem" and flds
        ]
        flat_binds = [
            (blk, flds) for _a, blk, flds, kind in bindings
            if kind == "table" and flds
        ]
        if not elem_binds:
            return impala_sql
        item_idx: set[int] = set()
        for j, segs, alias, aend in items:
            item_idx.update(range(j, aend + 1))
        repls = []  # (tok index, alias, field)
        oh_cache: dict = {}  # block -> (order/having spans, out aliases)
        for m, tk in enumerate(toks):
            if m in item_idx or tk.kind != "word":
                continue
            if tk.upper in self._QCF_KEYWORDS:
                continue
            lo = tk.text.lower()
            p = _prev_code(toks, m - 1)
            if p >= 0 and toks[p].text == ".":
                continue
            # alias position, not a reference: the previous code token
            # ENDS an expression (AS keyword, a close paren, a literal —
            # including string/backtick literals: `SELECT 'x' o_comment`
            # — or a non-keyword word, `CAST(x AS DOUBLE) o_totalprice`)
            if p >= 0 and (
                toks[p].text == ")"
                or toks[p].kind in ("num", "str", "bquote")
                or (toks[p].kind == "word"
                    and toks[p].upper == "AS")
                or (toks[p].kind == "word"
                    and toks[p].upper not in self._QCF_KEYWORDS
                    and toks[p].upper not in ("BY",))
            ):
                continue
            n = _next_code(toks, m + 1)
            if n < len(toks) and toks[n].text in (".", "("):
                continue
            # visible candidates: binding block CONTAINS the token
            # (correlated refs to outer collection aliases included);
            # innermost block wins, ambiguity at that level -> skip
            cands = [
                (alias, blk, flds[lo])
                for alias, blk, flds in elem_binds
                if lo in flds and blk[0] <= m < blk[1]
            ]
            if not cands:
                continue
            best = max(blk[0] for _a, blk, _o in cands)
            inner = [
                (a, o) for a, blk, o in cands if blk[0] == best
            ]
            if len({a.lower() for a, _o in inner}) != 1:
                continue
            # a flat table column at the same or inner scope shadows
            if any(
                lo in flds and blk[0] <= m < blk[1] and blk[0] >= best
                for blk, flds in flat_binds
            ):
                continue
            # a select-list OUTPUT alias shadows the element field in
            # ORDER BY / HAVING (Impala analyzer: output names take
            # precedence there — `SELECT o_orderkey AS o_comment ...
            # ORDER BY o_comment` sorts by the alias, not the field)
            mblk = self._query_block_bounds(toks, m)
            if mblk not in oh_cache:
                oh_cache[mblk] = (
                    self._order_having_spans(toks, mblk),
                    self._select_output_aliases(toks, mblk),
                )
            oh_spans, out_aliases = oh_cache[mblk]
            if lo in out_aliases and any(
                a <= m < b for a, b in oh_spans
            ):
                continue
            repls.append((m, inner[0][0], inner[0][1]))
        if not repls:
            return impala_sql
        # plain identifiers (no backticks): the translate layer's
        # collection-join scans match word tokens only
        for m, alias, orig in reversed(repls):
            toks[m : m + 1] = tokenize(f"{alias}.{orig}")
        return untokenize(toks)

    def _rewrite_table_path_scans(self, impala_sql: str) -> str:
        """Rootless collection scans — the reference idiom ``FROM
        tbl.arr_col`` (nested-types-scanner-*.test; fe Path.java
        resolution): a FROM/JOIN item whose dotted path starts at a
        CATALOG TABLE and ends at a collection scans the collection
        itself — one row per element, parent columns invisible, empty/
        NULL collections contribute no rows.  Rewritten to an inline
        LATERAL VIEW subquery before dialect translation.

        Path grammar: struct fields navigate; ``item`` descends into an
        array (a path may also END at an array, scanning its elements);
        the terminal must be a collection or an array element.  ``SELECT
        *`` exposes the element (struct fields flattened, scalar as
        ``item``, map as key/value) — ``pos``, and ``item`` on struct
        elements, are virtual and exposed only when the statement
        mentions them (matching their absence from the reference's
        ``*``)."""
        if "." not in impala_sql:
            return impala_sql
        from hopspark.dialect.translate import (
            _is_code, _next_code, _prev_code, tokenize, untokenize,
        )

        from hopspark.dialect.translate import _in_from_clause

        toks = tokenize(impala_sql)
        tables: set[str] | None = None
        changed = False
        i = 0
        while i < len(toks):
            t = toks[i]
            if not (
                (t.kind == "word" and t.upper in ("FROM", "JOIN"))
                or (t.text == "," and _in_from_clause(toks, i))
            ):
                i += 1
                continue
            j = _next_code(toks, i + 1)
            if j >= len(toks) or toks[j].kind != "word":
                i += 1
                continue
            segs = [toks[j].text]
            end = j
            k = _next_code(toks, j + 1)
            while k < len(toks) and toks[k].text == ".":
                nx = _next_code(toks, k + 1)
                if nx >= len(toks) or toks[nx].kind != "word":
                    break
                segs.append(toks[nx].text)
                end = nx
                k = _next_code(toks, nx + 1)
            if len(segs) < 2:
                i = j + 1
                continue
            if tables is None:
                # SHOW TABLES: one round trip (r13; see _schema_columns_for)
                tables = {
                    r.tableName.lower()
                    for r in self.spark.sql("SHOW TABLES").collect()
                }
            if segs[0].lower() not in tables:
                i = j + 1
                continue
            # Impala Path resolution prefers an ENCLOSING query block's
            # table alias over the catalog: a path inside a subquery
            # whose head names an UNALIASED outer FROM item is a
            # correlated relative ref (the table name doubles as its
            # implicit alias), not a rootless scan — leave it for
            # _rewrite_subplan_derived_tables.  An aliased outer item
            # (FROM cust x) forfeits the name, so the path stays
            # rootless.
            depth_j = sum(
                1 if t2.text == "(" else -1 if t2.text == ")" else 0
                for t2 in toks[:j]
            )
            if depth_j > 0 and self._bare_from_item_elsewhere(
                toks, segs[0], j
            ):
                i = j + 1
                continue
            # optional [AS] alias after the path (parsed BEFORE the
            # virtual-column scan: qualified pos/item refs must match
            # THIS path's alias, not any column named pos/item on an
            # unrelated joined table)
            a = _next_code(toks, end + 1)
            alias = None
            consumed_to = end
            if (
                a < len(toks)
                and toks[a].kind == "word"
                and toks[a].upper == "AS"
            ):
                b = _next_code(toks, a + 1)
                if b < len(toks) and toks[b].kind == "word":
                    alias = toks[b].text
                    consumed_to = b
            elif (
                a < len(toks)
                and toks[a].kind == "word"
                and toks[a].upper not in self._FROM_TAIL_WORDS
            ):
                alias = toks[a].text
                consumed_to = a
            if alias is None:
                alias = segs[-1]
            # item/pos are virtual: exposed only when referenced OUTSIDE
            # this path's own segments (the path `...d.item` itself must
            # not leak `item` into SELECT *), and only when the reference
            # is unqualified or qualified by this path's alias — a
            # `x.pos` on a joined table x is NOT a mention
            path_idx = set(range(j, consumed_to + 1))

            def _mentions(word: str) -> bool:
                for x, tk in enumerate(toks):
                    if (
                        tk.kind != "word"
                        or tk.text.lower() != word
                        or x in path_idx
                    ):
                        continue
                    pq = _prev_code(toks, x - 1)
                    if pq >= 0 and toks[pq].text == ".":
                        pq2 = _prev_code(toks, pq - 1)
                        if (
                            pq2 < 0
                            or toks[pq2].kind != "word"
                            or toks[pq2].text.lower() != alias.lower()
                        ):
                            continue  # qualified by some OTHER name
                    return True
                return False

            want_item = _mentions("item")
            want_pos = _mentions("pos")
            res = self._table_path_subquery(segs, want_pos, want_item)
            if res is None:
                i = j + 1
                continue
            sub, star_cols, has_virtual = res
            if has_virtual and star_cols:
                delta = self._expand_table_path_stars(
                    toks, i, alias, star_cols
                )
                j += delta
                consumed_to += delta
            repl = tokenize(f"{sub} {alias}")
            toks[j : consumed_to + 1] = repl
            changed = True
            i = j + len(repl)
        return untokenize(toks) if changed else impala_sql

    def _bare_from_item_elsewhere(
        self, toks, name: str, skip_i: int
    ) -> bool:
        """True when ``name`` appears somewhere else in the statement as
        an UNALIASED FROM/JOIN item (``FROM name`` / ``JOIN name`` /
        ``, name`` with no dot and no alias after it) — i.e. its table
        name is live as an implicit correlation alias."""
        from hopspark.dialect.translate import _next_code, _prev_code

        low = name.lower()
        for w, t in enumerate(toks):
            if (
                w == skip_i
                or t.kind != "word"
                or t.text.lower() != low
            ):
                continue
            p = _prev_code(toks, w - 1)
            if p < 0 or not (
                toks[p].text == ","
                or (toks[p].kind == "word"
                    and toks[p].upper in ("FROM", "JOIN"))
            ):
                continue
            nx = _next_code(toks, w + 1)
            if nx < len(toks):
                t2 = toks[nx]
                if t2.text == ".":
                    continue  # dotted: a path, not a bare item
                if t2.kind == "word" and t2.upper not in (
                    self._FROM_TAIL_WORDS | {"AS"}
                ):
                    continue  # aliased: the name is forfeited
                if t2.kind == "word" and t2.upper == "AS":
                    continue  # aliased
            return True
        return False

    def _expand_table_path_stars(
        self, toks, from_i: int, alias: str, star_cols: list[str]
    ) -> int:
        """The reference's ``*`` never includes the virtual columns
        (``pos``, ``item`` on struct elements) even when the statement
        references them elsewhere — but the rewritten subquery must
        expose them for qualified refs to resolve.  Reconcile by
        expanding ``alias.*`` (and a lone bare ``*`` when this path is
        the only FROM item) in the OWNING select list to the explicit
        non-virtual columns.  A bare ``*`` over a multi-item FROM is
        left alone (expanding it needs every sibling's schema).
        Returns the net token-count delta (every edit sits before
        ``from_i``, so the caller shifts its saved indices by it)."""
        from hopspark.dialect.translate import _prev_code, tokenize

        # owning SELECT: nearest SELECT before from_i at the same depth
        sel_i = -1
        depth = 0
        for x in range(from_i - 1, -1, -1):
            t = toks[x]
            if t.text == ")":
                depth += 1
            elif t.text == "(":
                depth -= 1
                if depth < 0:
                    break
            elif depth == 0 and t.kind == "word" and t.upper == "SELECT":
                sel_i = x
                break
        if sel_i < 0:
            return 0
        # single-item FROM? a comma/JOIN trigger always has a preceding
        # sibling (the forward scan below would never see it), so only a
        # literal FROM can open a single-item list; then scan forward
        # from from_i at depth 0 until a clause keyword — a comma or
        # JOIN means multiple items
        single = toks[from_i].kind == "word" and toks[from_i].upper == "FROM"
        depth = 0
        for x in range(from_i + 1, len(toks)):
            t = toks[x]
            if t.text == "(":
                depth += 1
            elif t.text == ")":
                depth -= 1
                if depth < 0:
                    break
            elif depth == 0:
                if t.text == "," or (t.kind == "word" and t.upper == "JOIN"):
                    single = False
                    break
                if t.kind == "word" and t.upper in (
                    "WHERE", "GROUP", "ORDER", "HAVING", "LIMIT",
                    "OFFSET", "UNION", "INTERSECT", "EXCEPT",
                ):
                    break
        qcols = ", ".join(f"{alias}.`{c}`" for c in star_cols)
        delta = 0
        # walk the select list (sel_i..from_i) for stars at depth 0
        x = sel_i + 1
        while x < from_i + delta:
            t = toks[x]
            if t.text == "(":
                d = 1
                x += 1
                while x < from_i + delta and d:
                    if toks[x].text == "(":
                        d += 1
                    elif toks[x].text == ")":
                        d -= 1
                    x += 1
                continue
            if t.text == "*":
                p = _prev_code(toks, x - 1)
                if p >= 0 and toks[p].text == ".":
                    p2 = _prev_code(toks, p - 1)
                    if (
                        p2 >= 0
                        and toks[p2].kind == "word"
                        and toks[p2].text.lower() == alias.lower()
                    ):
                        repl = tokenize(qcols)
                        toks[p2 : x + 1] = repl
                        delta += len(repl) - (x + 1 - p2)
                        x = p2 + len(repl)
                        continue
                elif single and (
                    p < 0
                    or toks[p].text in (",",)
                    or (toks[p].kind == "word"
                        and toks[p].upper in ("SELECT", "DISTINCT", "ALL"))
                ):
                    repl = tokenize(qcols)
                    toks[x : x + 1] = repl
                    delta += len(repl) - 1
                    x += len(repl)
                    continue
            x += 1
        return delta

    def _rewrite_subplan_derived_tables(self, impala_sql: str) -> str:
        """Impala subplans — a correlated subquery over a RELATIVE
        collection (nested-types-subplan.test, planner SubplanNode):

        * derived table: ``FROM customer c, (SELECT * FROM c.c_orders
          LIMIT 3) v`` — Impala correlates implicitly; Spark needs the
          LATERAL keyword, with the collection exploded inside.  LIMIT
          stays per-outer-row, like the reference's subplan limit.
        * expression subqueries: ``WHERE EXISTS (SELECT 1 FROM c.c_orders
          o WHERE ...)``, ``ok IN (SELECT ...)``, scalar ``(SELECT
          COUNT(*) FROM c.c_orders)`` — Spark's correlated subqueries
          accept an outer reference inside a generator directly, so only
          the FROM target is rewritten.

        Rewrites ``FROM <alias>.<path>`` inside any such subquery to
        ``FROM (SELECT <generator>) __sp`` where <generator> is inline()
        for array<struct> (element fields, matching the reference's ``*``
        on a subplan), explode()/posexplode() AS item[/pos] for scalar
        arrays, explode() for maps (key/value).  Needs the live schema
        for the generator choice, hence engine-side."""
        if "(" not in impala_sql or "." not in impala_sql:
            return impala_sql
        from pyspark.sql import types as T

        from hopspark.dialect.translate import (
            Tok, _in_from_clause, _matching_paren, _next_code,
            _prev_code, tokenize, untokenize,
        )

        toks = tokenize(impala_sql)
        changed = False
        # (alias, root) pairs already checked by the decorrelation-
        # landmine guard this statement — checked-safe or normalized
        guarded: set = set()
        i = 0
        while i < len(toks):
            if toks[i].text != "(":
                i += 1
                continue
            o = i
            first = _next_code(toks, o + 1)
            if first >= len(toks) or toks[first].upper != "SELECT":
                i += 1
                continue
            try:
                close = _matching_paren(toks, o)
            except ValueError:
                break
            # depth-1 FROMs inside the subquery: more than one when the
            # body is a UNION of legs — take the FIRST whose target is a
            # rewritable dotted path (an already-rewritten leg's target
            # is a paren and parses as nothing).  A correlated relative
            # ref inside a WITH body (IMPALA-2414,
            # nested-types-with-clause.test) is reached naturally: the
            # CTE body is itself a `( SELECT` block and rewrites in
            # place — only the ENCLOSING derived table then needs the
            # LATERAL keyword (added below).
            depth = 0
            from_is: list[int] = []
            for k in range(o, close):
                if toks[k].text == "(":
                    depth += 1
                elif toks[k].text == ")":
                    depth -= 1
                elif depth == 1 and (
                    (toks[k].kind == "word" and toks[k].upper == "FROM")
                    or (toks[k].text == ","
                        and _in_from_clause(toks, k))
                ):
                    # comma items too: a JOIN of two relative refs inside
                    # one subplan (nested-types-subplan.test's hash-join
                    # row) needs EVERY item rewritten
                    from_is.append(k)
            segs: list[str] = []
            from_i = end = -1
            for fi in from_is:
                q = _next_code(toks, fi + 1)
                if q >= len(toks) or toks[q].kind != "word":
                    continue
                cand_segs = [toks[q].text]
                cand_end = q
                k = _next_code(toks, q + 1)
                while k < close and toks[k].text == ".":
                    nx = _next_code(toks, k + 1)
                    if nx >= close or toks[nx].kind != "word":
                        break
                    cand_segs.append(toks[nx].text)
                    cand_end = nx
                    k = _next_code(toks, nx + 1)
                if len(cand_segs) < 2:
                    continue
                if toks[fi].text == ",":
                    # a comma item whose root is bound by an EARLIER
                    # SIBLING of the same FROM clause is a plain
                    # collection join (the translate layer's job), not a
                    # correlated subplan target — only roots bound
                    # OUTSIDE the subquery qualify (the hash-join-inside-
                    # subplan row of nested-types-subplan.test)
                    own_from = max(
                        (f2 for f2 in from_is
                         if f2 < fi and toks[f2].kind == "word"),
                        default=-1,
                    )
                    bound_inside = False
                    root_low = cand_segs[0].lower()
                    for w2 in range(own_from + 1, fi):
                        t2 = toks[w2]
                        if (
                            t2.kind == "word"
                            and t2.text.lower() == root_low
                        ):
                            n2 = _next_code(toks, w2 + 1)
                            if not (n2 < len(toks)
                                    and toks[n2].text == "."):
                                bound_inside = True
                                break
                    if bound_inside:
                        continue
                from_i, end, segs = fi, cand_end, cand_segs
                break
            if from_i < 0:
                i += 1
                continue
            # resolve the qualifier: every statement position where the
            # alias word follows another word (skipping AS) names a
            # candidate table — the schema walk below arbitrates.  The
            # binding FROM item may sit before (WHERE/derived-table
            # context) or after (select-list scalar subquery) this point.
            alias = segs[0].lower()
            ranked: list[tuple[int, str]] = []
            for w_i, tw in enumerate(toks):
                if tw.kind != "word" or tw.text.lower() != alias:
                    continue
                p = _prev_code(toks, w_i - 1)
                if p >= 0 and toks[p].kind == "word":
                    cand_i = p
                    cand = toks[p].text
                    if cand.upper() == "AS":
                        p2 = _prev_code(toks, p - 1)
                        if p2 < 0 or toks[p2].kind != "word":
                            continue
                        cand_i = p2
                        cand = toks[p2].text
                    if cand.lower() != alias:
                        # candidates that are themselves FROM/JOIN items
                        # outrank arbitrary statement positions (a
                        # same-named alias in an unrelated scope must not
                        # shadow the lexically-binding table)
                        pb = _prev_code(toks, cand_i - 1)
                        in_from = pb >= 0 and (
                            toks[pb].text == ","
                            or (toks[pb].kind == "word"
                                and toks[pb].upper in ("FROM", "JOIN"))
                        )
                        ranked.append((0 if in_from else 1, cand))
            # the qualifier word itself may BE the table (unaliased:
            # FROM customer, (SELECT * FROM customer.c_orders) v)
            ranked.append((2, segs[0]))
            ranked.sort(key=lambda rc: rc[0])
            candidates = [c for _, c in ranked]
            res = self._resolve_subplan_target(toks, segs, candidates)
            if res is None:
                i += 1
                continue
            qpath, coll_dt, root_info = res
            # Catalyst REJECTS map-typed correlated column references
            # outright ("Correlated column reference ... cannot be map
            # type").  When the subplan path roots at a top-level MAP
            # column (t.map_map_col.value — with-clause.test#4), wrap
            # the binding FROM item so the correlated ref is the
            # pre-computed map_entries ARRAY instead, then re-resolve.
            mw = self._map_root_wrap(toks, segs, root_info, qpath)
            if mw is not None:
                if mw[0] == "respan":
                    for s0, s1, w_txt in sorted(mw[1], reverse=True):
                        toks[s0:s1] = tokenize(w_txt)
                    changed = True
                    i = 0
                    continue
                qpath = mw[1]
            gen = None
            if isinstance(coll_dt, T.ArrayType):
                if isinstance(coll_dt.elementType, T.MapType) and re.search(
                    r"\bkey\b|\bvalue\b",
                    untokenize(toks[o:close]).lower(),
                ) and not re.search(
                    r"\bitem\b|\bpos\b", untokenize(toks[o:close]).lower()
                ):
                    # a COLLECTION OF MAPS (`t.map_map_col.value` — the
                    # outer map's values are maps) scans every inner
                    # map's ENTRIES (nested-types-with-clause.test#4);
                    # flatten one entries level so key/value resolve
                    gen = (
                        "SELECT inline(flatten(transform("
                        f"{qpath}, __mm -> map_entries(__mm))))"
                    )
                elif isinstance(coll_dt.elementType, T.StructType):
                    gen = f"SELECT inline({qpath})"
                else:
                    body = untokenize(toks[o:close]).lower()
                    if re.search(r"\bpos\b", body):
                        # pos is BIGINT in the reference; posexplode
                        # yields INT
                        gen = (
                            "SELECT CAST(__spp AS BIGINT) AS pos,"
                            " __spi AS item FROM (SELECT"
                            f" posexplode({qpath})"
                            " AS (__spp, __spi))"
                        )
                    else:
                        gen = f"SELECT explode({qpath}) AS item"
            elif isinstance(coll_dt, T.MapType):
                gen = f"SELECT explode({qpath})"  # key, value
            if gen is None:
                i += 1
                continue
            # LATERAL derived table whose select list is a single
            # aggregate — (SELECT COUNT(*)/SUM(x)/... AS n FROM c.path
            # [WHERE pred]) v — lowers to an inline HOF expression: the
            # derived table disappears and refs to its output name
            # substitute (the reference's per-row subplan agg; keeping
            # the derived table would take Catalyst's array-keyed
            # decorrelated join, which Spark REJECTS for correlated
            # array-typed refs in several shapes).
            if (
                from_i == from_is[0]
                and toks[first].upper != "WITH"
                and self._subplan_lateral_agg(
                    toks, o, close, first, from_i, qpath, coll_dt
                )
            ):
                changed = True
                i = 0  # spans shifted: rescan
                continue
            # a derived table (comma FROM item) needs the LATERAL keyword;
            # expression subqueries (EXISTS/IN/scalar) must NOT get it
            p = _prev_code(toks, o - 1)
            lateral = p >= 0 and (
                (toks[p].text == "," and _in_from_clause(toks, p))
                or (toks[p].kind == "word" and toks[p].upper == "JOIN")
            )
            # a CTE body (`WITH w AS (<this block>)`) correlates through
            # its ENCLOSING derived table — that is where Spark wants
            # the LATERAL keyword
            enclose_lateral = None
            if (
                p >= 0 and toks[p].kind == "word"
                and toks[p].upper == "AS"
            ):
                # walk OUTWARD through nested CTE-body parens (`WITH w1
                # AS (WITH w2 AS (<block>) ...)`) to the derived table
                start_x = o
                while True:
                    bal2 = 0
                    open_x = -1
                    for x in range(start_x - 1, -1, -1):
                        if toks[x].text == ")":
                            bal2 += 1
                        elif toks[x].text == "(":
                            if bal2 == 0:
                                open_x = x
                                break
                            bal2 -= 1
                    if open_x < 0:
                        break
                    pe2 = _prev_code(toks, open_x - 1)
                    if pe2 >= 0 and (
                        (toks[pe2].text == ","
                         and _in_from_clause(toks, pe2))
                        or (toks[pe2].kind == "word"
                            and toks[pe2].upper == "JOIN")
                    ):
                        enclose_lateral = open_x
                        break
                    if (
                        pe2 >= 0 and toks[pe2].kind == "word"
                        and toks[pe2].upper == "AS"
                    ):
                        start_x = open_x
                        continue
                    break
            # a collection alias after the path (FROM c.c_orders o)
            # becomes the exploded subquery's alias
            sp_alias = "__sp"
            tail_from = end + 1
            a2 = _next_code(toks, end + 1)
            if a2 < close and toks[a2].kind == "word":
                u2 = toks[a2].upper
                if u2 == "AS":
                    a3 = _next_code(toks, a2 + 1)
                    if a3 < close and toks[a3].kind == "word":
                        sp_alias = toks[a3].text
                        tail_from = a3 + 1
                elif u2 not in self._FROM_TAIL_WORDS and u2 not in (
                    "WHEN", "AND", "OR",
                ):
                    sp_alias = toks[a2].text
                    tail_from = a2 + 1
            t1 = None if (
                from_i != from_is[0] or toks[first].upper == "WITH"
            ) else self._subplan_fast_path(
                toks, o, close, first, from_i, tail_from,
                None if sp_alias == "__sp" else sp_alias,
                qpath, coll_dt, p, lateral,
            )
            if t1 is not None:
                start, stop, text = t1
                repl = tokenize(text)
                toks[start:stop] = repl
                changed = True
                i = start
                continue
            # GENERAL path: Catalyst decorrelates this subquery into a
            # join KEYED ON the collection, re-executing the outer plan
            # on both sides (SCALE.md round-11 session 2).  If the
            # collection's order is not deterministic (collect_list /
            # collect_set upstream), the two sides disagree and the join
            # silently matches NOTHING — normalize the OUTER relation's
            # collection column (deep sort_array) before rewriting, or
            # raise when normalization is impossible.
            g_spans = self._nondet_guard_spans(
                toks, segs, root_info, guarded
            )
            if g_spans:
                for g0, g1, g_txt in sorted(g_spans, reverse=True):
                    toks[g0:g1] = tokenize(g_txt)
                changed = True
                i = 0  # spans shifted: rescan from the top
                continue
            sub_text = untokenize(toks[o + 1 : from_i])
            tail = untokenize(toks[tail_from:close])
            kw = " LATERAL " if lateral else " "
            joiner = "," if toks[from_i].text == "," else "FROM"
            repl = tokenize(
                f"{kw}({sub_text}{joiner} ({gen}) {sp_alias}{tail})"
            )
            toks[o : close + 1] = repl
            if enclose_lateral is not None:
                toks[enclose_lateral:enclose_lateral] = [
                    Tok("synth", " LATERAL ")
                ]
            changed = True
            # re-scan from the replacement start: sibling subqueries
            # inside the rewritten block may also need the rewrite; the
            # block itself no longer matches (its FROM target is a paren)
            i = o
        return untokenize(toks) if changed else impala_sql

    def _subplan_fast_path(
        self, toks, o, close, first, from_i, tail_from, salias,
        qpath, coll_dt, p, lateral,
    ):
        """Zero-join lowering for the common subplan shapes.  Catalyst
        decorrelates a LATERAL / expression subquery over a relative
        collection into a join KEYED ON THE ARRAY ITSELF — correct, but at
        scale it broadcasts whole collections as join keys and scans the
        parent twice.  These shapes stay on ONE scan with higher-order
        functions instead (whole-stage codegen, no join, no extra
        shuffle):

          * ``EXISTS (SELECT ... FROM c.path [x] [WHERE pred])``
            -> ``coalesce(exists(c.path, x -> pred), false)``
          * ``, (SELECT * FROM c.path [x] [WHERE pred] [LIMIT n]) v``
            -> ``LATERAL VIEW inline/explode(slice(filter(c.path,..),1,n))``

        Returns (start, stop, replacement_sql) or None to take the
        general decorrelated path."""
        from pyspark.sql import types as T

        from hopspark.dialect.translate import (
            _is_code, _next_code, untokenize,
        )

        if isinstance(coll_dt, T.MapType):
            # a MAP subplan target exposes key/value (MapType.java);
            # lower onto map_entries() so the array machinery below
            # applies unchanged — Catalyst REJECTS map-typed correlated
            # refs outright, so this is the only plan for these shapes
            # (r10 verdict item 6, nested-types-scanner-maps.test)
            qpath = f"map_entries({qpath})"
            coll_dt = T.ArrayType(T.StructType([
                T.StructField("key", coll_dt.keyType),
                T.StructField("value", coll_dt.valueType),
            ]))
        if (
            isinstance(coll_dt, T.ArrayType)
            and isinstance(coll_dt.elementType, T.MapType)
        ):
            # a path landing on a COLLECTION OF MAPS (`t.map_map_col
            # .value` — the outer map's values are maps) scans every
            # inner map's ENTRIES, parent-correlated
            # (nested-types-with-clause.test#4's correlated WITH view);
            # flatten one entries level so key/value resolve.  Bare
            # item/pos refs keep the element-as-map reading — but maps
            # are not materializable columns, so key/value is the only
            # shape the reference accepts here.
            body_txt = untokenize(toks[o + 1 : close])
            if re.search(r"\b(key|value)\b", body_txt, re.I) and not (
                re.search(r"\b(item|pos)\b", body_txt, re.I)
            ):
                mt = coll_dt.elementType
                qpath = (
                    f"flatten(transform({qpath},"
                    f" __mm -> map_entries(__mm)))"
                )
                coll_dt = T.ArrayType(T.StructType([
                    T.StructField("key", mt.keyType),
                    T.StructField("value", mt.valueType),
                ]))
        if not isinstance(coll_dt, T.ArrayType):
            return None
        elem = coll_dt.elementType
        fields = (
            [f.name for f in elem.fields]
            if isinstance(elem, T.StructType) else None
        )
        # depth-1 clause keyword positions after the FROM target
        depth = 0
        clauses: dict[str, int] = {}
        for k in range(o, close):
            tk = toks[k]
            if tk.text == "(":
                depth += 1
            elif tk.text == ")":
                depth -= 1
            elif depth == 1 and tk.kind == "word" and k >= tail_from:
                u = tk.upper
                if u in ("WHERE", "LIMIT", "GROUP", "ORDER", "HAVING",
                         "UNION", "QUALIFY"):
                    clauses.setdefault(u, k)
        if {"GROUP", "ORDER", "HAVING", "UNION", "QUALIFY"} & set(clauses):
            return None
        pred_sql = None
        if "WHERE" in clauses:
            stop_at = clauses.get("LIMIT", close)
            pred_toks = toks[clauses["WHERE"] + 1 : stop_at]
            body = untokenize(pred_toks)
            if re.search(r"\bselect\b|\bpos\b", body, re.I):
                return None  # nested subquery / pos: general path
            pred_sql = self._subplan_lambda_pred(
                pred_toks, fields, salias, "__sx"
            )
            if pred_sql is None:
                return None
        limit_n = None
        if "LIMIT" in clauses:
            ln = _next_code(toks, clauses["LIMIT"] + 1)
            if (
                ln >= close
                or toks[ln].kind != "num"
                or not toks[ln].text.isdigit()
            ):
                return None
            limit_n = int(toks[ln].text)
            if _next_code(toks, ln + 1) < close:
                return None
        arr = qpath
        if pred_sql:
            arr = f"filter({arr}, __sx -> ({pred_sql}))"
        if p >= 0 and toks[p].kind == "word" and toks[p].upper == "EXISTS":
            cond = pred_sql or "true"
            return (
                p, close + 1,
                f" coalesce(exists({qpath}, __sx -> ({cond})), false) ",
            )
        if not lateral:
            # scalar aggregate subquery — (SELECT COUNT(*)/SUM/MIN/MAX/
            # AVG(col) FROM c.path [WHERE pred]) — the reference's most
            # common subplan idiom after EXISTS (nested-types-subplan
            # .test; SubplanNode streams it per outer row).  Lower to a
            # higher-order function on the parent scan: zero joins, one
            # scan, whole-stage codegen.
            if limit_n is None:
                agg = self._subplan_agg_expr(
                    toks, first, from_i, elem, fields, salias,
                    qpath, pred_sql,
                )
                if agg is not None:
                    return o, close + 1, f" ({agg}) "
            return None
        sel = "".join(
            t.text for t in toks[first + 1 : from_i] if _is_code(t)
        ).lower()
        if not (sel == "*" or (salias and sel == f"{salias.lower()}.*")):
            return None
        if limit_n is not None:
            arr = f"slice({arr}, 1, {limit_n})"
        oa = _next_code(toks, close + 1)
        stop = close + 1
        valias = None
        if oa < len(toks) and toks[oa].kind == "word":
            u = toks[oa].upper
            if u == "AS":
                ob = _next_code(toks, oa + 1)
                if ob < len(toks) and toks[ob].kind == "word":
                    valias = toks[ob].text
                    stop = ob + 1
            elif u not in self._FROM_TAIL_WORDS:
                valias = toks[oa].text
                stop = oa + 1
        if valias is None:
            valias = "__spv"
        if fields is not None:
            cols = ", ".join(f"`{f}`" for f in fields)
            text = f" LATERAL VIEW inline({arr}) {valias} AS {cols} "
        else:
            text = f" LATERAL VIEW explode({arr}) {valias} AS item "
        return p, stop, text  # p = the comma: consumed by LATERAL VIEW

    def _rewrite_relative_struct_scans(self, impala_sql: str) -> str:
        """Schema-aware rewrite for UNALIASED relative collection items
        whose element is a STRUCT and whose fields are referenced BARE —
        ``FROM complextypestbl t, t.nested_struct.c.d.item`` then
        ``select id, e, f`` (nested-types-scanner-array-materialization
        .test).  The translate layer's blind collection join cannot know
        the element fields, so it cannot expose them; here the alias's
        table schema resolves the element type and the item lowers to
        ``LATERAL VIEW inline(<collection expr>)``, whose output columns
        ARE the struct fields."""
        if "." not in impala_sql or "," not in impala_sql:
            return impala_sql
        from pyspark.sql import types as T

        from hopspark.dialect.translate import (
            _in_from_clause, _next_code, _prev_code, tokenize, untokenize,
        )

        toks = tokenize(impala_sql)
        changed = False
        i = 0
        while i < len(toks):
            t = toks[i]
            if not (t.text == "," and _in_from_clause(toks, i)):
                i += 1
                continue
            q = _next_code(toks, i + 1)
            if q >= len(toks) or toks[q].kind != "word":
                i += 1
                continue
            segs = [toks[q].text]
            end = q
            k = _next_code(toks, q + 1)
            while k < len(toks) and toks[k].text == ".":
                nx = _next_code(toks, k + 1)
                if nx >= len(toks) or toks[nx].kind != "word":
                    break
                segs.append(toks[nx].text)
                end = nx
                k = _next_code(toks, nx + 1)
            if len(segs) < 3:  # needs at least alias.field.item depth
                i += 1
                continue
            # must be UNALIASED (an explicit alias goes through the
            # translate-layer join, which handles qualified refs)
            a = _next_code(toks, end + 1)
            if (
                a < len(toks)
                and toks[a].kind == "word"
                and toks[a].upper not in self._FROM_TAIL_WORDS
            ):
                i += 1
                continue
            table = self._alias_table_name(toks, segs[0])
            if table is None:
                i += 1
                continue
            try:
                schema = self.spark.table(table).schema
            except Exception:  # noqa: BLE001 - not a table
                i += 1
                continue
            r = self._walk_collection_path(segs[0], schema, segs[1:])
            if (
                r is None
                or not isinstance(r[1], T.ArrayType)
                or not isinstance(r[1].elementType, T.StructType)
            ):
                i += 1
                continue
            expr, dt = r
            fnames = {f.name.lower() for f in dt.elementType.fields}
            # bare refs to element fields anywhere outside the path?
            path_idx = set(range(q, end + 1))
            has_bare = False
            uses_pos = False
            for m, tk in enumerate(toks):
                if tk.kind != "word" or m in path_idx:
                    continue
                lo = tk.text.lower()
                pv = _prev_code(toks, m - 1)
                nv = _next_code(toks, m + 1)
                if pv >= 0 and toks[pv].text == ".":
                    continue
                if nv < len(toks) and toks[nv].text in (".", "("):
                    continue
                if lo in fnames:
                    has_bare = True
                if lo == "pos":
                    uses_pos = True
            if not has_bare or uses_pos:
                i += 1
                continue
            # Spark's grammar puts lateral views AFTER all join relations:
            # when more FROM items follow this one (`FROM t, t.s.c.d.item,
            # u`), splicing LATERAL VIEW in place is a parse error — find
            # the clause end and splice there instead (the explode
            # commutes with the later cross joins)
            ins_at = len(toks)
            d2 = 0
            for x in range(end + 1, len(toks)):
                t2 = toks[x]
                if t2.text == "(":
                    d2 += 1
                elif t2.text == ")":
                    d2 -= 1
                    if d2 < 0:
                        ins_at = x
                        break
                elif d2 == 0 and t2.kind == "word" and t2.upper in (
                    "WHERE", "GROUP", "ORDER", "HAVING", "LIMIT",
                    "OFFSET", "UNION", "INTERSECT", "EXCEPT",
                ):
                    ins_at = x
                    break
            repl = tokenize(
                f" LATERAL VIEW inline({expr}) __cji{q} "
            )
            del toks[i : end + 1]
            ins_at -= end + 1 - i
            toks[ins_at:ins_at] = repl
            changed = True
            # stay at i: the next FROM item (if any) now starts here and
            # may itself be a relative path; the spliced LATERAL VIEW
            # lies beyond ins_at and is skipped naturally
        return untokenize(toks) if changed else impala_sql

    def _resolve_subplan_target(self, toks, segs, candidates):
        """Resolve a subquery FROM target path to ``(collection_expr_sql,
        collection_dtype, root_info)`` or None.  Roots, in order: a
        candidate TABLE (or temp view); a COLLECTION ALIAS bound by an
        earlier dotted FROM item (``t.int_array_array a1`` then ``FROM
        a1.item``); a DERIVED-TABLE alias (schema probed with an
        analysis-only query).  Interior segments: struct fields navigate;
        ``item`` on a nested array flattens one level (NULL inner arrays
        dropped, like the reference's scan); a field name on an
        array<struct> maps to a per-element transform; ``value`` on a map
        takes map_values.  ``root_info`` is ``("table", <name>)`` /
        ``("collection", None)`` / ``("derived", None)`` — the
        decorrelation-landmine guard needs the provenance."""
        for table in candidates:
            try:
                schema = self.spark.table(table).schema
            except Exception:  # noqa: BLE001 - not a table: next
                continue
            r = self._walk_collection_path(segs[0], schema, segs[1:])
            if r is not None:
                return (*r, ("table", table))
        r = self._from_collection_alias_target(toks, segs)
        if r is not None:
            return (*r, ("collection", None))
        schema = self._derived_alias_schema(toks, segs[0])
        if schema is not None:
            r = self._walk_collection_path(segs[0], schema, segs[1:])
            if r is not None:
                return (*r, ("derived", None))
        return None

    @staticmethod
    def _walk_collection_path(base_expr, base_dt, rest):
        """Walk ``rest`` from ``(base_expr, base_dt)`` per the reference's
        Path resolution; returns (expr, dtype) when the terminal is a
        collection, else None."""
        from pyspark.sql import types as T

        cur_expr, cur_dt = base_expr, base_dt
        for idx, seg in enumerate(rest):
            sl = seg.lower()
            last = idx == len(rest) - 1
            if isinstance(cur_dt, T.StructType):
                fld = next(
                    (f for f in cur_dt.fields
                     if f.name.lower() == sl), None,
                )
                if fld is None:
                    return None
                cur_expr = f"{cur_expr}.`{fld.name}`"
                cur_dt = fld.dataType
            elif isinstance(cur_dt, T.ArrayType):
                el = cur_dt.elementType
                if sl == "item":
                    if isinstance(el, T.ArrayType):
                        # one flatten per nesting hop; NULL inner arrays
                        # contribute no elements (flatten itself NULLs
                        # the whole result on a NULL element)
                        cur_expr = (
                            f"flatten(filter({cur_expr},"
                            " __tf -> __tf IS NOT NULL))"
                        )
                        cur_dt = el
                    elif last:
                        pass  # path ends AT the elements: same array
                    else:
                        # item then more segs: fields of struct elements
                        if not isinstance(el, T.StructType):
                            return None
                        continue  # next seg handled by the array+field arm
                elif isinstance(el, T.StructType):
                    fld = next(
                        (f for f in el.fields
                         if f.name.lower() == sl), None,
                    )
                    if fld is None:
                        return None
                    if isinstance(fld.dataType, T.ArrayType):
                        # a COLLECTION field reached through an array is
                        # implicitly unnested (Path.java: the FROM target
                        # c.c_orders.o_lineitems is the union of every
                        # order's lineitems) — flatten, dropping NULL
                        # inner collections like the reference's scan
                        cur_expr = (
                            f"flatten(filter(transform({cur_expr},"
                            f" __tw -> __tw.`{fld.name}`),"
                            " __tf -> __tf IS NOT NULL))"
                        )
                        cur_dt = fld.dataType
                    else:
                        cur_expr = (
                            f"transform({cur_expr},"
                            f" __tw -> __tw.`{fld.name}`)"
                        )
                        cur_dt = T.ArrayType(fld.dataType)
                else:
                    return None
            elif isinstance(cur_dt, T.MapType):
                if sl != "value":
                    return None
                cur_expr = f"map_values({cur_expr})"
                cur_dt = T.ArrayType(cur_dt.valueType)
            else:
                return None
        if isinstance(cur_dt, (T.ArrayType, T.MapType)):
            return cur_expr, cur_dt
        return None

    def _from_collection_alias_target(self, toks, segs):
        """segs[0] bound by a DOTTED FROM item (``<root>.<path> alias``):
        the alias names that collection's ELEMENTS (post-translate, the
        exploded column keeps the alias name), so the walk continues from
        the element type with the bare alias as the base expression."""
        from hopspark.dialect.translate import _next_code, _prev_code

        alias = segs[0].lower()
        for w_i, tw in enumerate(toks):
            if tw.kind != "word" or tw.text.lower() != alias:
                continue
            p1 = _prev_code(toks, w_i - 1)
            if p1 >= 0 and toks[p1].text == ".":
                # IMPLICIT alias: the binding item's trailing path segment
                # doubles as the alias (`FROM t.nested_struct.c.d` binds
                # d) — but only when this occurrence ENDS a FROM item
                nx = _next_code(toks, w_i + 1)
                if nx < len(toks) and (
                    toks[nx].text in (".", "(")
                    or (toks[nx].kind == "word"
                        and toks[nx].upper not in self._FROM_TAIL_WORDS)
                ):
                    continue
                p1 = w_i  # the path includes this segment
            elif p1 < 0 or toks[p1].kind != "word":
                continue
            # walk the dotted path backwards to its root word
            path = [toks[p1].text]
            k = p1
            while True:
                d = _prev_code(toks, k - 1)
                if d < 0 or toks[d].text != ".":
                    break
                w2 = _prev_code(toks, d - 1)
                if w2 < 0 or toks[w2].kind != "word":
                    break
                path.insert(0, toks[w2].text)
                k = w2
            if len(path) < 2:
                continue
            # root must resolve through a table / table alias: reuse the
            # candidate machinery one level up (tables only — chained
            # collection-alias roots recurse naturally via this method)
            root_cands = [path[0]]
            # the root may itself be an alias of a table: find its table
            rt = self._alias_table_name(toks, path[0])
            if rt:
                root_cands.append(rt)
            for table in root_cands:
                try:
                    schema = self.spark.table(table).schema
                except Exception:  # noqa: BLE001 - not a table
                    continue
                r = self._walk_collection_path(path[0], schema, path[1:])
                if r is None or not hasattr(r[1], "elementType"):
                    continue
                elem = r[1].elementType
                # stash the root binding for the decorrelation-landmine
                # guard: (root word, resolved table, top-level column)
                self._last_collection_root = (path[0], table, path[1])
                return self._walk_collection_path(segs[0], elem, segs[1:])
            # root bound to a DERIVED table (e.g. the landmine guard's
            # own normalization wrapper): probe its schema
            d_schema = self._derived_alias_schema(toks, path[0])
            if d_schema is not None:
                r = self._walk_collection_path(path[0], d_schema, path[1:])
                if r is not None and hasattr(r[1], "elementType"):
                    elem = r[1].elementType
                    self._last_collection_root = (path[0], None, path[1])
                    return self._walk_collection_path(
                        segs[0], elem, segs[1:]
                    )
        return None

    def _alias_table_name(self, toks, alias):
        """Table name bound to ``alias`` in a FROM/JOIN item, or None."""
        from hopspark.dialect.translate import _prev_code

        for w_i, tw in enumerate(toks):
            if tw.kind != "word" or tw.text.lower() != alias.lower():
                continue
            p = _prev_code(toks, w_i - 1)
            if p < 0 or toks[p].kind != "word":
                continue
            cand = toks[p].text
            if cand.upper() == "AS":
                p2 = _prev_code(toks, p - 1)
                if p2 < 0 or toks[p2].kind != "word":
                    continue
                cand = toks[p2].text
            if cand.lower() != alias.lower():
                return cand
        return None

    def _derived_alias_schema(self, toks, alias):
        """Schema of the derived table bound to ``alias`` (``(...) alias``),
        via an analysis-only probe.  None when the alias is not a derived
        table or its body does not analyze standalone (correlated)."""
        from hopspark.dialect.translate import (
            _next_code, _prev_code, untokenize,
        )

        for w_i, tw in enumerate(toks):
            if tw.kind != "word" or tw.text.lower() != alias.lower():
                continue
            p = _prev_code(toks, w_i - 1)
            if p >= 0 and toks[p].kind == "word" and toks[p].upper == "AS":
                p = _prev_code(toks, p - 1)
            if p < 0 or toks[p].text != ")":
                continue
            depth = 0
            open_i = None
            for k in range(p, -1, -1):
                if toks[k].text == ")":
                    depth += 1
                elif toks[k].text == "(":
                    depth -= 1
                    if depth == 0:
                        open_i = k
                        break
            if open_i is None:
                continue
            body = untokenize(toks[open_i + 1 : p])
            try:
                return self.spark.sql(body).schema
            except Exception:  # noqa: BLE001 - not standalone SQL
                return None
        return None

    # --- nondeterministic-decorrelation landmine guard (round 12) -----
    #
    # Catalyst lowers a general-path lateral/expression subplan (the
    # grouping/analytic bodies the HOF fast paths don't absorb) into a
    # join keyed on the CORRELATED COLLECTION ITSELF, re-executing the
    # outer plan on both sides.  collect_list's element order follows
    # shuffle FETCH order — racy on a cluster — so the two sides can
    # produce unequal arrays and the join silently matches nothing
    # (SCALE.md round-11 session 2: zero rows, no error).  The guard
    # normalizes the outer relation's collection column with a deep
    # sort_array whenever the source plan contains an order-
    # nondeterministic constructor, making the duplicated join keys
    # value-equal; unorderable (map-bearing) collections raise instead.

    _NONDET_FN_RE = re.compile(
        r"\b(collect_list|collect_set|shuffle|rand|randn|uuid|"
        r"monotonically_increasing_id)\("
    )

    def _plan_is_order_nondet(self, df) -> bool:
        """True when ``df``'s analyzed plan contains a constructor whose
        output value/order can differ between two executions of the same
        plan (collect_list/collect_set are shuffle-fetch-order-dependent;
        the rest are explicitly nondeterministic).  A collect_list/
        collect_set whose result feeds DIRECTLY into sort_array/array_sort
        (the r11 fixture discipline) is already order-normalized and does
        not count — otherwise the guard would re-wrap every engine-owned
        nested fixture."""
        try:
            s = df._jdf.queryExecution().analyzed().toString()
        except Exception:  # noqa: BLE001 - cannot prove safe
            return True
        for m in self._NONDET_FN_RE.finditer(s):
            if m.group(1) in ("collect_list", "collect_set"):
                pre = s[max(0, m.start() - 12):m.start()]
                if pre.endswith(("sort_array(", "array_sort(")):
                    continue
            return True
        return False

    @classmethod
    def _dtype_has_array(cls, dt) -> bool:
        from pyspark.sql import types as T

        if isinstance(dt, T.ArrayType):
            return True
        if isinstance(dt, T.StructType):
            return any(cls._dtype_has_array(f.dataType) for f in dt.fields)
        if isinstance(dt, T.MapType):
            return (cls._dtype_has_array(dt.keyType)
                    or cls._dtype_has_array(dt.valueType))
        return False

    @classmethod
    def _dtype_sort_unorderable(cls, dt, under_array: bool = False):
        """A MapType reachable under an ArrayType element makes the array
        unsortable (Spark ordering is undefined for maps) — returns the
        offending type string, or None when deep sort_array is legal."""
        from pyspark.sql import types as T

        if isinstance(dt, T.MapType):
            if under_array:
                return dt.simpleString()
            return (cls._dtype_sort_unorderable(dt.keyType, under_array)
                    or cls._dtype_sort_unorderable(dt.valueType,
                                                   under_array))
        if isinstance(dt, T.ArrayType):
            return cls._dtype_sort_unorderable(dt.elementType, True)
        if isinstance(dt, T.StructType):
            for f in dt.fields:
                r = cls._dtype_sort_unorderable(f.dataType, under_array)
                if r:
                    return r
        return None

    @classmethod
    def _deep_sort_sql(cls, expr: str, dt, depth: int = 0) -> str:
        """SQL normalizing ``expr`` of type ``dt`` so equal multisets
        render byte-equal values: every array level is sort_array()ed
        innermost-first.  Returns ``expr`` unchanged when the type holds
        no arrays."""
        from pyspark.sql import types as T

        if isinstance(dt, T.ArrayType):
            var = f"__ds{depth}"
            inner = cls._deep_sort_sql(var, dt.elementType, depth + 1)
            if inner != var:
                expr = f"transform({expr}, {var} -> {inner})"
            return f"sort_array({expr})"
        if isinstance(dt, T.StructType):
            if not cls._dtype_has_array(dt):
                return expr
            parts = []
            for f in dt.fields:
                fe = cls._deep_sort_sql(
                    f"{expr}.`{f.name}`", f.dataType, depth
                )
                parts.append(f"'{f.name}', {fe}")
            # a NULL struct must stay NULL (named_struct would rebuild
            # it as a struct of NULLs)
            return (f"CASE WHEN {expr} IS NULL THEN NULL ELSE "
                    f"named_struct({', '.join(parts)}) END")
        return expr

    @staticmethod
    def _table_binding_spans(toks, table, alias):
        """Token spans of every FROM/JOIN item binding ``alias`` to
        ``table`` (``FROM table [AS] alias`` / unaliased ``FROM table``
        when alias == table) — the spans the landmine guard wraps."""
        from hopspark.dialect.translate import (
            _in_from_clause, _next_code, _prev_code,
        )

        spans = []
        tl, al = table.lower(), alias.lower()
        for w_i, tw in enumerate(toks):
            if tw.kind != "word" or tw.text.lower() != tl:
                continue
            p = _prev_code(toks, w_i - 1)
            in_from = p >= 0 and (
                (toks[p].kind == "word"
                 and toks[p].upper in ("FROM", "JOIN"))
                or (toks[p].text == "," and _in_from_clause(toks, p))
            )
            if not in_from:
                continue
            n1 = _next_code(toks, w_i + 1)
            if tl == al:
                # unaliased: the item must end here (a trailing alias
                # word or dotted path binds something else)
                if n1 < len(toks):
                    nt = toks[n1]
                    if nt.text == "." or (
                        nt.kind == "word"
                        and (nt.upper == "AS"
                             or nt.upper not in Engine._FROM_TAIL_WORDS)
                    ):
                        continue
                spans.append((w_i, w_i + 1))
                continue
            if (n1 < len(toks) and toks[n1].kind == "word"
                    and toks[n1].upper == "AS"):
                n1 = _next_code(toks, n1 + 1)
            if (n1 < len(toks) and toks[n1].kind == "word"
                    and toks[n1].text.lower() == al):
                spans.append((w_i, n1 + 1))
        return spans

    def _normalize_wrap_sql(self, schema, top_col, source_sql):
        """``(SELECT ..cols.., <deep sort> AS top_col FROM source)`` —
        the landmine guard's normalization wrapper."""
        fld = next(
            (f for f in schema.fields
             if f.name.lower() == top_col.lower()), None,
        )
        if fld is None or not self._dtype_has_array(fld.dataType):
            return None
        bad = self._dtype_sort_unorderable(fld.dataType)
        if bad:
            raise ValueError(
                f"correlated subplan over column {top_col!r}: the source "
                "plan builds it with an order-nondeterministic aggregate "
                "(collect_list/collect_set), and Catalyst's decorrelated "
                "join would key on the collection itself — but the "
                f"element type contains unorderable {bad}, so the engine "
                "cannot normalize it.  sort_array the collection when "
                "building the view, or restructure the query onto a "
                "single-aggregate/EXISTS subplan shape."
            )
        cols = []
        for f in schema.fields:
            if f.name.lower() == top_col.lower():
                cols.append(
                    self._deep_sort_sql(f"`{f.name}`", f.dataType)
                    + f" AS `{f.name}`"
                )
            else:
                cols.append(f"`{f.name}`")
        return f"(SELECT {', '.join(cols)} FROM {source_sql})"

    def _nondet_guard_spans(self, toks, segs, root_info, guarded):
        """Replacement spans that deep-sort the outer relation's
        collection column before a general-path subplan rewrite.
        Returns [] when provably safe or already guarded; raises
        ValueError when a hazard is detected but not normalizable."""
        from hopspark.dialect.translate import untokenize

        kind, table = root_info
        alias = segs[0]
        key = (alias.lower(), (table or kind).lower())
        if key in guarded:
            return []
        guarded.add(key)
        if kind == "table":
            df = self.spark.table(table)
            if not self._plan_is_order_nondet(df):
                return []
            inner = self._normalize_wrap_sql(
                df.schema, segs[1], f"{table} __ndg"
            )
            if inner is None:
                return []
            # after wrapping, the alias re-resolves as a derived root —
            # pre-mark it so the rescan doesn't wrap a second time
            guarded.add((alias.lower(), "derived"))
            spans = self._table_binding_spans(toks, table, alias)
            if not spans:
                raise ValueError(
                    f"correlated subplan over {alias}.{segs[1]}: the "
                    "source builds the collection with an order-"
                    "nondeterministic aggregate and the engine could not "
                    "locate the binding FROM item to normalize it — "
                    "sort_array the collection when building the view"
                )
            return [
                (s0, s1, f" {inner} {alias} ") for s0, s1 in spans
            ]
        if kind == "derived":
            span = self._derived_item_span(toks, alias)
            if span is None:
                return []
            open_i, close_i, item_end = span
            body = untokenize(toks[open_i + 1 : close_i])
            if "__ndg" in body:
                return []  # already a guard-emitted wrapper
            try:
                bdf = self.spark.sql(body)
            except Exception:  # noqa: BLE001 - correlated body: the
                return []  # enclosing scope's guard covers its sources
            if not self._plan_is_order_nondet(bdf):
                return []
            inner = self._normalize_wrap_sql(
                bdf.schema, segs[1], f"({body}) __ndg"
            )
            if inner is None:
                return []
            return [(open_i, item_end, f" {inner} {alias} ")]
        # collection-alias root: normalize the ROOT table binding the
        # dotted FROM item (deep sort covers the inner collections too)
        root = getattr(self, "_last_collection_root", None)
        if root is None:
            return []
        root_word, root_table, top_col = root
        if root_table is None:
            # derived-table root — wrap the derived item itself
            span = self._derived_item_span(toks, root_word)
            if span is None:
                return []
            open_i, close_i, item_end = span
            body = untokenize(toks[open_i + 1 : close_i])
            if "__ndg" in body:
                return []
            try:
                bdf = self.spark.sql(body)
            except Exception:  # noqa: BLE001 - correlated body
                return []
            if not self._plan_is_order_nondet(bdf):
                return []
            inner = self._normalize_wrap_sql(
                bdf.schema, top_col, f"({body}) __ndg"
            )
            if inner is None:
                return []
            return [(open_i, item_end, f" {inner} {root_word} ")]
        df = self.spark.table(root_table)
        if not self._plan_is_order_nondet(df):
            return []
        inner = self._normalize_wrap_sql(
            df.schema, top_col, f"{root_table} __ndg"
        )
        if inner is None:
            return []
        guarded.add((root_word.lower(), "derived"))
        spans = self._table_binding_spans(toks, root_table, root_word)
        if not spans:
            raise ValueError(
                f"correlated subplan over collection alias {alias!r}: "
                f"the root table {root_table!r} builds the collection "
                "with an order-nondeterministic aggregate and the engine "
                "could not normalize the dotted FROM item — sort_array "
                "the collection when building the view"
            )
        return [(s0, s1, f" {inner} {root_word} ") for s0, s1 in spans]

    def _map_root_wrap(self, toks, segs, root_info, qpath):
        """Handle a subplan path rooted at a top-level MAP column, whose
        correlated reference Catalyst rejects.  Returns ``("respan",
        spans)`` to wrap the binding FROM item with a map_entries
        pre-computation (caller splices + rescans), ``("patch",
        new_qpath)`` once the wrapper is in place (the correlated ref
        rides the entries ARRAY), or None when not applicable."""
        from pyspark.sql import types as T

        from hopspark.dialect.translate import untokenize

        if len(segs) < 2:
            return None
        col = segs[1]
        pat = next(
            (p for p in (
                f"map_values({segs[0]}.`{col}`)",
                f"map_values({segs[0]}.{col})",
            ) if p in qpath),
            None,
        )
        if pat is None:
            return None
        kind, table = root_info
        if kind == "table":
            try:
                dt = {
                    f.name.lower(): f.dataType
                    for f in self.spark.table(table).schema.fields
                }.get(col.lower())
            except Exception:  # noqa: BLE001
                return None
            if not isinstance(dt, T.MapType):
                return None
            spans = self._table_binding_spans(toks, table, segs[0])
            if not spans:
                return None
            wrapped = (
                f"(SELECT *, map_entries(`{col}`) AS __me_{col}"
                f" FROM {table})"
            )
            return ("respan", [
                (s0, s1, f" {wrapped} {segs[0]} ") for s0, s1 in spans
            ])
        if kind == "derived":
            span = self._derived_item_span(toks, segs[0])
            if span is None:
                return None
            body = untokenize(toks[span[0] + 1 : span[1]])
            if f"__me_{col}" not in body:
                return None
            return ("patch", qpath.replace(
                pat,
                f"transform({segs[0]}.__me_{col}, __mv -> __mv.value)",
            ))
        return None

    @staticmethod
    def _derived_item_span(toks, alias):
        """``(open_i, close_i, item_end)`` of the derived-table FROM item
        ``( body ) [AS] alias`` — item_end is one past the alias word."""
        from hopspark.dialect.translate import _prev_code

        for w_i, tw in enumerate(toks):
            if tw.kind != "word" or tw.text.lower() != alias.lower():
                continue
            p = _prev_code(toks, w_i - 1)
            if p >= 0 and toks[p].kind == "word" and toks[p].upper == "AS":
                p = _prev_code(toks, p - 1)
            if p < 0 or toks[p].text != ")":
                continue
            depth = 0
            for k in range(p, -1, -1):
                if toks[k].text == ")":
                    depth += 1
                elif toks[k].text == "(":
                    depth -= 1
                    if depth == 0:
                        return (k, p, w_i + 1)
            return None
        return None

    def _subplan_lateral_agg(
        self, toks, o, close, first, from_i, qpath, coll_dt
    ) -> bool:
        """Lower ``, (SELECT <agg>(arg) [AS] name [, <agg>(arg) [AS]
        name ...] FROM c.path [x] [WHERE pred]) v`` to inline HOF
        expressions, deleting the derived table and substituting refs to
        each output name (multi-item support: r10 verdict item 4 — for
        struct-rooted paths Catalyst REJECTS the correlated fallback, so
        these shapes have no other plan).  Returns True when rewritten
        in place."""
        from pyspark.sql import types as T

        from hopspark.dialect.translate import (
            _in_from_clause, _is_code, _next_code, _prev_code,
            tokenize, untokenize,
        )

        if isinstance(coll_dt, T.MapType):
            # key/value over map_entries(), like the expression path
            qpath = f"map_entries({qpath})"
            coll_dt = T.ArrayType(T.StructType([
                T.StructField("key", coll_dt.keyType),
                T.StructField("value", coll_dt.valueType),
            ]))
        if not isinstance(coll_dt, T.ArrayType):
            return False
        p = _prev_code(toks, o - 1)
        if p < 0 or toks[p].text != "," or not _in_from_clause(toks, p):
            return False
        # select list: one or more comma-separated aggregates, each WITH
        # an output name
        sel_code = [t for t in toks[first + 1 : from_i] if _is_code(t)]
        item_codes: list[list] = [[]]
        depth0 = 0
        for t in sel_code:
            if t.text == "(":
                depth0 += 1
            elif t.text == ")":
                depth0 -= 1
            if t.text == "," and depth0 == 0:
                item_codes.append([])
            else:
                item_codes[-1].append(t)
        named: list[tuple[str, list]] = []
        for code in item_codes:
            if len(code) < 5 or code[-1].kind != "word":
                return False
            if code[-2].kind == "word" and code[-2].upper == "AS":
                name, code = code[-1].text, code[:-2]
            elif code[-2].text == ")":
                name, code = code[-1].text, code[:-1]
            else:
                return False
            if (
                code[0].kind != "word"
                or code[0].text.lower() not in ("count", "sum", "min",
                                                "max", "avg")
                or code[1].text != "("
                or code[-1].text != ")"
            ):
                return False
            named.append((name, code))
        if len({n.lower() for n, _c in named}) != len(named):
            return False  # duplicate output names: ambiguous
        # target end: skip the segs tokens after FROM
        end = _next_code(toks, from_i + 1)
        while True:
            d = _next_code(toks, end + 1)
            if d < close and toks[d].text == ".":
                w2 = _next_code(toks, d + 1)
                if w2 < close and toks[w2].kind == "word":
                    end = w2
                    continue
            break
        # optional collection alias, then an optional WHERE; nothing else
        salias = None
        a2 = _next_code(toks, end + 1)
        if a2 < close and toks[a2].kind == "word":
            u2 = toks[a2].upper
            if u2 == "AS":
                a3 = _next_code(toks, a2 + 1)
                if a3 >= close or toks[a3].kind != "word":
                    return False
                salias, end = toks[a3].text, a3
            elif u2 not in self._FROM_TAIL_WORDS:
                salias, end = toks[a2].text, a2
        pred_sql = None
        w_i2 = _next_code(toks, end + 1)
        elem = coll_dt.elementType
        fields = (
            [f.name for f in elem.fields]
            if isinstance(elem, T.StructType) else None
        )
        if w_i2 < close:
            if toks[w_i2].kind != "word" or toks[w_i2].upper != "WHERE":
                return False
            pred_toks = toks[w_i2 + 1 : close]
            body = untokenize(pred_toks)
            if re.search(r"\bselect\b|\bpos\b", body, re.I):
                return False
            pred_sql = self._subplan_lambda_pred(
                pred_toks, fields, salias, "__sx"
            )
            if pred_sql is None:
                return False
        aggs: list[tuple[str, str]] = []
        for name, code in named:
            agg = self._agg_expr_from_code(
                code, elem, fields, salias, qpath, pred_sql,
            )
            if agg is None:
                return False
            aggs.append((name, agg))
        # [AS] v alias after the close
        stop = close + 1
        valias = None
        a4 = _next_code(toks, close + 1)
        if a4 < len(toks) and toks[a4].kind == "word":
            if toks[a4].upper == "AS":
                a5 = _next_code(toks, a4 + 1)
                if a5 < len(toks) and toks[a5].kind == "word":
                    valias, stop = toks[a5].text, a5 + 1
            elif toks[a4].upper not in self._FROM_TAIL_WORDS:
                valias, stop = toks[a4].text, a4 + 1
        del toks[p:stop]
        self._substitute_output_names(
            toks, {n.lower(): (n, a) for n, a in aggs}, valias, bind_i=p,
        )
        return True

    @staticmethod
    def _query_block_bounds(toks, i):
        """Token range ``[start, end)`` of the query block owning position
        ``i``: backward to the SELECT at the same paren level, forward to
        the unmatched close paren or a same-level set-op keyword."""
        start = 0
        bal = 0
        for k in range(i - 1, -1, -1):
            t = toks[k]
            if t.text == ")":
                bal += 1
            elif t.text == "(":
                if bal == 0:
                    start = k + 1
                    break
                bal -= 1
            elif (
                bal == 0 and t.kind == "word" and t.upper == "SELECT"
            ):
                start = k
                break
        end = len(toks)
        bal = 0
        for k in range(i, len(toks)):
            t = toks[k]
            if t.text == "(":
                bal += 1
            elif t.text == ")":
                if bal == 0:
                    end = k
                    break
                bal -= 1
            elif bal == 0 and t.kind == "word" and t.upper in (
                "UNION", "INTERSECT", "EXCEPT", "MINUS",
            ):
                end = k
                break
        return start, end

    @staticmethod
    def _order_having_spans(toks, blk):
        """Token ranges of ``blk``'s own ORDER BY and HAVING clauses
        (depth 0 within the block) — where select-list output names
        take precedence over collection element fields."""
        s, e = blk
        spans = []
        depth = 0
        cur = None
        for k in range(s, e):
            t = toks[k]
            if t.text == "(":
                depth += 1
            elif t.text == ")":
                depth -= 1
            elif depth == 0 and t.kind == "word":
                u = t.upper
                if u in ("ORDER", "HAVING"):
                    if cur is not None:
                        spans.append((cur, k))
                    cur = k
                elif cur is not None and u in (
                    "LIMIT", "OFFSET", "UNION", "INTERSECT", "EXCEPT",
                    "MINUS", "WINDOW", "QUALIFY",
                ):
                    spans.append((cur, k))
                    cur = None
        if cur is not None:
            spans.append((cur, e))
        return spans

    @staticmethod
    def _select_output_aliases(toks, blk):
        """Lowercased select-list OUTPUT aliases of query block ``blk``:
        explicit ``AS name`` plus trailing alias words of multi-token
        select items (``count(*) c``, ``'x' o_comment``).  Bare
        single-column items are excluded — their output name IS the
        column, so qualification stays correct for them."""
        from hopspark.dialect.translate import _next_code, _prev_code

        s, e = blk
        aliases: set = set()
        sel_i = -1
        from_i = e
        depth = 0
        for k in range(s, e):
            t = toks[k]
            if t.text == "(":
                depth += 1
            elif t.text == ")":
                depth -= 1
            elif depth == 0 and t.kind == "word":
                if t.upper == "SELECT" and sel_i < 0:
                    sel_i = k
                elif t.upper == "FROM" and sel_i >= 0:
                    from_i = k
                    break
        if sel_i < 0:
            return aliases
        depth = 0
        for k in range(sel_i + 1, from_i):
            t = toks[k]
            if t.text == "(":
                depth += 1
                continue
            if t.text == ")":
                depth -= 1
                continue
            if depth or t.kind != "word":
                continue
            nx = _next_code(toks, k + 1)
            if not (nx >= from_i or toks[nx].text == ","):
                continue  # not item-final
            pv = _prev_code(toks, k - 1)
            if pv < sel_i:
                continue
            pt = toks[pv]
            if (
                pt.text == ")"
                or pt.kind in ("num", "str", "bquote")
                or (pt.kind == "word" and pt.upper == "AS")
                or (pt.kind == "word"
                    and pt.upper not in ("SELECT", "DISTINCT", "ALL"))
            ):
                aliases.add(t.text.lower())
        return aliases

    @classmethod
    def _substitute_output_name(cls, toks, name, valias, expr_sql,
                                bind_i=None):
        """Single-name convenience wrapper over
        :meth:`_substitute_output_names`."""
        cls._substitute_output_names(
            toks, {name.lower(): (name, expr_sql)}, valias, bind_i=bind_i,
        )

    @classmethod
    def _substitute_output_names(cls, toks, exprs, valias, bind_i=None):
        """Replace refs to a removed derived table's output columns
        (bare ``name`` or ``valias.name``; ``exprs`` maps lowercase name
        -> (name, expr_sql)) with their expressions; whole select items
        keep the name via AS.  One pass for ALL names — sequential
        single-name passes would shift the block bounds under each
        other.  Substitution is scoped to the query block that bound the
        derived table (``bind_i`` = its former FROM position): bare names
        only at the block's own paren level (a nested subquery may bind
        its own column of the same name), qualified ``valias.name``
        anywhere inside the block (correlated inner refs are
        unambiguous)."""
        from hopspark.dialect.translate import (
            _next_code, _prev_code, _select_clause_here, tokenize,
        )

        if bind_i is None:
            blk_s, blk_e = 0, len(toks)
        else:
            blk_s, blk_e = cls._query_block_bounds(toks, bind_i)
        in_subq_until = -1  # bare names are blocked inside nested SELECTs
        m = 0
        while m < len(toks):
            if m < blk_s or m >= blk_e:
                m += 1
                continue
            if toks[m].text == "(" and m >= in_subq_until:
                n2 = _next_code(toks, m + 1)
                if (
                    n2 < len(toks) and toks[n2].kind == "word"
                    and toks[n2].upper in ("SELECT", "WITH")
                ):
                    d2 = 1
                    x = m + 1
                    while x < len(toks) and d2:
                        if toks[x].text == "(":
                            d2 += 1
                        elif toks[x].text == ")":
                            d2 -= 1
                        x += 1
                    in_subq_until = x
            t = toks[m]
            if t.kind != "word":
                m += 1
                continue
            lo = t.text.lower()
            start = m
            matched = None  # (name, expr_sql)
            end_s = m
            if valias and lo == valias.lower():
                d = _next_code(toks, m + 1)
                if d < len(toks) and toks[d].text == ".":
                    w = _next_code(toks, d + 1)
                    if w < len(toks) and toks[w].text == "*":
                        # `v.*` = every output item, in declaration order
                        repl = tokenize(", ".join(
                            f"({x}) AS {n}" for n, x in exprs.values()
                        ))
                        toks[m : w + 1] = repl
                        delta2 = len(repl) - (w + 1 - m)
                        blk_e += delta2
                        if m < in_subq_until:
                            in_subq_until += delta2
                        m += len(repl)
                        continue
                    if (
                        w < len(toks)
                        and toks[w].kind == "word"
                        and toks[w].text.lower() in exprs
                    ):
                        end_s = w
                        matched = exprs[toks[w].text.lower()]
            if matched is None and m >= in_subq_until and lo in exprs:
                pv = _prev_code(toks, m - 1)
                nv = _next_code(toks, m + 1)
                alias_pos = pv >= 0 and (
                    toks[pv].text == ")"
                    or toks[pv].kind in ("num", "str", "bquote")
                    or (toks[pv].kind == "word"
                        and toks[pv].upper in ("AS",))
                    or (toks[pv].kind == "word"
                        and toks[pv].upper not in cls._QCF_KEYWORDS)
                )
                if (
                    (pv < 0 or toks[pv].text != ".")
                    and not alias_pos
                    and not (nv < len(toks)
                             and toks[nv].text in (".", "("))
                ):
                    # (alias positions — AS-preceded output names, table
                    # aliases after a relation word like `tn_customer c`
                    # — and dot/paren-followed qualifiers/functions must
                    # not be hijacked when an output name collides, like
                    # `count(*) c` next to `FROM customer c`)
                    matched = exprs[lo]
            if matched is None:
                m += 1
                continue
            name, expr_sql = matched
            pv = _prev_code(toks, start - 1)
            nx = _next_code(toks, end_s + 1)
            whole_item = (
                pv >= 0
                and _select_clause_here(toks, start)
                and (toks[pv].text == ","
                     or (toks[pv].kind == "word"
                         and toks[pv].upper in ("SELECT", "DISTINCT")))
                and (nx >= len(toks) or toks[nx].text == ","
                     or (toks[nx].kind == "word"
                         and toks[nx].upper == "FROM"))
            )
            repl = tokenize(
                f"{expr_sql} AS {name}" if whole_item
                else f"({expr_sql})"
            )
            toks[start : end_s + 1] = repl
            delta2 = len(repl) - (end_s + 1 - start)
            blk_e += delta2
            if start < in_subq_until:
                in_subq_until += delta2
            # the replacement's own parens net to zero; resume after it
            m = start + len(repl)

    def _agg_expr_from_code(
        self, code, elem, fields, salias, qpath, pred_sql
    ):
        """HOF expression for a single-aggregate code-token run
        ``AGG ( args ) `` — shared by the expression fast path and the
        lateral derived-table lowering."""
        fname = code[0].text.lower()
        inner = code[2:-1]
        depth = 1
        for t in inner:
            if t.text == "(":
                depth += 1
            elif t.text == ")":
                depth -= 1
                if depth == 0:
                    return None
        if any(t.text == "," for t in inner) or any(
            t.kind == "word" and t.upper == "DISTINCT" for t in inner
        ):
            return None
        arr_f = (
            f"filter({qpath}, __sx -> ({pred_sql}))" if pred_sql else qpath
        )
        star = len(inner) == 1 and inner[0].text in ("*", "1")
        if star:
            if fname != "count":
                return None
            # size(NULL) is -1 under legacy sizeOfNull and NULL otherwise;
            # greatest(x, 0) yields 0 for both (greatest skips NULLs);
            # COUNT is BIGINT in the reference, size() is INT
            return f"CAST(greatest(size({arr_f}), 0) AS BIGINT)"
        res = self._subplan_elem_expr(inner, elem, fields, salias)
        if res is None:
            return None
        e, kinds = res
        if fname == "count":
            cond = (
                f"({pred_sql}) AND (({e}) IS NOT NULL)"
                if pred_sql else f"({e}) IS NOT NULL"
            )
            return (
                f"CAST(greatest(size(filter({qpath}, __sx -> {cond})), 0)"
                " AS BIGINT)"
            )
        if fname in ("min", "max"):
            # array_min/max skip NULL elements; empty/NULL array -> NULL
            return f"array_{fname}(transform({arr_f}, __sx -> ({e})))"
        if "other" in kinds:
            return None
        dec = sorted(k for k in kinds if k.startswith("decimal:"))
        if dec:
            # decimal SUM/AVG, and only over a single bare field —
            # arithmetic would shift Spark's result scale away from the
            # reference's DECIMAL(38,s) contract (sum over decimal is
            # DECIMAL(38,s) in both Impala decimal_v2 and the accumulator
            # below; tpch_nested-q18.test's sum(l_quantity); avg's
            # decimal_v2 rule is ScalarType.createAdjustedDecimalType:
            # scale' = max(6,s), precision' = (p-s) + scale', capped at
            # 38 — nested-types-subplan.test's per-customer
            # avg(o_totalprice))
            if (
                fname not in ("sum", "avg")
                or len(dec) != 1
                or kinds - set(dec)
                or sum(1 for t2 in inner if t2.kind == "word") != 1
            ):
                return None
            _, p_s, s_s = dec[0].split(":")
            prec, scale = int(p_s), int(s_s)
            ty = f"DECIMAL(38,{scale})"
            sum_sql = (
                f"aggregate({arr_f}, CAST(NULL AS {ty}),"
                f" (__ac, __sx) -> CASE WHEN ({e}) IS NULL THEN __ac"
                f" ELSE coalesce(__ac, CAST(0 AS {ty})) + ({e}) END)"
            )
            if fname == "sum":
                return sum_sql
            cnt_sql = (
                f"size(filter({arr_f}, __sx -> ({e}) IS NOT NULL))"
            )
            avg_scale = max(6, scale)
            avg_prec = min(38, (prec - scale) + avg_scale)
            return (
                f"CAST(({sum_sql}) / nullif({cnt_sql}, 0)"
                f" AS DECIMAL({avg_prec},{avg_scale}))"
            )
        if fname == "avg":
            return (
                f"aggregate({arr_f},"
                " named_struct('s', CAST(NULL AS DOUBLE),"
                " 'c', CAST(0 AS BIGINT)),"
                f" (__ac, __sx) -> CASE WHEN ({e}) IS NULL THEN __ac"
                f" ELSE named_struct('s',"
                f" coalesce(__ac.s, CAST(0 AS DOUBLE)) + ({e}),"
                " 'c', __ac.c + 1) END,"
                " __ac -> __ac.s / __ac.c)"
            )
        ty = "DOUBLE" if "float" in kinds else "BIGINT"
        return (
            f"aggregate({arr_f}, CAST(NULL AS {ty}),"
            f" (__ac, __sx) -> CASE WHEN ({e}) IS NULL THEN __ac"
            f" ELSE coalesce(__ac, CAST(0 AS {ty})) + ({e}) END)"
        )

    def _subplan_agg_expr(
        self, toks, first, from_i, elem, fields, salias, qpath, pred_sql,
    ):
        """HOF lowering for a scalar aggregate subplan.  Returns the
        replacement expression SQL, or None for the general decorrelated
        path.  Semantics pinned to the reference's aggs over a per-row
        collection (nested-types-subplan.test): COUNT over an empty or
        NULL collection is 0; SUM/MIN/MAX/AVG ignore NULL elements and
        return NULL when nothing qualifies; SUM of integrals is BIGINT,
        AVG is DOUBLE."""
        from hopspark.dialect.translate import _is_code

        code = [t for t in toks[first + 1 : from_i] if _is_code(t)]
        # optional [AS] alias on the select item — irrelevant to a
        # scalar result
        if len(code) >= 2 and code[-1].kind == "word":
            if code[-2].kind == "word" and code[-2].upper == "AS":
                code = code[:-2]
            elif code[-2].text == ")":
                code = code[:-1]
        if (
            len(code) < 4
            or code[0].kind != "word"
            or code[0].text.lower() not in ("count", "sum", "min",
                                            "max", "avg")
            or code[1].text != "("
            or code[-1].text != ")"
        ):
            return None
        return self._agg_expr_from_code(
            code, elem, fields, salias, qpath, pred_sql,
        )

    @staticmethod
    def _subplan_elem_expr(code, elem, fields, salias):
        """Rewrite an aggregate argument into a lambda body over ``__sx``.
        Conservative allowlist — element fields (bare or qualified by the
        collection alias), ``item`` for scalar arrays, numeric literals,
        and + - * / % arithmetic.  Anything else returns None (general
        path).  Returns (expr_sql, kinds) where kinds classifies the
        fields used: 'int' (integral), 'float', 'other'."""
        from pyspark.sql import types as T

        def _kind(dt):
            if isinstance(
                dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
            ):
                return "int"
            if isinstance(dt, (T.FloatType, T.DoubleType)):
                return "float"
            if isinstance(dt, T.DecimalType):
                return f"decimal:{dt.precision}:{dt.scale}"
            return "other"

        ftypes = (
            {f.name.lower(): f.dataType for f in elem.fields}
            if isinstance(elem, T.StructType) else None
        )
        out: list[str] = []
        kinds: set[str] = set()
        depth = 0
        i, n = 0, len(code)
        while i < n:
            t = code[i]
            if t.text in ("+", "-", "*", "%"):
                out.append(t.text)
                i += 1
                continue
            if t.text == "/":
                out.append(t.text)
                kinds.add("float")  # Impala / is double division
                i += 1
                continue
            if t.text == "(":
                depth += 1
                out.append("(")
                i += 1
                continue
            if t.text == ")":
                depth -= 1
                if depth < 0:
                    return None
                out.append(")")
                i += 1
                continue
            if t.kind == "num":
                out.append(t.text)
                if "." in t.text or "e" in t.text.lower():
                    kinds.add("float")
                i += 1
                continue
            if t.kind == "word":
                low = t.text.lower()
                if (
                    salias
                    and low == salias.lower()
                    and i + 2 < n
                    and code[i + 1].text == "."
                    and code[i + 2].kind == "word"
                ):
                    f2 = code[i + 2].text.lower()
                    if ftypes is not None and f2 in ftypes:
                        out.append(f"__sx.`{code[i + 2].text}`")
                        kinds.add(_kind(ftypes[f2]))
                        i += 3
                        continue
                    if f2 == "item":
                        # alias.item = the element itself; an optional
                        # .field continues into a struct element
                        if (
                            ftypes is not None
                            and i + 4 < n
                            and code[i + 3].text == "."
                            and code[i + 4].kind == "word"
                            and code[i + 4].text.lower() in ftypes
                        ):
                            f3 = code[i + 4].text
                            out.append(f"__sx.`{f3}`")
                            kinds.add(_kind(ftypes[f3.lower()]))
                            i += 5
                            continue
                        if ftypes is None:
                            out.append("__sx")
                            kinds.add(_kind(elem))
                            i += 3
                            continue
                    return None
                if ftypes is not None and low in ftypes:
                    out.append(f"__sx.`{t.text}`")
                    kinds.add(_kind(ftypes[low]))
                    i += 1
                    continue
                if ftypes is None and low == "item":
                    out.append("__sx")
                    kinds.add(_kind(elem))
                    i += 1
                    continue
                return None
            return None
        if depth != 0 or not out:
            return None
        return " ".join(out), kinds

    @staticmethod
    def _subplan_lambda_pred(pred_toks, fields, salias, var):
        """Rewrite a subplan WHERE predicate into a lambda body: bare
        element-field names (and the collection alias's qualified refs)
        become ``var.field``; everything else — outer columns, functions,
        literals — passes through.  Bare names that collide with element
        fields resolve to the element, matching the reference's
        innermost-scope-first resolution."""
        fl = {f.lower() for f in fields} if fields else None
        n = len(pred_toks)
        res = []
        for k, t in enumerate(pred_toks):
            if t.kind != "word":
                res.append(t.text)
                continue
            pk = k - 1
            while pk >= 0 and pred_toks[pk].kind in ("ws", "comment"):
                pk -= 1
            nk = k + 1
            while nk < n and pred_toks[nk].kind in ("ws", "comment"):
                nk += 1
            prev_t = pred_toks[pk].text if pk >= 0 else None
            next_t = pred_toks[nk].text if nk < n else None
            low = t.text.lower()
            if prev_t == ".":
                res.append(t.text)
            elif next_t == ".":
                res.append(var if salias and low == salias.lower()
                           else t.text)
            elif next_t == "(":
                res.append(t.text)  # function name
            elif fl is not None and low in fl:
                res.append(f"{var}.{t.text}")
            elif fl is None and low == "item":
                res.append(var)
            else:
                res.append(t.text)
        joined = "".join(res)
        if fl is None:
            # scalar array: a collection-alias-qualified ref (o.item ->
            # var.item after the alias substitution) means the element
            # itself
            joined = re.sub(rf"{var}\s*\.\s*item\b", var, joined)
        return joined

    def _table_path_subquery(
        self, segs: list[str], want_pos: bool, want_item: bool
    ) -> tuple[str, list[str], bool] | None:
        """Inline subquery SQL for a table-rooted collection path, or None
        when the path does not resolve to a collection scan.  Returns
        ``(sql, star_cols, has_virtual)``: the columns the reference's
        ``*`` exposes, and whether any VIRTUAL column (pos / item-on-
        struct) was added to the subquery beyond them."""
        from pyspark.sql import types as T

        try:
            schema = self.spark.table(segs[0]).schema
        except Exception:  # noqa: BLE001 - unreadable table: not a scan
            return None
        cur_dt: object = schema
        cur_expr: str | None = None
        steps: list[tuple[str, str]] = []  # (kind, source expr)
        for seg in segs[1:]:
            sl = seg.lower()
            if isinstance(cur_dt, T.StructType):
                fld = next(
                    (f for f in cur_dt.fields if f.name.lower() == sl), None
                )
                if fld is None:
                    return None
                cur_expr = (
                    f"{cur_expr}.`{fld.name}`" if cur_expr
                    else f"`{fld.name}`"
                )
                cur_dt = fld.dataType
            elif isinstance(cur_dt, T.ArrayType):
                if sl == "item":
                    steps.append(("arr", cur_expr or ""))
                    cur_expr = f"__tpe{len(steps)}"
                    cur_dt = cur_dt.elementType
                    continue
                # a FIELD of the struct element implicitly unnests the
                # array first (Path.java: customer.c_orders.o_lineitems
                # == customer.c_orders.item.o_lineitems — the reference's
                # nested TPC-H idiom, tpch_nested-q1.test)
                el = cur_dt.elementType
                fld = (
                    next((f for f in el.fields if f.name.lower() == sl),
                         None)
                    if isinstance(el, T.StructType) else None
                )
                if fld is None:
                    return None
                steps.append(("arr", cur_expr or ""))
                cur_expr = f"__tpe{len(steps)}.`{fld.name}`"
                cur_dt = fld.dataType
            elif isinstance(cur_dt, T.MapType):
                # path THROUGH a map descends into its values (the
                # reference's nested_struct.g.value.h.i shape,
                # nested-types-scanner-maps.test); a path cannot continue
                # through keys (scalar)
                if sl != "value":
                    return None
                steps.append(("mapv", cur_expr or ""))
                cur_expr = f"__tpe{len(steps)}"
                cur_dt = cur_dt.valueType
            else:
                return None  # path through a scalar: unsupported
        terminal_map = False
        if isinstance(cur_dt, T.ArrayType):
            steps.append(("arr", cur_expr or ""))
            elem_expr = f"__tpe{len(steps)}"
            elem_dt = cur_dt.elementType
        elif isinstance(cur_dt, T.MapType):
            steps.append(("map", cur_expr or ""))
            terminal_map = True
            elem_expr, elem_dt = "", None
        elif steps and cur_expr == f"__tpe{len(steps)}":
            elem_expr, elem_dt = cur_expr, cur_dt  # path ended AT an element
        else:
            return None  # not a collection scan
        lvs = []
        for idx, (kind, src) in enumerate(steps, 1):
            if kind == "arr":
                lvs.append(
                    f"LATERAL VIEW posexplode({src}) __tpv{idx}"
                    f" AS __tpp{idx}, __tpe{idx}"
                )
            elif kind == "mapv":
                # intermediate map hop: values become the element stream
                lvs.append(
                    f"LATERAL VIEW explode({src}) __tpv{idx}"
                    f" AS __tpk{idx}, __tpe{idx}"
                )
            else:
                # reserved names, re-aliased in the select list — the
                # table may itself have key/value columns (the
                # reference's pos_item_key_value_complextypestbl shape)
                lvs.append(
                    f"LATERAL VIEW explode({src}) __tpv{idx}"
                    f" AS __tpk{idx}, __tpe{idx}"
                )
        has_virtual = False
        if terminal_map:
            n = len(steps)
            cols = [f"__tpk{n} AS `key`", f"__tpe{n} AS `value`"]
            star_cols = ["key", "value"]
        elif isinstance(elem_dt, T.StructType):
            cols = [
                f"{elem_expr}.`{f.name}` AS `{f.name}`"
                for f in elem_dt.fields
            ]
            star_cols = [f.name for f in elem_dt.fields]
            if want_item:
                cols.append(f"{elem_expr} AS item")
                has_virtual = True
            if want_pos:
                # pos is BIGINT in the reference (CollectionTableRef's
                # position item type); Spark's posexplode yields INT
                cols.append(f"CAST(__tpp{len(steps)} AS BIGINT) AS pos")
                has_virtual = True
        else:
            cols = [f"{elem_expr} AS item"]
            star_cols = ["item"]
            if want_pos:
                cols.append(f"CAST(__tpp{len(steps)} AS BIGINT) AS pos")
                has_virtual = True
        return (
            "(SELECT " + ", ".join(cols)
            + f" FROM `{segs[0]}` " + " ".join(lvs) + ")",
            star_cols,
            has_virtual,
        )

    def _schema_columns_for(
        self, impala_sql: str
    ) -> tuple[
        frozenset[str] | None,
        frozenset[str] | None,
        frozenset[str] | None,
        frozenset[str] | None,
        frozenset[str] | None,
    ]:
        """Catalog knowledge for the translator's type dispatches: the
        set of unambiguously-BOOLEAN column names (`||` → OR, the
        analyzer's CompoundVerticalBarExpr dispatch) and of
        unambiguously-STRING names (string→int cast parse guard).  Only
        computed when the statement can need it — a full catalog schema
        scan is not free.  Column names that appear with MIXED types
        across tables are excluded (ambiguous, like the analyzer's
        unresolved-column path)."""
        up = impala_sql.upper()
        need = (
            "||" in impala_sql
            or "CAST" in up
            or "AVG" in up
            or "CEIL" in up
            or "FLOOR" in up
            # arithmetic anywhere can hit the BIGINT->DECIMAL(19,0)
            # promotion (_rewrite_bigint_decimal_arith) — without this
            # trigger `SELECT big_col + 1.1 FROM t` silently skipped the
            # schema scan and the result type depended on unrelated
            # keywords (round-8 advice, low)
            or any(ch in impala_sql for ch in "+-*/%")
        )
        if not need:
            return None, None, None, None, None
        if self._schema_cols_cache is None:
            # r13: one SHOW TABLES + ONE LIMIT-0 cross-join analysis
            # instead of catalog.listTables() + a schema fetch per table.
            # listTables materializes a full Table object (description,
            # namespace, ...) per entry — measured 707 ms on a session
            # with 30 temp views vs 55 ms for this shape; in a bench
            # session the catalog accumulates fixture views, so the old
            # scan grew with SUITE AGE, not query complexity.  Semantics
            # identical: the concatenated field list of the cross join is
            # exactly the per-table field union the loop built.  Fallback
            # to the per-table loop when any single view fails analysis
            # (the loop skips just that view).
            seen: dict[str, set[str]] = {}
            names = [
                r.tableName for r in self.spark.sql("SHOW TABLES").collect()
            ]
            fields: list | None = []
            if names:
                try:
                    fields = self.spark.sql(
                        "SELECT * FROM "
                        + ", ".join(f"`{n}`" for n in names)
                        + " LIMIT 0"
                    ).schema.fields
                except Exception:  # noqa: BLE001 - fall back per table
                    fields = None
            if fields is None:
                fields = []
                for n in names:
                    try:
                        fields.extend(self.spark.table(n).schema.fields)
                    except Exception:  # noqa: BLE001 - unreadable: skip
                        continue
            for f in fields:
                seen.setdefault(f.name.lower(), set()).add(
                    f.dataType.typeName()
                )
            self._schema_cols_cache = (
                frozenset(
                    n for n, ts in seen.items() if ts == {"boolean"}
                ),
                frozenset(n for n, ts in seen.items() if ts == {"string"}),
                frozenset(
                    n for n, ts in seen.items() if ts == {"timestamp"}
                ),
                frozenset(
                    n for n, ts in seen.items()
                    if ts and ts <= {"double", "float"}
                ),
                frozenset(n for n, ts in seen.items() if ts == {"long"}),
            )
        return self._schema_cols_cache

    def set_option(self, name: str, value: bool) -> None:
        """SET <query option> equivalent."""
        self.options[name] = value

    def table(self, name: str) -> DataFrame:
        return catalog.read_table(self.spark, name, self.sf_dir)

    def explain(self, impala_sql: str) -> str:
        """EXPLAIN output; `SET explain_verbose=true` switches to Spark's
        extended mode (logical + physical plans) — the analogue of the
        reference's EXPLAIN_LEVEL=verbose (query-options.h EXPLAIN_LEVEL;
        higher levels add per-node detail the same way)."""
        df = self.sql(impala_sql)
        mode = "extended" if self.options.get("explain_verbose") else "formatted"
        return df._jdf.queryExecution().explainString(
            self.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
        )

    # -- UDF surface (SURVEY.md §2.12: CREATE FUNCTION / SHOW FUNCTIONS;
    #    reference grammar sql-parser.cup:693-695,657) --------------------

    def create_function(
        self,
        name: str,
        fn=None,
        return_type=None,
        sql_params: str | None = None,
        sql_returns: str | None = None,
        sql_body: str | None = None,
    ) -> None:
        """CREATE [TEMPORARY] FUNCTION equivalent.

        Two forms, mirroring the reference's native-UDF vs SQL-expression
        split: a Python callable (registered Arrow-side when possible), or a
        SQL expression body (pure Catalyst, whole-stage codegen)."""
        if fn is not None:
            self.spark.udf.register(name, fn, returnType=return_type)
            return
        if sql_body is None:
            raise ValueError("pass a callable fn or a sql_body")
        self.spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({sql_params or ''}) "
            f"RETURNS {sql_returns or 'STRING'} RETURN {sql_body}"
        )

    #: Impala type name → Spark DDL type for Java-UDF RETURNS clauses
    _JAVA_FN_TYPES = {
        "string": "string", "varchar": "string", "char": "string",
        "tinyint": "tinyint", "smallint": "smallint", "int": "int",
        "bigint": "bigint", "float": "float", "double": "double",
        "boolean": "boolean", "timestamp": "timestamp", "date": "date",
        "binary": "binary",
    }

    def create_java_function(
        self, name: str, jar: str, symbol: str, returns: str | None = None
    ) -> None:
        """CREATE FUNCTION <name> [...] LOCATION '<jar>' SYMBOL='<class>' —
        the reference's Java-UDF-from-JAR form (CreateUdfStmt,
        fe/.../analysis/CreateUdfStmt.java; hive-udf-call.h). The jar is
        added to the session classpath and the class registered through
        Spark's Java UDF bridge. The class must implement
        org.apache.spark.sql.api.java.UDF1..22 — Hive-interface UDF
        classes need a Hive-enabled session catalog, which the session
        (in-memory) catalog is not; the error says so explicitly."""
        import os

        if not os.path.exists(jar):
            raise ValueError(f"Could not load binary: {jar}")
        self.spark.sql(f"ADD JAR {jar}")
        rtype = None
        if returns:
            base = returns.split("(")[0].strip().lower()
            rtype = (
                returns.lower()
                if base == "decimal"
                else self._JAVA_FN_TYPES.get(base)
            )
            if rtype is None:
                raise ValueError(f"unsupported RETURNS type: {returns}")
        try:
            self.spark.udf.registerJavaFunction(name, symbol, rtype)
        except Exception as exc:  # noqa: BLE001 - reclassify for the user
            raise ValueError(
                f"CREATE FUNCTION {name}: class {symbol!r} could not be "
                "registered. It must implement "
                "org.apache.spark.sql.api.java.UDF1..UDF22; classes "
                "extending org.apache.hadoop.hive.ql.exec.UDF require a "
                "Hive-enabled session catalog (documented delta). "
                f"Underlying error: {exc}"
            ) from exc

    def create_aggregate_function(
        self,
        name: str,
        fn=None,
        return_type: str = "double",
        *,
        init=None,
        update=None,
        merge=None,
        finalize=None,
    ) -> None:
        """CREATE AGGREGATE FUNCTION equivalent (grammar
        sql-parser.cup:693-695; UDA contract be/src/udf/udf.h:379-391).

        Two forms:
          * `fn`: pandas Series(s) → scalar, Arrow-batched (grouped-agg
            pandas UDF) — the idiomatic vectorized form. Usable from
            engine.sql() in GROUP BY aggregations and OVER() windows.
            NOTE: this form plans as a whole-group Arrow aggregate — every
            group ships to one task as one batch (documented memory bound).
          * `init`/`update`/`merge`/`finalize`: the reference's full UDA
            callback contract (Merge at udf.h:388). When `merge` is
            supplied, the engine restores the distributive contract: it
            registers a `<name>__partial` (Init/Update fold per
            (key, salt) sub-group → pickled BINARY state) and
            `<name>__merge` (Merge fold over partials + Finalize) pair,
            and engine.sql() rewrites canonical aggregate statements
            calling `name` into the salted two-stage plan (hopspark/uda.py)
            so no task ever materializes a whole group. Statements outside
            the rewriter's supported shape fall back to the whole-group
            fold registered under `name` (correct, memory-bound)."""
        import pickle

        from pyspark.sql import functions as F

        if fn is None:
            if update is None:
                raise ValueError("pass a vectorized fn or an update callback")

            import pandas as pd

            def fn(*cols: pd.Series):  # noqa: ANN202 — dynamic return type
                acc = init() if init is not None else None
                # iterate plain lists, not Series: Series iteration boxes
                # every element into a numpy scalar (~5x slower row loop)
                for vals in zip(*(c.to_list() for c in cols)):
                    acc = update(acc, *vals)
                return finalize(acc) if finalize is not None else acc

            if merge is not None:

                def partial_fn(*cols: pd.Series) -> bytes:
                    acc = init() if init is not None else None
                    for vals in zip(*(c.to_list() for c in cols)):
                        acc = update(acc, *vals)
                    return pickle.dumps(acc)

                def merge_fn(parts: pd.Series):  # noqa: ANN202
                    acc = init() if init is not None else None
                    for blob in parts:
                        acc = merge(acc, pickle.loads(blob))
                    return finalize(acc) if finalize is not None else acc

                self.spark.udf.register(
                    f"{name}__partial",
                    F.pandas_udf(
                        partial_fn, "binary", F.PandasUDFType.GROUPED_AGG
                    ),
                )
                self.spark.udf.register(
                    f"{name}__merge",
                    F.pandas_udf(
                        merge_fn, return_type, F.PandasUDFType.GROUPED_AGG
                    ),
                )
                self._mergeable_udas.add(name.lower())

        udaf = F.pandas_udf(fn, return_type, F.PandasUDFType.GROUPED_AGG)
        self.spark.udf.register(name, udaf)

    @staticmethod
    def _ts_lit_to_ms(lit: str | None) -> int | None:
        if lit is None:
            return None
        if lit.isdigit():
            return int(lit)
        import datetime as _dt

        return int(
            _dt.datetime.fromisoformat(lit.strip("'")).timestamp() * 1000
        )

    def describe_history(
        self,
        path: str,
        from_lit: str | None = None,
        lo_lit: str | None = None,
        hi_lit: str | None = None,
    ):
        """DESCRIBE HISTORY '<iceberg path>' [FROM ts | BETWEEN a AND b] —
        the reference's Iceberg snapshot-log statement
        (Frontend.java:1230-1248): creation_time, snapshot_id, parent_id,
        is_current_ancestor (+ operation, our extension). Timestamp bounds
        accept epoch-millis integers or quoted ISO timestamps."""
        from hopspark.sources.iceberg import describe_history

        rows = describe_history(
            path,
            from_ms=self._ts_lit_to_ms(from_lit or lo_lit),
            to_ms=self._ts_lit_to_ms(hi_lit),
        )
        data = [
            (
                r["creation_time"],
                r["snapshot_id"],
                r["parent_id"],
                r["is_current_ancestor"],
                r["operation"],
            )
            for r in rows
        ]
        df = self.spark.createDataFrame(
            data or [(0, 0, None, False, "")],
            "creation_time_ms BIGINT, snapshot_id BIGINT, parent_id BIGINT, "
            "is_current_ancestor BOOLEAN, operation STRING",
        )
        if not data:
            df = df.filter("snapshot_id <> 0 OR operation <> ''")
        return df.selectExpr(
            "timestamp_millis(creation_time_ms) AS creation_time",
            "snapshot_id",
            "parent_id",
            "is_current_ancestor",
            "operation",
        )

    def drop_function(self, name: str) -> None:
        self.spark.sql(f"DROP TEMPORARY FUNCTION IF EXISTS {name}")

    def show_functions(self, pattern: str | None = None) -> list[str]:
        """SHOW FUNCTIONS [LIKE 'pattern'] — names visible to this session."""
        q = "SHOW USER FUNCTIONS"
        if pattern:
            q += f" LIKE '{pattern}'"
        return [r[0] for r in self.spark.sql(q).collect()]

    def profile(self, impala_sql: str) -> dict[str, dict[str, str]]:
        """Execute the statement and return per-operator runtime metrics —
        the RUNTIME_PROFILE analogue (reference: per-node counters in the
        query profile, be/src/util/runtime-profile.h). Keys are physical
        operator names with plan ids; values are Spark SQL metric name →
        formatted value."""
        df = self.sql(impala_sql)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan()
        out: dict[str, dict[str, str]] = {}

        def walk(node) -> None:
            name = f"{node.nodeName()} (id={node.id()})"
            metrics = {}
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                metrics[str(kv._1())] = str(kv._2().value())
            if metrics:
                out[name] = metrics
            # AQE wrappers don't expose their subtree via children():
            # AdaptiveSparkPlanExec -> executedPlan(), QueryStageExec -> plan()
            for unwrap in ("executedPlan", "plan"):
                if hasattr(node, unwrap):
                    try:
                        walk(getattr(node, unwrap)())
                        return
                    except Exception:
                        pass
            cit = node.children().iterator()
            while cit.hasNext():
                walk(cit.next())

        walk(plan)
        return out

    # -- file/partition metadata surface (SHOW FILES / SHOW PARTITIONS —
    #    fe/.../analysis/ShowFilesStmt.java, ShowPartitionsStmt.java) ------

    @staticmethod
    def _pretty_size(n: float) -> str:
        """The reference's PrettyPrinter byte rendering (util/pretty-
        printer.h): two decimals with a B/KB/MB/GB/TB unit."""
        for unit in ("B", "KB", "MB", "GB"):
            if n < 1024:
                return f"{n:.2f}{unit}"
            n /= 1024.0
        return f"{n:.2f}TB"

    def _table_root(self, table: str) -> str:
        import os

        path = catalog.table_path(self.sf_dir, table.lower())
        if not os.path.exists(path):
            raise ValueError(f"Could not resolve path for table: {table}")
        return path

    def show_files(self, table: str) -> DataFrame:
        """SHOW FILES IN <table> → (Path, Size, Partition) per data file,
        like the reference's ShowFilesStmt result set. Hidden and
        bookkeeping files (dot / underscore prefixes) are skipped; for a
        partitioned directory tree the Partition column carries the
        key=value spec relative to the table root."""
        import os

        root = self._table_root(table)
        rows: list[tuple[str, str, str]] = []
        if os.path.isfile(root):
            rows.append((root, self._pretty_size(os.path.getsize(root)), ""))
        else:
            for dirpath, dirs, files in os.walk(root):
                dirs.sort()
                rel = os.path.relpath(dirpath, root)
                part = "" if rel == "." else rel.replace(os.sep, "/")
                for fn in sorted(files):
                    if fn.startswith((".", "_")):
                        continue
                    full = os.path.join(dirpath, fn)
                    rows.append(
                        (full, self._pretty_size(os.path.getsize(full)), part)
                    )
        return self.spark.createDataFrame(
            rows, "Path string, Size string, Partition string"
        )

    def _partition_layout(self, table: str) -> dict[tuple, list[float]]:
        """Walk the table's directory tree → {((key, value), ...): [n_files,
        bytes]} for every key=value partition directory; empty dict when
        the table is a single file / unpartitioned directory."""
        import os

        root = self._table_root(table)
        parts: dict[tuple, list[float]] = {}
        if os.path.isdir(root):
            for dirpath, dirs, files in os.walk(root):
                dirs.sort()
                data = [f for f in files if not f.startswith((".", "_"))]
                rel = os.path.relpath(dirpath, root)
                if not data or rel == ".":
                    continue
                segs = rel.split(os.sep)
                if not all("=" in s for s in segs):
                    continue
                key = tuple(tuple(s.split("=", 1)) for s in segs)
                acc = parts.setdefault(key, [0, 0.0])
                acc[0] += len(data)
                acc[1] += sum(
                    os.path.getsize(os.path.join(dirpath, f)) for f in data
                )
        return parts

    def show_partitions(self, table: str) -> DataFrame:
        """SHOW PARTITIONS <table> → one row per key=value partition
        directory with the partition key values, #Rows (-1 unless
        COMPUTE STATS ran — the reference's convention), #Files and Size.
        Raises on unpartitioned tables like the reference's
        ShowPartitionsStmt analysis."""
        try:
            parts = self._partition_layout(table)
        except ValueError:
            # not an sf_dir-registered table: catalog (warehouse) tables
            # go through Spark's native SHOW PARTITIONS
            return self.spark.sql(f"SHOW PARTITIONS {table}")
        if not parts:
            raise ValueError(f"Table is not partitioned: {table}")
        key_cols = [k for k, _ in next(iter(parts))]
        rows = [
            tuple(v for _, v in key) + (-1, n, self._pretty_size(size))
            for key, (n, size) in sorted(parts.items())
        ]
        schema = (
            ", ".join(f"`{k}` string" for k in key_cols)
            + ", `#Rows` long, `#Files` long, Size string"
        )
        return self.spark.createDataFrame(rows, schema)

    # -- stats surface (COMPUTE STATS / SHOW TABLE|COLUMN STATS —
    #    fe/.../analysis/ComputeStatsStmt.java builds exactly these child
    #    queries: COUNT(*) + per-column NDV/nulls/size aggregates) ---------

    def compute_stats(self, table: str) -> DataFrame:
        """COMPUTE STATS <table>: run the reference's child-query plan —
        one scan computing COUNT(*) plus per-column ndv / null count /
        max & avg widths — and cache the results for SHOW ... STATS.

        One pass over the table produces every statistic (the reference
        issues the same fused aggregation); at 100 TB this is a single
        scan + one tiny all-partials reduce, and the resulting NDVs are
        the HLL estimates the planner would use for join ordering."""
        from pyspark.sql import functions as F

        df = self.table(table)
        aggs: list = [F.count(F.lit(1)).alias("__rows")]
        for f in df.schema.fields:
            c = f.name
            aggs.append(F.approx_count_distinct(c).alias(f"__ndv__{c}"))
            aggs.append(
                F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls__{c}")
            )
            if f.dataType.simpleString() in ("string", "binary"):
                size = F.length(c)
                aggs.append(F.max(size).alias(f"__maxsz__{c}"))
                aggs.append(F.round(F.avg(size), 4).alias(f"__avgsz__{c}"))
        row = df.agg(*aggs).collect()[0]
        fixed = {
            "tinyint": 1, "smallint": 2, "int": 4, "bigint": 8, "float": 4,
            "double": 8, "date": 4, "boolean": 1, "timestamp": 16,
            "timestamp_ntz": 16,
        }
        cols = []
        for f in df.schema.fields:
            t = f.dataType.simpleString()
            mx = row[f"__maxsz__{f.name}"] if f"__maxsz__{f.name}" in row.asDict() else fixed.get(t, -1)
            av = row[f"__avgsz__{f.name}"] if f"__avgsz__{f.name}" in row.asDict() else float(fixed.get(t, -1))
            cols.append(
                (
                    f.name,
                    t,
                    int(row[f"__ndv__{f.name}"]),
                    int(row[f"__nulls__{f.name}"]),
                    int(mx if mx is not None else -1),
                    float(av if av is not None else -1.0),
                )
            )
        self._stats = getattr(self, "_stats", {})
        self._stats[table.lower()] = {"rows": int(row["__rows"]), "cols": cols}
        return self.spark.createDataFrame(
            [(f"Updated 1 partition(s) and {len(cols)} column(s).",)],
            "summary string",
        )

    def compute_incremental_stats(self, table: str) -> DataFrame:
        """COMPUTE INCREMENTAL STATS <table> — the reference's
        per-partition stats path (ComputeStatsStmt incremental mode,
        compute-stats-incremental.test): partitions that already have
        cached stats are NOT rescanned; only new partitions are read, with
        the partition predicate pruning every other directory at the scan.

        Per-partition intermediate state is an HLL sketch per column
        (Spark's hll_sketch_agg — the same mergeable-NDV design the
        reference persists per partition), so table-level NDVs come from
        hll_union over partition sketches without ever re-reading old
        data. At 100 TB with daily partitions, a refresh costs one
        partition's scan, not the table's."""
        from pyspark.sql import functions as F

        layout = self._partition_layout(table)
        if not layout:
            # unpartitioned: incremental degenerates to a full compute
            return self.compute_stats(table)
        cache = getattr(self, "_inc_stats", None)
        if cache is None:
            cache = self._inc_stats = {}
        tstate = cache.setdefault(table.lower(), {})
        missing = [k for k in layout if k not in tstate]
        pcols = [k for k, _ in next(iter(layout))]
        if missing:
            df = self.spark.read.parquet(self._table_root(table))
            pred = None
            for key in missing:
                clause = None
                for col, val in key:
                    c = F.col(col).cast("string") == F.lit(val)
                    clause = c if clause is None else (clause & c)
                pred = clause if pred is None else (pred | clause)
            df = df.where(pred)
            data_cols = [f for f in df.schema.fields if f.name not in pcols]
            aggs = [F.count(F.lit(1)).alias("__rows")]
            for f in data_cols:
                t = f.dataType.simpleString()
                if t in ("tinyint", "smallint", "int", "bigint"):
                    sk = F.expr(f"hll_sketch_agg(CAST(`{f.name}` AS BIGINT))")
                elif t in ("string", "binary"):
                    sk = F.expr(f"hll_sketch_agg(`{f.name}`)")
                else:
                    sk = F.expr(f"hll_sketch_agg(CAST(`{f.name}` AS STRING))")
                aggs.append(sk.alias(f"__sk__{f.name}"))
                aggs.append(
                    F.sum(F.col(f.name).isNull().cast("long")).alias(
                        f"__nulls__{f.name}"
                    )
                )
            for row in df.groupBy(*pcols).agg(*aggs).collect():
                key = tuple((c, str(row[c])) for c in pcols)
                tstate[key] = {
                    "rows": int(row["__rows"]),
                    "cols": {
                        f.name: {
                            "sketch": bytes(row[f"__sk__{f.name}"])
                            if row[f"__sk__{f.name}"] is not None
                            else None,
                            "nulls": int(row[f"__nulls__{f.name}"]),
                            "type": f.dataType.simpleString(),
                        }
                        for f in data_cols
                    },
                }
        # fold the per-partition state into the table-level stats cache so
        # SHOW TABLE|COLUMN STATS read merged numbers
        total_rows = sum(s["rows"] for s in tstate.values())
        col_names: list[str] = []
        for s in tstate.values():
            for c in s["cols"]:
                if c not in col_names:
                    col_names.append(c)
        merged_cols = []
        for c in col_names:
            sketches = [
                (s["cols"][c]["sketch"],)
                for s in tstate.values()
                if s["cols"].get(c, {}).get("sketch") is not None
            ]
            if sketches:
                ndv = int(
                    self.spark.createDataFrame(sketches, "sk binary")
                    .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))"))
                    .collect()[0][0]
                )
            else:
                ndv = 0
            nulls = sum(
                s["cols"][c]["nulls"] for s in tstate.values() if c in s["cols"]
            )
            ctype = next(
                s["cols"][c]["type"] for s in tstate.values() if c in s["cols"]
            )
            merged_cols.append((c, ctype, ndv, nulls, -1, -1.0))
        self._stats = getattr(self, "_stats", {})
        self._stats[table.lower()] = {"rows": total_rows, "cols": merged_cols}
        return self.spark.createDataFrame(
            [
                (
                    f"Updated {len(missing)} partition(s) and "
                    f"{len(col_names)} column(s).",
                )
            ],
            "summary string",
        )

    def show_table_stats(self, table: str) -> DataFrame:
        """SHOW TABLE STATS <table> — #Rows per the cached COMPUTE STATS
        (-1 when stats were never computed, the reference's convention).
        After COMPUTE INCREMENTAL STATS on a partitioned table, one row
        per partition plus the Total row, like the reference's
        partitioned-table result shape."""
        inc = getattr(self, "_inc_stats", {}).get(table.lower())
        if inc:
            layout = self._partition_layout(table)
            key_cols = [k for k, _ in next(iter(inc))]
            rows = []
            for key, st in sorted(inc.items()):
                n_files, size = layout.get(key, [0, 0.0])
                rows.append(
                    tuple(v for _, v in key)
                    + (st["rows"], int(n_files), self._pretty_size(size))
                )
            rows.append(
                ("Total",) * len(key_cols)
                + (
                    sum(s["rows"] for s in inc.values()),
                    int(sum(v[0] for v in layout.values())),
                    self._pretty_size(sum(v[1] for v in layout.values())),
                )
            )
            schema = (
                ", ".join(f"`{k}` string" for k in key_cols)
                + ", `#Rows` long, `#Files` long, Size string"
            )
            return self.spark.createDataFrame(rows, schema)
        st = getattr(self, "_stats", {}).get(table.lower())
        rows = st["rows"] if st else -1
        return self.spark.createDataFrame([(rows,)], "`#Rows` long")

    def show_column_stats(self, table: str) -> DataFrame:
        """SHOW COLUMN STATS <table> — column, type, #distinct values,
        #nulls, max size, avg size (reference output shape)."""
        st = getattr(self, "_stats", {}).get(table.lower())
        if st is None:
            df = self.table(table)
            data = [
                (f.name, f.dataType.simpleString(), -1, -1, -1, -1.0)
                for f in df.schema.fields
            ]
        else:
            data = st["cols"]
        return self.spark.createDataFrame(
            data,
            "column string, type string, `#Distinct Values` long, "
            "`#Nulls` long, `Max Size` long, `Avg Size` double",
        )

    # -- metadata surface (SHOW TABLES / DESCRIBE — grammar
    #    sql-parser.cup:637-731 SHOW/DESCRIBE productions) ----------------

    def show_tables(self) -> list[str]:
        return [r.tableName for r in self.spark.sql("SHOW TABLES").collect()]

    def refresh(self, table: str | None = None) -> None:
        """REFRESH <table> / INVALIDATE METADATA [<table>] — drop cached
        file listings and data so the next scan sees new files (the
        reference's catalog-cache invalidation; on Spark the FileIndex and
        block caches are the state being invalidated). A full INVALIDATE
        METADATA also re-registers the engine's table views."""
        if table:
            self.spark.catalog.refreshTable(table)
        else:
            self.spark.catalog.clearCache()
            # force: the registration marker must not short-circuit an
            # explicit INVALIDATE METADATA — stale InMemoryFileIndex
            # listings are exactly what the user is flushing (r12 ADVICE).
            catalog.register(self.spark, self.sf_dir, force=True)

    def describe(self, table: str) -> list[tuple[str, str]]:
        """DESCRIBE <table> → [(col_name, data_type)]."""
        return [
            (r.col_name, r.data_type)
            for r in self.spark.sql(f"DESCRIBE TABLE {table}").collect()
            if r.col_name and not r.col_name.startswith("#")
        ]


def _impala_type_name(dt) -> str:
    """Spark type → Impala DDL type name (PrimitiveType.java:25-58)."""
    from pyspark.sql import types as T

    if isinstance(dt, T.LongType):
        return "BIGINT"
    if isinstance(dt, T.IntegerType):
        return "INT"
    if isinstance(dt, T.ShortType):
        return "SMALLINT"
    if isinstance(dt, T.ByteType):
        return "TINYINT"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "TIMESTAMP"
    if isinstance(dt, T.ArrayType):
        return f"ARRAY<{_impala_type_name(dt.elementType)}>"
    if isinstance(dt, T.MapType):
        return (
            f"MAP<{_impala_type_name(dt.keyType)},"
            f"{_impala_type_name(dt.valueType)}>"
        )
    if isinstance(dt, T.StructType):
        inner = ",".join(
            f"{f.name}:{_impala_type_name(f.dataType)}" for f in dt.fields
        )
        return f"STRUCT<{inner}>"
    return dt.simpleString().upper()
