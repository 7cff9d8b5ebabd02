"""ALTER TABLE / DESCRIBE statement surface.

Reference: the AlterTable*Stmt family under
fe/src/main/java/org/apache/impala/analysis/ (AlterTableAddColsStmt.java:42,
AlterTableDropColStmt.java:34, AlterTableAlterColStmt.java,
AlterTableReplaceColsStmt.java, AlterTableOrViewRenameStmt.java,
AlterTableSetTblProperties.java, AlterTableUnSetTblProperties.java:42) and
the behavior pinned by
testdata/workloads/functional-query/queries/QueryTest/alter-table.test.

In the reference these are metastore metadata edits: existing data files
are untouched, and scans resolve the new schema against old files (absent
column → NULL, changed type → cast at read). The Spark-first equivalent for
a temp-view catalog is a *projection re-registration*: the view is replaced
by a SELECT over its previous definition that adds NULL-typed columns,
drops, renames/casts, or re-maps positionally — which reproduces exactly
the reference's read-side semantics without rewriting a byte of data. At
100 TB that property is the whole point of ALTER TABLE: schema evolution
must be O(metadata), never a table rewrite, and a projection layer over an
immutable scan is precisely that.

Result-set messages mirror alter-table.test expectations
("New column(s) have been added to the table.", …).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F


def split_top_level(s: str, sep: str = ",") -> list[str]:
    """Split on `sep` outside (), <> and single quotes — column-def lists
    contain decimal(10,2), array<struct<...>> and quoted comments."""
    out, depth, quote, cur = [], 0, False, []
    for ch in s:
        if quote:
            cur.append(ch)
            if ch == "'":
                quote = False
            continue
        if ch == "'":
            quote = True
            cur.append(ch)
        elif ch in "(<":
            depth += 1
            cur.append(ch)
        elif ch in ")>":
            depth -= 1
            cur.append(ch)
        elif ch == sep and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return [p.strip() for p in out if p.strip()]


_COLDEF_RE = re.compile(
    r"^\s*(\w+)\s+(.+?)(?:\s+COMMENT\s+'((?:[^']|'')*)')?\s*$",
    re.I | re.S,
)


def parse_col_defs(body: str) -> list[tuple[str, str, str | None]]:
    """'(c1 bigint comment 'id', c2 array<int>)' → [(name, type, comment)]."""
    body = body.strip()
    if body.startswith("(") and body.endswith(")"):
        body = body[1:-1]
    defs = []
    for item in split_top_level(body):
        m = _COLDEF_RE.match(item)
        if not m:
            raise ValueError(f"cannot parse column definition: {item!r}")
        name, ctype, comment = m.groups()
        defs.append((name.lower(), ctype.strip(), comment))
    return defs


#: Impala column type → Spark DDL cast type. Most names coincide; CHAR and
#: VARCHAR keep their length semantics (Spark enforces both since 3.1).
def spark_type(impala_type: str) -> str:
    t = impala_type.strip().lower()
    return {"real": "double"}.get(t, t)


_ADD_COLS_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+([\w.]+)\s+ADD\s+"
    r"(IF\s+NOT\s+EXISTS\s+)?COLUMNS?\s*"
    r"(IF\s+NOT\s+EXISTS\s+)?(\(.*\)|\w+\s+.+?)\s*;?\s*$",
    re.I | re.S,
)
_DROP_COL_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+([\w.]+)\s+DROP\s+(?:COLUMN\s+)?(\w+)\s*;?\s*$",
    re.I,
)
_CHANGE_COL_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+([\w.]+)\s+CHANGE\s+(?:COLUMN\s+)?"
    r"(\w+)\s+(\w+)\s+(.+?)(?:\s+COMMENT\s+'((?:[^']|'')*)')?\s*;?\s*$",
    re.I | re.S,
)
_REPLACE_COLS_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+([\w.]+)\s+REPLACE\s+COLUMNS\s*(\(.*\))\s*;?\s*$",
    re.I | re.S,
)
_RENAME_RE = re.compile(
    r"^\s*ALTER\s+(?:TABLE|VIEW)\s+([\w.]+)\s+RENAME\s+TO\s+([\w.]+)\s*;?\s*$",
    re.I,
)
_SET_PROPS_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+([\w.]+)\s+SET\s+TBLPROPERTIES\s*\((.*)\)\s*;?\s*$",
    re.I | re.S,
)
_UNSET_PROPS_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+([\w.]+)\s+UNSET\s+TBLPROPERTIES\s*"
    r"(IF\s+EXISTS\s+)?\((.*)\)\s*;?\s*$",
    re.I | re.S,
)
_SET_OWNER_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+([\w.]+)\s+SET\s+OWNER\s+"
    r"(USER|ROLE)\s+(\w+)\s*;?\s*$",
    re.I,
)
_PROP_PAIR_RE = re.compile(r"'((?:[^']|'')*)'\s*=\s*'((?:[^']|'')*)'")


class AlterTableMixin:
    """engine.sql() dispatch + state for the ALTER TABLE / DESCRIBE surface.

    Mixed into Engine; uses self.spark and contributes `_tbl_props` /
    `_col_comments` session-catalog metadata (the metastore-side state the
    reference keeps in HMS)."""

    _tbl_props: dict[str, dict[str, str]]
    _col_comments: dict[str, dict[str, str]]

    def _meta(self, attr: str, table: str) -> dict:
        store = getattr(self, attr, None)
        if store is None:
            store = {}
            setattr(self, attr, store)
        return store.setdefault(table.lower(), {})

    def _msg(self, text: str) -> DataFrame:
        return self.spark.createDataFrame([(text,)], "summary string")

    def _replace_view(self, name: str, df: DataFrame) -> None:
        df.createOrReplaceTempView(name)
        self._schema_cols_cache = None
        # Replacing a CATALOG table's view invalidates the session's
        # registration marker (hopspark.catalog.register), so the next
        # Engine construction re-registers the pristine catalog views —
        # the exact pre-r12 behavior (every Engine() re-registered).
        from hopspark import catalog as _catalog

        if name.lower() in _catalog.SCHEMAS and hasattr(
            self.spark, "_hopspark_tables_registered"
        ):
            self.spark._hopspark_tables_registered = None

    # -- dispatch ---------------------------------------------------------

    def try_alter_or_describe(self, sql: str) -> DataFrame | None:
        """Handle ALTER TABLE / DESCRIBE; None when the statement is
        neither (caller falls through to query translation)."""
        m = _ADD_COLS_RE.match(sql)
        if m:
            table, ine1, ine2, body = m.groups()
            return self._add_columns(
                table, parse_col_defs(body), bool(ine1 or ine2)
            )
        m = _CHANGE_COL_RE.match(sql)
        if m:
            table, old, new, ctype, comment = m.groups()
            return self._change_column(table, old, new, ctype, comment)
        m = _REPLACE_COLS_RE.match(sql)
        if m:
            return self._replace_columns(m.group(1), parse_col_defs(m.group(2)))
        m = _DROP_COL_RE.match(sql)
        if m:
            return self._drop_column(m.group(1), m.group(2))
        m = _RENAME_RE.match(sql)
        if m:
            return self._rename(m.group(1), m.group(2))
        m = _SET_PROPS_RE.match(sql)
        if m:
            props = self._meta("_tbl_props", m.group(1))
            for k, v in _PROP_PAIR_RE.findall(m.group(2)):
                props[k] = v
            return self._msg("Updated table.")
        m = _UNSET_PROPS_RE.match(sql)
        if m:
            table, if_exists, body = m.groups()
            props = self._meta("_tbl_props", table)
            for k in re.findall(r"'((?:[^']|'')*)'", body):
                if k in props:
                    del props[k]
                elif not if_exists:
                    raise ValueError(
                        f"Table property '{k}' does not exist."
                    )
            return self._msg("Updated table.")
        m = _SET_OWNER_RE.match(sql)
        if m:
            self._meta("_tbl_props", m.group(1))["owner"] = m.group(3)
            return self._msg("Updated table.")
        m = re.match(
            r"^\s*DESCRIBE\s+(FORMATTED\s+|EXTENDED\s+)?([\w.]+)\s*;?\s*$",
            sql,
            re.I,
        )
        if m:
            return self._describe(m.group(2), formatted=bool(m.group(1)))
        m = re.match(
            r"^\s*COMMENT\s+ON\s+TABLE\s+([\w.]+)\s+IS\s+"
            r"(?:'((?:[^']|'')*)'|(NULL))\s*;?\s*$",
            sql,
            re.I,
        )
        if m:
            # COMMENT ON TABLE (AlterTableOrViewSetTblProperties via the
            # CommentOnTableStmt path) — stored as the HMS 'comment' prop
            props = self._meta("_tbl_props", m.group(1))
            if m.group(3):
                props.pop("comment", None)
            else:
                props["comment"] = m.group(2)
            return self._msg("Updated table.")
        m = re.match(
            r"^\s*COMMENT\s+ON\s+COLUMN\s+([\w.]+)\.(\w+)\s+IS\s+"
            r"(?:'((?:[^']|'')*)'|(NULL))\s*;?\s*$",
            sql,
            re.I,
        )
        if m:
            table, col, text, null = m.groups()
            comments = self._meta("_col_comments", table)
            if null:
                comments.pop(col.lower(), None)
            else:
                comments[col.lower()] = text
            return self._msg("Column has been altered.")
        m = re.match(
            r"^\s*TRUNCATE\s+(?:TABLE\s+)?(IF\s+EXISTS\s+)?([\w.]+)\s*;?\s*$",
            sql,
            re.I,
        )
        if m:
            return self._truncate(m.group(2), bool(m.group(1)))
        m = re.match(
            r"^\s*LOAD\s+DATA\s+INPATH\s+'([^']+)'\s+(OVERWRITE\s+)?"
            r"INTO\s+TABLE\s+([\w.]+)\s*"
            r"(?:PARTITION\s*\(([^)]*)\))?\s*;?\s*$",
            sql,
            re.I,
        )
        if m:
            return self._load_data(
                m.group(1), bool(m.group(2)), m.group(3), m.group(4)
            )
        return None

    def _load_data(
        self, src: str, overwrite: bool, table: str, part_spec: str | None
    ) -> DataFrame:
        """LOAD DATA INPATH (LoadDataStmt,
        fe/.../analysis/LoadDataStmt.java:39-44): MOVE the source file or a
        directory's files into the table's storage directory — a pure
        file-system metadata operation, zero data read/rewritten (the
        property that makes bulk ingest O(files) at any scale) — then
        refresh the table's file listing. OVERWRITE clears existing data
        files first. PARTITION(...) targets the key=value subdirectory."""
        import os
        import shutil

        if not os.path.exists(src):
            raise ValueError(f"INPATH location does not exist: {src}")
        dest = self._storage_location(table)
        if part_spec:
            for kv in part_spec.split(","):
                k, v = kv.split("=", 1)
                dest = os.path.join(
                    dest, f"{k.strip()}={v.strip().strip(chr(39))}"
                )
            os.makedirs(dest, exist_ok=True)
        if not os.path.isdir(dest):
            raise ValueError(
                f"table {table} is not backed by a writable directory: {dest}"
            )
        moved = []
        srcs = (
            [os.path.join(src, f) for f in sorted(os.listdir(src))
             if not f.startswith((".", "_"))
             and os.path.isfile(os.path.join(src, f))]
            if os.path.isdir(src)
            else [src]
        )
        if overwrite:
            for f in os.listdir(dest):
                full = os.path.join(dest, f)
                if os.path.isfile(full) and not f.startswith((".", "_")):
                    os.remove(full)
        for f in srcs:
            shutil.move(f, os.path.join(dest, os.path.basename(f)))
            moved.append(f)
        self.spark.catalog.refreshTable(table)
        return self._msg(
            f"Loaded {len(moved)} file(s). Total files in destination "
            f"location: "
            + str(
                len(
                    [
                        f
                        for f in os.listdir(dest)
                        if not f.startswith((".", "_"))
                        and os.path.isfile(os.path.join(dest, f))
                    ]
                )
            )
        )

    def _storage_location(self, table: str) -> str:
        """A table's data directory: catalog (warehouse / LOCATION) tables
        via Spark's metadata, sf_dir-registered tables via the engine
        catalog."""
        try:
            rows = self.spark.sql(
                f"DESCRIBE TABLE EXTENDED {table}"
            ).collect()
            for r in rows:
                if r.col_name == "Location":
                    return re.sub(r"^file:(//)?", "", r.data_type)
        except Exception:  # noqa: BLE001 - fall through to engine catalog
            pass
        return self._table_root(table)

    def _truncate(self, table: str, if_exists: bool) -> DataFrame:
        """TRUNCATE TABLE (TruncateStmt, fe/.../analysis/TruncateStmt.java):
        the reference deletes every data file, leaving schema + zero rows.
        The temp-view equivalent replaces the view with a LIMIT-0 projection
        of itself — same schema, no rows, no data touched."""
        try:
            df = self.spark.table(table)
        except Exception:
            if if_exists:
                return self._msg("Table does not exist.")
            raise ValueError(f"Table does not exist: {table}") from None
        self._replace_view(table, df.limit(0))
        getattr(self, "_stats", {}).pop(table.lower(), None)
        getattr(self, "_inc_stats", {}).pop(table.lower(), None)
        return self._msg("Table has been truncated.")

    # -- column DDL -------------------------------------------------------

    def _add_columns(
        self,
        table: str,
        defs: list[tuple[str, str, str | None]],
        if_not_exists: bool,
    ) -> DataFrame:
        df = self.spark.table(table)
        have = {f.name.lower() for f in df.schema.fields}
        dups = [n for n, _, _ in defs if n in have]
        if dups and not if_not_exists:
            raise ValueError(f"Column already exists: {dups[0]}")
        fresh = [d for d in defs if d[0] not in have]
        if not fresh:
            return self._msg("No new column(s) have been added to the table.")
        comments = self._meta("_col_comments", table)
        for name, ctype, comment in fresh:
            df = df.withColumn(name, F.lit(None).cast(spark_type(ctype)))
            if comment:
                comments[name] = comment
        self._replace_view(table, df)
        return self._msg("New column(s) have been added to the table.")

    def _drop_column(self, table: str, col: str) -> DataFrame:
        df = self.spark.table(table)
        names = [f.name for f in df.schema.fields]
        if col.lower() not in {n.lower() for n in names}:
            raise ValueError(f"Column does not exist: {col}")
        if len(names) == 1:
            # AlterTableDropColStmt: cannot drop the only column
            raise ValueError(
                f"Cannot drop column {col!r}: a table must have at least "
                "one column"
            )
        keep = [n for n in names if n.lower() != col.lower()]
        self._replace_view(table, df.select(*keep))
        self._meta("_col_comments", table).pop(col.lower(), None)
        return self._msg("Column has been dropped.")

    def _change_column(
        self, table: str, old: str, new: str, ctype: str, comment: str | None
    ) -> DataFrame:
        df = self.spark.table(table)
        names = [f.name for f in df.schema.fields]
        if old.lower() not in {n.lower() for n in names}:
            raise ValueError(f"Column does not exist: {old}")
        if new.lower() != old.lower() and new.lower() in {
            n.lower() for n in names
        }:
            raise ValueError(f"Column already exists: {new}")
        cols = [
            F.col(n).cast(spark_type(ctype)).alias(new.lower())
            if n.lower() == old.lower()
            else F.col(n)
            for n in names
        ]
        self._replace_view(table, df.select(*cols))
        comments = self._meta("_col_comments", table)
        comments.pop(old.lower(), None)
        if comment:
            comments[new.lower()] = comment
        return self._msg("Column has been altered.")

    def _replace_columns(
        self, table: str, defs: list[tuple[str, str, str | None]]
    ) -> DataFrame:
        """REPLACE COLUMNS maps the new schema onto existing columns BY
        POSITION (the reference's text-table semantics, alter-table.test
        'replace columns' block): surplus old columns are dropped, surplus
        new columns read as NULL."""
        df = self.spark.table(table)
        names = [f.name for f in df.schema.fields]
        cols = []
        comments = self._meta("_col_comments", table)
        comments.clear()
        for i, (name, ctype, comment) in enumerate(defs):
            st = spark_type(ctype)
            if i < len(names):
                cols.append(F.col(names[i]).cast(st).alias(name))
            else:
                cols.append(F.lit(None).cast(st).alias(name))
            if comment:
                comments[name] = comment
        self._replace_view(table, df.select(*cols))
        return self._msg("Table columns have been replaced.")

    def _rename(self, old: str, new: str) -> DataFrame:
        if "." in new:
            # db-qualified targets have no home in a temp-view catalog
            new = new.split(".")[-1]
        if "." in old:
            old = old.split(".")[-1]
        df = self.spark.table(old)
        view_def = self._view_defs.pop(old.lower(), None)
        self._replace_view(new, df)
        self.spark.catalog.dropTempView(old)
        # Renaming a CATALOG table AWAY drops its view while _replace_view
        # only invalidates the marker when the NEW name is a catalog table;
        # invalidate for the OLD name too so the next Engine() restores the
        # pristine catalog view (pre-r12 behavior) — r12 ADVICE.
        from hopspark import catalog as _catalog

        if old.lower() in _catalog.SCHEMAS and hasattr(
            self.spark, "_hopspark_tables_registered"
        ):
            self.spark._hopspark_tables_registered = None
        if view_def is not None:
            self._view_defs[new.lower()] = view_def
        for attr in ("_tbl_props", "_col_comments", "_stats", "_inc_stats"):
            store = getattr(self, attr, None)
            if store and old.lower() in store:
                store[new.lower()] = store.pop(old.lower())
        return self._msg("Renaming was successful.")

    # -- DESCRIBE ---------------------------------------------------------

    def _describe(self, table: str, formatted: bool = False) -> DataFrame:
        """DESCRIBE <t> → (name, type, comment) rows with Impala type
        names (DescribeResultFactory.buildDescribeMinimalResult);
        FORMATTED/EXTENDED appends the detailed-info block with location
        and table properties."""
        from hopspark.engine import _impala_type_name

        fields = self.spark.table(table).schema.fields
        comments = self._meta("_col_comments", table)
        rows = [
            (
                f.name,
                _impala_type_name(f.dataType).lower(),
                comments.get(f.name.lower(), ""),
            )
            for f in fields
        ]
        if formatted:
            rows.append(("", "", ""))
            rows.append(("# Detailed Table Information", "", ""))
            try:
                rows.append(("Location:", self._table_root(table), ""))
            except Exception:  # noqa: BLE001 - view without storage
                pass
            props = self._meta("_tbl_props", table)
            if props:
                rows.append(("Table Parameters:", "", ""))
                rows.extend(
                    ("", k, v) for k, v in sorted(props.items())
                )
        return self.spark.createDataFrame(
            rows, "name string, type string, comment string"
        )
