"""Mergeable user-defined aggregate (UDA) compilation.

The reference UDA contract is Init/Update/Merge/Serialize/Finalize
(be/src/udf/udf.h:379-391) — distributive by design: each node folds its
local rows with Update, then partial states are Merged on one node per
group. Spark's grouped-agg pandas UDF has no merge hook: every group is
shipped whole, as one Arrow batch, to a single task (AggregateInPandas /
ArrowAggregatePython plans). For a low-cardinality GROUP BY that is a
per-group memory bound — the one scale gap a direct registration keeps.

This module restores the distributive contract with a *plan rewrite*:

    SELECT k, uda(a, b) AS r FROM t WHERE p GROUP BY k

becomes

    SELECT k, uda__merge(__hop_p_0) AS r
    FROM (SELECT k, uda__partial(a, b) AS __hop_p_0
          FROM (SELECT *, pmod(spark_partition_id(), N) AS __hop_salt
                FROM t WHERE p) __hop_salted
          GROUP BY k, __hop_salt) __hop_partials
    GROUP BY k

where `uda__partial` folds Init/Update over each (key, salt) sub-group and
pickles the accumulator to BINARY, and `uda__merge` folds Merge over the
<= N partials per key and applies Finalize. No task ever materializes more
than one input partition's slice of a group, and the merge stage sees at
most N ~100-byte partials per key — the same two-phase shape a native
distributive aggregate uses.

The rewrite is a *targeted* token-level transform (same philosophy as
hopspark/dialect/translate.py): it fires only for the canonical single-block
aggregate shape and returns None otherwise, in which case the engine falls
back to the whole-group fold registration (correct, documented memory
bound). Supported shape:

    SELECT <items> FROM <relation> [WHERE ...] GROUP BY <cols>
        [ORDER BY ...] [LIMIT n]

where every select item is a group-by column, a mergeable-UDA call
`name(args) AS alias`, or a splittable builtin aggregate
(SUM/COUNT/MIN/MAX `(expr) AS alias`, no DISTINCT). Set operations, HAVING,
DISTINCT, window clauses, and CTEs fall back.
"""

from __future__ import annotations

from hopspark.dialect.translate import Tok, _is_code, tokenize

_CLAUSE_STARTS = ("FROM", "WHERE", "GROUP", "HAVING", "ORDER", "LIMIT")
_SPLITTABLE = {"SUM": "SUM", "COUNT": "SUM", "MIN": "MIN", "MAX": "MAX"}
_BLOCKERS = {"UNION", "INTERSECT", "EXCEPT", "QUALIFY", "WINDOW", "WITH"}


def _code_indices(toks: list[Tok]) -> list[int]:
    return [i for i, t in enumerate(toks) if _is_code(t)]


def _clause_spans(toks: list[Tok]) -> dict[str, tuple[int, int]] | None:
    """Map top-level clause name -> (start_tok_idx, end_tok_idx) half-open.

    Returns None when the statement is not a single plain SELECT block
    (set ops, CTEs, DISTINCT, HAVING ... -> unsupported)."""
    idx = _code_indices(toks)
    if not idx or toks[idx[0]].upper != "SELECT":
        return None
    spans: dict[str, tuple[int, int]] = {}
    depth = 0
    cur = "SELECT"
    cur_start = idx[0] + 1
    k = 1
    while k < len(idx):
        i = idx[k]
        t = toks[i]
        if t.text == "(":
            depth += 1
        elif t.text == ")":
            depth -= 1
        elif depth == 0 and t.kind == "word":
            up = t.upper
            if up in _BLOCKERS:
                return None
            if up in _CLAUSE_STARTS:
                if up in ("GROUP", "ORDER"):
                    nxt = idx[k + 1] if k + 1 < len(idx) else None
                    if nxt is None or toks[nxt].upper != "BY":
                        k += 1
                        continue
                    spans[cur] = (cur_start, i)
                    cur = up
                    cur_start = nxt + 1
                    k += 2
                    continue
                spans[cur] = (cur_start, i)
                cur = up
                cur_start = i + 1
        k += 1
    spans[cur] = (cur_start, len(toks))
    if "HAVING" in spans or "FROM" not in spans:
        return None
    # DISTINCT straight after SELECT -> unsupported
    sel_s, sel_e = spans["SELECT"]
    j = sel_s
    while j < sel_e and not _is_code(toks[j]):
        j += 1
    if j < sel_e and toks[j].upper == "DISTINCT":
        return None
    return spans


def _split_top_commas(toks: list[Tok], s: int, e: int) -> list[tuple[int, int]]:
    """Half-open (start, end) spans of comma-separated items in toks[s:e]."""
    out: list[tuple[int, int]] = []
    depth = 0
    start = s
    for i in range(s, e):
        t = toks[i]
        if t.text == "(":
            depth += 1
        elif t.text == ")":
            depth -= 1
        elif t.text == "," and depth == 0:
            out.append((start, i))
            start = i + 1
    out.append((start, e))
    return out


def _text(toks: list[Tok], s: int, e: int) -> str:
    return "".join(t.text for t in toks[s:e]).strip()


def _item_parts(toks: list[Tok], s: int, e: int):
    """Split one select item into (expr_span, alias|None).

    Only the trailing `AS alias` / bare-word alias after a ')' or word is
    recognized; anything fancier returns alias None with the full span."""
    idx = [i for i in range(s, e) if _is_code(toks[i])]
    if len(idx) >= 3 and toks[idx[-2]].upper == "AS" and toks[idx[-1]].kind in ("word", "bquote"):
        return (s, idx[-2]), toks[idx[-1]].text.strip("`")
    return (s, e), None


def _parse_call(toks: list[Tok], s: int, e: int) -> tuple[str, str] | None:
    """If toks[s:e] is exactly `name ( args )`, return (name_upper, args_text)."""
    idx = [i for i in range(s, e) if _is_code(toks[i])]
    if len(idx) < 3 or toks[idx[0]].kind != "word" or toks[idx[1]].text != "(":
        return None
    if toks[idx[-1]].text != ")":
        return None
    depth = 0
    for j in idx[1:-1]:
        if toks[j].text == "(":
            depth += 1
        elif toks[j].text == ")":
            depth -= 1
            if depth == 0:
                return None  # ')' before the end — not a single call
    return toks[idx[0]].upper, _text(toks, idx[1] + 1, idx[-1])


def rewrite_mergeable_uda(
    sql: str, uda_names: set[str], salt_buckets: int = 64
) -> str | None:
    """Rewrite a canonical aggregate statement calling a mergeable UDA into
    the salted two-stage partial/merge plan. Returns None when the statement
    shape is outside the supported subset (caller falls back to the
    whole-group registration)."""
    upper_names = {n.upper() for n in uda_names}
    toks = tokenize(sql)
    spans = _clause_spans(toks)
    if spans is None:
        return None

    # GROUP BY columns: plain identifiers only. A missing GROUP BY is the
    # global-aggregate case (the worst whole-group offender: ONE group) —
    # supported, the inner stage then groups by the salt alone.
    group_cols: list[str] = []
    if "GROUP" in spans:
        for s, e in _split_top_commas(toks, *spans["GROUP"]):
            idx = [i for i in range(s, e) if _is_code(toks[i])]
            if len(idx) != 1 or toks[idx[0]].kind != "word":
                return None
            group_cols.append(toks[idx[0]].text)
    group_keys = {c.upper() for c in group_cols}

    inner_items: list[str] = []
    outer_items: list[str] = []
    n_partial = 0
    n_agg = 0
    saw_uda = False
    for s, e in _split_top_commas(toks, *spans["SELECT"]):
        (xs, xe), alias = _item_parts(toks, s, e)
        expr = _text(toks, xs, xe)
        if expr.upper() in group_keys:
            outer_items.append(expr + (f" AS {alias}" if alias else ""))
            continue
        call = _parse_call(toks, xs, xe)
        if call is None:
            return None
        fname, args = call
        if fname in upper_names:
            if alias is None:
                return None  # result column name must be explicit
            col = f"__hop_p_{n_partial}"
            n_partial += 1
            inner_items.append(f"{fname.lower()}__partial({args}) AS {col}")
            outer_items.append(f"{fname.lower()}__merge({col}) AS {alias}")
            saw_uda = True
        elif fname in _SPLITTABLE:
            if alias is None or args.upper().startswith("DISTINCT"):
                return None
            col = f"__hop_a_{n_agg}"
            n_agg += 1
            inner_items.append(f"{fname}({args}) AS {col}")
            outer_items.append(f"{_SPLITTABLE[fname]}({col}) AS {alias}")
        else:
            return None
    if not saw_uda:
        return None

    rel = _text(toks, *spans["FROM"])
    if not rel:
        return None
    where = f" WHERE {_text(toks, *spans['WHERE'])}" if "WHERE" in spans else ""
    tail = ""
    if "ORDER" in spans:
        tail += f" ORDER BY {_text(toks, *spans['ORDER'])}"
    if "LIMIT" in spans:
        tail += f" LIMIT {_text(toks, *spans['LIMIT'])}"

    inner_gb = ", ".join(group_cols + ["__hop_salt"])
    outer_gb = f" GROUP BY {', '.join(group_cols)}" if group_cols else ""
    inner_select = ", ".join(group_cols + inner_items)
    return (
        f"SELECT {', '.join(outer_items)} FROM ("
        f"SELECT {inner_select} FROM ("
        f"SELECT *, pmod(spark_partition_id(), {salt_buckets}) AS __hop_salt "
        f"FROM {rel}{where}) __hop_salted "
        f"GROUP BY {inner_gb}"
        f") __hop_partials{outer_gb}{tail}"
    )
