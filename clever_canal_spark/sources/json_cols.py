"""MySQL JSON column semantics — typed access + partial-update diffs.

Reference: ``JsonConversion.java:1-431`` decodes MySQL's binary JSON wire
format into JSON text (the feed here is already text — that decode is the
source seam, like the rest of the byte-level LogBuffer machinery); what IS
semantic and must be rebuilt is ``JsonDiffConversion.java:1-152``: MySQL 8
with ``binlog_row_value_options=PARTIAL_JSON`` ships UPDATE after-images of
JSON columns as **diffs**, printed as nested SQL-function text::

    JSON_INSERT(JSON_REPLACE(col, '$.a', 5), '$.b', "x")

(innermost call = first operation; consecutive same-op diffs share one
call with repeated ``path[, value]`` pairs — print_json_diff's grouping).
A sink doing plain full-row LWW would overwrite whole documents with these
fragments; this module provides

- :func:`is_json_diff_expr` — shared-dialect detector (regexp, JVM-side);
- :func:`json_valid_expr` / :func:`json_malformed_expr` /
  :func:`json_get_expr` — per-dialect typed-JSON access for the decode
  ladder (Spark ``try_parse_json`` / ``get_json_object``, DuckDB
  ``json_valid`` / ``json_extract_string``);
- :func:`parse_json_diff_text` — Python parser of the wire text into an
  ordered op list (the diff grammar twin, used driver-side and inside the
  Arrow UDF);
- :func:`apply_json_diff` — applies ops with MySQL function semantics
  (JSON_REPLACE replaces existing paths only; JSON_INSERT inserts absent
  paths only, appending when an array index is past the end;
  JSON_ARRAY_INSERT inserts at the index, clamped to the end; JSON_REMOVE
  drops existing paths) over the MySQL path subset ``$``, ``.name``,
  ``."quoted name"``, ``[N]``;
- :func:`json_diff_apply_udf` — the vectorized (Arrow-batched pandas UDF)
  fold step used by ``plans/json_patch.apply_json_diff_epoch``.

Canonical output form: compact separators, **lexicographically sorted
object keys** — deterministic across engines and replays (MySQL's binary
format orders keys length-then-bytes; sorted-lex is this engine's
canonical choice, applied uniformly so replay equality holds).
"""

from __future__ import annotations

import json
import re

# the four function names print_json_diff can emit
# (JsonDiffConversion.java:131-147)
JSON_DIFF_FUNCS = ("JSON_REPLACE", "JSON_INSERT", "JSON_ARRAY_INSERT", "JSON_REMOVE")

# [(] not \( — the SQL pattern string must survive BOTH Spark string
# literals (which process backslash escapes) and DuckDB's (which don't)
_DIFF_PREFIX_PAT = r"^(JSON_REPLACE|JSON_INSERT|JSON_ARRAY_INSERT|JSON_REMOVE)[(]"
_FUNC_RE = re.compile(r"(JSON_REPLACE|JSON_INSERT|JSON_ARRAY_INSERT|JSON_REMOVE)\(")


def is_json_diff_expr(value_expr: str) -> str:
    """Shared-dialect boolean SQL: the wire string is a partial-update
    diff expression, not a JSON document. NULL-safe (NULL → false)."""
    return (
        f"(coalesce(regexp_extract({value_expr}, '{_DIFF_PREFIX_PAT}', 0), '') != '')"
    )


def json_valid_expr(value_expr: str, dialect: str) -> str:
    """Boolean SQL: value parses as JSON (NULL → NULL, like the engines)."""
    if dialect == "duckdb":
        return f"json_valid({value_expr})"
    # CASE keeps NULL input → NULL, matching DuckDB's json_valid
    return (
        f"(CASE WHEN {value_expr} IS NULL THEN NULL "
        f"ELSE try_parse_json({value_expr}) IS NOT NULL END)"
    )


def json_malformed_expr(value_expr: str, dialect: str) -> str:
    """Boolean SQL: present but NOT valid JSON **and not a diff** — the
    DLQ flag for the json decode ladder (JsonConversion's ERROR type
    analog). Diff expressions are well-formed wire values, not garbage —
    they route to the diff-apply path, not the dead-letter queue."""
    v = value_expr
    if dialect == "duckdb":
        invalid = f"NOT json_valid({v})"
    else:
        invalid = f"try_parse_json({v}) IS NULL"
    return f"({v} IS NOT NULL AND {invalid} AND NOT {is_json_diff_expr(v)})"


def json_get_expr(value_expr: str, path: str, dialect: str) -> str:
    """String extraction at a JSON path — the typed-access seam
    (Spark ``get_json_object`` / DuckDB ``json_extract_string``)."""
    if dialect == "duckdb":
        # validity-guarded: DuckDB's json_extract_string THROWS on
        # malformed input where Spark's get_json_object returns NULL
        return (
            f"(CASE WHEN json_valid({value_expr}) "
            f"THEN json_extract_string({value_expr}, '{path}') END)"
        )
    return f"get_json_object({value_expr}, '{path}')"


# ---------------------------------------------------------------------------
# Wire-text parsing (the print_json_diff inverse)
# ---------------------------------------------------------------------------


def _read_json_value(s: str, pos: int) -> tuple[str, int]:
    """Consume one JSON literal starting at ``pos`` up to a top-level ','
    or ')' — bracket-depth + double-quote-string aware."""
    depth = 0
    in_str = False
    esc = False
    start = pos
    while pos < len(s):
        ch = s[pos]
        if in_str:
            if esc:
                esc = False
            elif ch == "\\":
                esc = True
            elif ch == '"':
                in_str = False
        elif ch == '"':
            in_str = True
        elif ch in "[{(":
            depth += 1
        elif ch in "]})":
            if depth == 0 and ch == ")":
                break
            depth -= 1
        elif ch == "," and depth == 0:
            break
        pos += 1
    return s[start:pos].strip(), pos


def _parse_call(s: str, pos: int) -> tuple[list[tuple[str, str, str | None]], str, int]:
    """Recursive-descent over one ``FUNC(first_arg, path[, value]...)``
    call. Returns (ops innermost-first, column token, next position)."""
    m = _FUNC_RE.match(s, pos)
    if not m:
        raise ValueError(f"not a JSON diff call at {pos}: {s[pos:pos + 30]!r}")
    func = m.group(1)
    pos = m.end()
    while pos < len(s) and s[pos] == " ":
        pos += 1
    if _FUNC_RE.match(s, pos):
        inner_ops, column, pos = _parse_call(s, pos)
    else:
        inner_ops = []
        start = pos
        while pos < len(s) and s[pos] not in ",)":
            pos += 1
        column = s[start:pos].strip()
    args: list[tuple[str, str | None]] = []  # (path, value_json|None)
    while pos < len(s) and s[pos] == ",":
        pos += 1
        while pos < len(s) and s[pos] == " ":
            pos += 1
        if s[pos] != "'":
            raise ValueError(f"expected quoted path at {pos}: {s[pos:pos + 30]!r}")
        end = s.index("'", pos + 1)
        path = s[pos + 1 : end]
        pos = end + 1
        value: str | None = None
        if func != "JSON_REMOVE":
            while pos < len(s) and s[pos] in ", ":
                pos += 1
            value, pos = _read_json_value(s, pos)
        args.append((path, value))
    if pos >= len(s) or s[pos] != ")":
        raise ValueError(f"unbalanced diff call: {s!r}")
    pos += 1
    return inner_ops + [(func, p, v) for p, v in args], column, pos


def parse_json_diff_text(text: str) -> tuple[list[tuple[str, str, str | None]], str]:
    """Parse a partial-update wire expression into its operation list.

    Returns ``(ops, column)`` where ``ops`` is ``[(func, path,
    value_json_or_None), ...]`` in APPLICATION order (innermost call
    first — print_json_diff emits later operations as outer wrappers)."""
    ops, column, pos = _parse_call(text.strip(), 0)
    if text.strip()[pos:].strip():
        raise ValueError(f"trailing content after diff call: {text!r}")
    return ops, column


# ---------------------------------------------------------------------------
# Path resolution + application (MySQL path subset)
# ---------------------------------------------------------------------------

_PATH_STEP = re.compile(r'\.(\w+)|\."((?:[^"\\]|\\.)*)"|\[(\d+)\]')


def _path_steps(path: str) -> list[object]:
    """``$``-rooted path → list of str (member) / int (array index)."""
    if not path.startswith("$"):
        raise ValueError(f"path must start with $: {path!r}")
    steps: list[object] = []
    pos = 1
    while pos < len(path):
        m = _PATH_STEP.match(path, pos)
        if not m:
            raise ValueError(f"bad path step at {pos}: {path!r}")
        if m.group(1) is not None:
            steps.append(m.group(1))
        elif m.group(2) is not None:
            steps.append(m.group(2).replace('\\"', '"'))
        else:
            steps.append(int(m.group(3)))
        pos = m.end()
    return steps


def _resolve_parent(doc, steps):
    """Walk all but the last step; None when any leg is absent/mistyped."""
    node = doc
    for st in steps[:-1]:
        if isinstance(st, int):
            if not isinstance(node, list) or st >= len(node):
                return None
            node = node[st]
        else:
            if not isinstance(node, dict) or st not in node:
                return None
            node = node[st]
    return node


def _apply_one(doc, func: str, path: str, value):
    steps = _path_steps(path)
    if not steps:
        # root path: REPLACE swaps the whole doc; INSERT/REMOVE no-op
        return value if func == "JSON_REPLACE" else doc
    parent = _resolve_parent(doc, steps)
    if parent is None:
        return doc  # unresolvable parent → no-op (MySQL semantics)
    last = steps[-1]
    if func == "JSON_REPLACE":
        if isinstance(last, int):
            if isinstance(parent, list) and last < len(parent):
                parent[last] = value
        elif isinstance(parent, dict) and last in parent:
            parent[last] = value
    elif func == "JSON_INSERT":
        if isinstance(last, int):
            # array index past the end appends (MySQL JSON_INSERT rule);
            # an existing element is NOT replaced
            if isinstance(parent, list) and last >= len(parent):
                parent.append(value)
        elif isinstance(parent, dict) and last not in parent:
            parent[last] = value
    elif func == "JSON_ARRAY_INSERT":
        if isinstance(last, int) and isinstance(parent, list):
            parent.insert(min(last, len(parent)), value)
    elif func == "JSON_REMOVE":
        if isinstance(last, int):
            if isinstance(parent, list) and last < len(parent):
                del parent[last]
        elif isinstance(parent, dict) and last in parent:
            del parent[last]
    else:
        raise ValueError(f"unknown diff function {func!r}")
    return doc


def canonical_json(obj) -> str:
    """The engine's canonical JSON text (sorted keys, compact)."""
    return json.dumps(obj, sort_keys=True, separators=(",", ":"), ensure_ascii=False)


def apply_json_diff(doc_text: str | None, diff_text: str) -> str | None:
    """Apply one wire diff expression to a JSON document (text in/out).

    A NULL document stays NULL (MySQL JSON functions on NULL → NULL);
    output is :func:`canonical_json`-normalized."""
    if doc_text is None:
        return None
    doc = json.loads(doc_text)
    ops, _column = parse_json_diff_text(diff_text)
    for func, path, value_text in ops:
        value = json.loads(value_text) if value_text is not None else None
        doc = _apply_one(doc, func, path, value)
    return canonical_json(doc)


def _canon_or_raw(text: str | None) -> str | None:
    """Canonicalize a full image; malformed JSON passes through RAW (never
    a worker-killing raise — the DLQ flag upstream marks it)."""
    if text is None:
        return None
    try:
        return canonical_json(json.loads(text))
    except ValueError:
        return text


def fold_json_value(base_text: str | None, diff_texts) -> str | None:
    """Fold an ordered run of diff expressions onto a base document;
    non-diff entries in the run (full images) REPLACE the accumulator."""
    acc = _canon_or_raw(base_text)
    for t in diff_texts or []:
        if t is None:
            acc = None
        elif _FUNC_RE.match(t):
            try:
                acc = apply_json_diff(acc, t)
            except ValueError:
                pass  # unparseable diff → no-op, never a poison pill
        else:
            acc = _canon_or_raw(t)
    return acc


def json_diff_apply_udf():
    """Arrow-batched pandas UDF ``(base string, diffs array<string>) →
    string``: per-key fold step for ``apply_json_diff_epoch``. Built lazily
    so importing this module never requires an active Spark session."""
    import pandas as pd  # noqa: F401 — annotation target below
    from pyspark.sql.functions import pandas_udf

    def _fold(base, diffs):
        out = []
        for b, ds in zip(base, diffs):
            if ds is None or len(ds) == 0:
                # canonicalize full images too, so stored state is uniform
                out.append(_canon_or_raw(b))
            else:
                out.append(fold_json_value(b, list(ds)))
        return pd.Series(out, dtype=object)

    # explicit resolvable annotations (string hints would look up 'pd' in
    # module globals, where the lazy import is invisible)
    _fold.__annotations__ = {"base": pd.Series, "diffs": pd.Series, "return": pd.Series}
    return pandas_udf(_fold, "string")
