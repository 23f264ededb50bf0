"""JEXL-subset expression translation.

The reference evaluates Apache JEXL 2 expressions over header-bound row
maps for row filters ("purify", core/DataPurifier.java:47-130) and weight
expressions (udf/NormalizeUDF.java:145,317,528). We translate the
arithmetic / comparison / boolean / ternary subset to Spark SQL text and
hand it to ``F.expr`` — the filter then participates in Catalyst
predicate pushdown, which the reference never had (SURVEY §4).

Unsupported constructs raise loudly — the reference silently disables a
bad expression (DataPurifier catches and ignores), which SURVEY §7 flags
as a bug not to copy.

Known semantics note (documented, not changed): ordering comparisons
against a NaN value follow Spark's NaN-is-largest total order (`NaN > 5`
is TRUE). Whether JEXL 2 matches depends on JexlArithmetic.compare's
NaN branch, which cannot be verified offline; Java's own
``Double.compare`` uses the same NaN-greatest total order, so Spark's
behavior is at least one defensible reading. The decision is pinned
executable by tests/test_properties.py::TestJexlNaNOrderingPin — a
future "fix" flipping NaN comparison semantics fails there. NULL
EQUALITY, by contrast, is unambiguous in JEXL (JexlArithmetic.equals:
both-null -> true) and IS rewritten to IS [NOT] NULL below (simple
operands in boolean context only; compound operands raise — see
_rewrite_null_equality).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# token-level rewrites: JEXL -> SQL
_REWRITES = [
    (re.compile(r"&&"), " AND "),
    (re.compile(r"\|\|"), " OR "),
    # JEXL 2 word-operator synonyms (and/or/not) — normalized to the
    # uppercase SQL spelling so the null-equality pass's boolean-edge
    # context scan sees ONE form (r10 review: lowercase `and` next to a
    # null guard read as a non-boolean context and raised)
    (re.compile(r"\band\b"), " AND "),
    (re.compile(r"\bor\b"), " OR "),
    (re.compile(r"\bnot\b"), " NOT "),
    (re.compile(r"!="), "<>"),
    (re.compile(r"(?<![<>=!])==(?!=)"), "="),
    (re.compile(r"!(?![=])"), " NOT "),
    (re.compile(r"\bnull\b"), "NULL"),
    (re.compile(r"\btrue\b"), "TRUE"),
    (re.compile(r"\bfalse\b"), "FALSE"),
]

# JEXL null EQUALITY is two-valued (JexlArithmetic.equals: both-null
# -> true, one-null -> false), but SQL `x = NULL` / `x <> NULL` is
# three-valued NULL -> filter-false ALWAYS — so the idiomatic guard
# `tag != null && ...` would drop every row. `_rewrite_null_equality`
# rewrites to IS [NOT] NULL, but ONLY when the non-null operand is a
# bare identifier/backticked column standing alone in boolean context:
# with a COMPOUND operand (`x + 1 == null`) JEXL's null-coercing
# arithmetic never yields null, so IS NULL would be wrong-valued, and
# a naive prefix rewrite of `null == x + 1` emits malformed SQL
# (`x IS NULL + 1`) — both now raise instead (the module's
# raise-loudly contract). Ordering forms `>= null` / `<= null` are not
# equality and keep SQL-NULL semantics (see module header).
_SIMPLE_OPERAND = r"`[^`]+`|[A-Za-z_][\w:.]*"
# a simple operand optionally wrapped in ONE pair of parentheses —
# `(a) == null` is valid JEXL the pre-r10 rewrite handled (r10 review);
# the boolean-edge context checks still reject `f(a) == null` (the
# char before the '(' is an identifier, not a boolean edge)
_WRAPPED_OPERAND = rf"(?:{_SIMPLE_OPERAND}|\(\s*(?:{_SIMPLE_OPERAND})\s*\))"
_NULL_EQ_SUFFIX = re.compile(rf"({_WRAPPED_OPERAND})\s*(=|<>)\s*NULL\b")
_NULL_EQ_PREFIX = re.compile(rf"\bNULL\s*(=|<>)\s*({_WRAPPED_OPERAND})")
# leftover equality-against-NULL after the guarded rewrites = compound
# operand; `(?<![<>!=])` keeps `>= NULL` / `<= NULL` ordering forms out
_NULL_EQ_LEFTOVER = re.compile(
    r"(?<![<>!=])=\s*NULL\b|<>\s*NULL\b|\bNULL\s*=|\bNULL\s*<>"
)
# a null-equality comparison is rewritable only when flanked by boolean
# context: segment edge, parenthesis, or AND/OR/NOT (the ternary parts
# are translated separately, so WHEN/THEN never appear here)
_BOOL_EDGE_LEFT = re.compile(r"(?:^|\(|\bAND|\bOR|\bNOT)\s*$")
_BOOL_EDGE_RIGHT = re.compile(r"\s*(?:$|\)|AND\b|OR\b)")


def _rewrite_null_equality(seg: str) -> str:
    def _guarded(m: re.Match, operand: str, op: str) -> str:
        # context checks run against the ORIGINAL string (m.string):
        # earlier substitutions in the same pass cannot invalidate the
        # boolean-edge structure to the left of a later match
        if _BOOL_EDGE_LEFT.search(m.string[: m.start()]) and _BOOL_EDGE_RIGHT.match(
            m.string[m.end() :]
        ):
            return f"{operand} IS NULL" if op == "=" else f"{operand} IS NOT NULL"
        return m.group(0)

    seg = _NULL_EQ_SUFFIX.sub(lambda m: _guarded(m, m.group(1), m.group(2)), seg)
    seg = _NULL_EQ_PREFIX.sub(lambda m: _guarded(m, m.group(2), m.group(1)), seg)
    if _NULL_EQ_LEFTOVER.search(seg):
        raise ValueError(
            "null equality with a compound operand is unsupported "
            f"(JEXL null-coercing arithmetic has no SQL equivalent): {seg!r}"
        )
    return seg

_FORBIDDEN = re.compile(r"(new\s+\w|\.\w+\s*\(|\[\]|=~|!~|\bsize\s*\(|\bempty\s*\()")


_SQL_KEYWORDS = {
    "AND", "OR", "NOT", "NULL", "TRUE", "FALSE",
    "CASE", "WHEN", "THEN", "ELSE", "END",
}

# identifier token, possibly ns-qualified (a::b::c); the lookbehind keeps
# us from starting mid-number (1e5) or mid-token
_IDENT = re.compile(r"(?<![\w:.])[A-Za-z_]\w*(?:::[A-Za-z_]\w*)*")
_QUOTED = re.compile(r"'[^']*'|\"[^\"]*\"")


def _map_outside_quotes(s: str, fn) -> str:
    """Apply ``fn`` to every span of ``s`` OUTSIDE quoted string literals.

    Every textual transformation in this module must route through this:
    JEXL string literals are DATA — rewriting ``'true'`` to ``'TRUE'`` or
    ``'a&&b'`` to ``'a AND b'`` silently changes which rows a filter
    matches."""
    out: list[str] = []
    pos = 0
    for m in _QUOTED.finditer(s):
        out.append(fn(s[pos : m.start()]))
        out.append(m.group(0))
        pos = m.end()
    out.append(fn(s[pos:]))
    return "".join(out)


def _split_ternary(s: str) -> tuple[str, str, str] | None:
    """Split ``cond ? a : b`` at the FIRST top-level ``?`` and its
    MATCHING lone ``:`` — both outside quoted literals and outside
    parentheses; a ``:`` that is part of a ``::`` namespace delimiter is
    never a separator.  Matching is by ternary depth, so right-nested
    ``c1 ? a1 : c2 ? a2 : a3`` splits as (c1, a1, c2 ? a2 : a3) and the
    else branch recurses (JEXL's right associativity); a quoted ``?`` in
    the condition is data and never confuses the scan.  Returns
    (cond, a, b) or None.  (The old regex split at the last ``:``
    anywhere, which landed inside ``ns::name`` identifiers, inside
    quoted literals, and mis-nested chained ternaries.)"""
    qmark = colon = None
    tdepth = 0
    paren = 0
    quote: str | None = None
    for i, ch in enumerate(s):
        if quote is not None:
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
        elif ch == "(":
            paren += 1
        elif ch == ")":
            paren -= 1
        elif paren == 0 and ch == "?":
            if qmark is None:
                qmark = i
            tdepth += 1
        elif paren == 0 and ch == ":" and qmark is not None:
            if (i > 0 and s[i - 1] == ":") or (i + 1 < len(s) and s[i + 1] == ":"):
                continue
            tdepth -= 1
            if tdepth == 0:
                colon = i
                break
    if qmark is None or colon is None:
        return None
    return s[:qmark], s[qmark + 1 : colon], s[colon + 1 :]


def bind_headers(sql: str, headers: list[str]) -> str:
    """Rewrite identifiers in a translated SQL expression to the
    (backticked) dataset headers they address under NSColumn binding:
    a simple name binds to the (last) header whose leaf matches it, a
    ``ns::name`` form binds to the header with exactly that full name —
    the two JexlContext keys DataPurifier.java:115-119 sets (general
    suffix matching would let a shorter header capture a longer exact
    identifier; see catalog/nscolumn.resolve).  Unknown identifiers
    raise (the
    reference silently evaluates them as null — the silent-disable bug
    SURVEY §7 says not to copy).  Quoted string literals are left alone.
    """
    from shifu_spark.catalog.nscolumn import resolve

    def _bind_segment(seg: str) -> str:
        def repl(m: re.Match) -> str:
            tok = m.group(0)
            if tok.upper() in _SQL_KEYWORDS:
                return tok
            full = resolve(tok, headers)
            if full is None:
                raise ValueError(f"expression identifier {tok!r} matches no header")
            return f"`{full}`"

        return _IDENT.sub(repl, seg)

    out: list[str] = []
    pos = 0
    for m in _QUOTED.finditer(sql):
        out.append(_bind_segment(sql[pos:m.start()]))
        out.append(m.group(0))
        pos = m.end()
    out.append(_bind_segment(sql[pos:]))
    return "".join(out)


def jexl_to_sql(expr: str, headers: list[str] | None = None) -> str:
    """Translate a JEXL filter/weight expression to a Spark SQL expression.

    Supported: arithmetic (+ - * / %), comparisons, && || !, ternary
    ``cond ? a : b``, parentheses, column identifiers.  With ``headers``,
    identifiers (simple or ``ns::name``) bind to the matching header via
    NSColumn full-or-leaf binding (catalog/nscolumn.resolve); without, a
    ``ns::name`` identifier collapses to its leaf name (the pre-NSColumn
    behavior, correct when the DataFrame's columns are leaf-named).
    Anything else -> ValueError.
    """
    forbidden: list[str] = []
    _map_outside_quotes(expr, lambda seg: forbidden.extend(_FORBIDDEN.findall(seg)) or seg)
    if forbidden:
        raise ValueError(f"unsupported JEXL construct in {expr!r}")
    s = expr.strip()
    if headers is None:
        # namespace collapse: ns::col -> col, ANY nesting depth
        # (column/NSColumn.java documents a::b::c) — a single-level
        # pattern would leave the invalid residue 'b::c'; quoted
        # literals containing '::' are data, not identifiers
        s = _map_outside_quotes(
            s, lambda seg: re.sub(r"\b(?:\w+::)+(\w+)", r"\1", seg)
        )
    parts = _split_ternary(s)
    if parts is not None:
        cond, a, b = (jexl_to_sql(g, headers) for g in parts)
        return f"CASE WHEN {cond} THEN {a} ELSE {b} END"

    def _rewrite(seg: str) -> str:
        for pat, rep in _REWRITES:
            seg = pat.sub(rep, seg)
        return _rewrite_null_equality(seg)

    s = _map_outside_quotes(s, _rewrite)
    # a '?' the splitter could not pair (e.g. a ternary wrapped entirely
    # in parentheses) must raise here, not ship as invalid SQL — the
    # module's raise-loudly contract
    leftovers: list[str] = []
    _map_outside_quotes(s, lambda seg: leftovers.extend(re.findall(r"\?", seg)) or seg)
    if leftovers:
        raise ValueError(f"unsupported ternary placement in {expr!r} (wrap-free top level only)")
    if headers is not None:
        s = bind_headers(s, headers)
    return s


def jexl_filter(expr: str, headers: list[str] | None = None) -> Column:
    """JEXL row filter -> boolean Column (DataPurifier semantics)."""
    return F.expr(jexl_to_sql(expr, headers))


def jexl_weight(expr: str | None) -> Column:
    """JEXL weight expression -> double Column; None/blank -> 1.0.

    Weight parse failures default to 1.0 (ConfusionMatrix.java:361-370 /
    NormalizeUDF weight handling); non-finite results clamp to 1.0 too
    (same rule as eval_metrics.clamp_weight — a NaN weight would
    otherwise pass the `< 0` check via NaN-is-largest and poison the
    weighted tallies; r10 review)."""
    if not expr or not expr.strip():
        return F.lit(1.0)
    from shifu_spark.functions.nonvalue import clamp_weight_expr

    return clamp_weight_expr(F.expr(jexl_to_sql(expr)).try_cast("double"))
