"""Namespaced column addressing (``ns::name``).

Reference: column/NSColumn.java — Pig relation-qualified headers carry
``relation::column`` (arbitrarily nested, ``a::b::c``); two namespaced
names are EQUAL when the shorter identifier path suffix-matches the
longer one (NSColumn.equals compares identifiers back-to-front over the
shorter length).  core/DataPurifier.java:115-119 binds every header
under BOTH its full name and its simple (leaf) name, so filter
expressions may address a column either way; when several headers share
a simple name the LAST header's binding wins (JexlContext.set overwrite
in header order) — ``resolve`` mirrors that exactly.
"""

from __future__ import annotations

NS_DELIMITER = "::"


def split_ns(name: str) -> list[str]:
    """Full name -> identifier path (NSColumn.getNameIdentifiers)."""
    return name.split(NS_DELIMITER)


def simple_name(name: str) -> str:
    """Leaf identifier (NSColumn.getSimpleName)."""
    return split_ns(name)[-1]


def ns_equals(a: str, b: str) -> bool:
    """NSColumn.equals: exact match, or the shorter identifier path is a
    suffix of the longer one (``b::c`` == ``a::b::c``; ``x::c`` != ``b::c``)."""
    if a == b:
        return True
    pa, pb = split_ns(a), split_ns(b)
    n = min(len(pa), len(pb))
    if n == 0:
        return False
    return pa[-n:] == pb[-n:]


def resolve(identifier: str, headers: list[str]) -> str | None:
    """The header an expression identifier binds to, or None.

    DataPurifier.java:115-119 sets exactly TWO JexlContext keys per
    header — its full name and its simple (leaf) name — so an expression
    identifier binds iff it equals one of those keys; later headers
    overwrite earlier ones (JexlContext.set in header order), which is
    the last-wins rule on simple-name collisions.  General suffix
    matching (``ns_equals``) must NOT be used here: it is symmetric, so
    a bare header ``score`` would capture the LONGER exact identifier
    ``a::score`` when it appears later in the header list, silently
    binding the filter to the wrong column — the reference's exact
    context keys can never do that.
    """
    found: str | None = None
    for h in headers:
        if identifier == h or identifier == simple_name(h):
            found = h
    return found
