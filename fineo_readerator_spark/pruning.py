"""Timestamp-range extraction and source selection.

Reimplements the reference's resolve-time pruning stack as plain Python over a
tiny predicate AST instead of planner rules:

- `TimestampExpressionBuilder.java:37-141` — extract ``=,<,<=,>,>=,BETWEEN``
  conditions on ``timestamp`` from an AND/OR tree into include-ranges;
  anything else (``<>``, arithmetic, other columns) degrades to scan-all.
- `ConvertFineoMarkerIntoFilteredInputTables.java:183-326` (O3/O4) — per
  source, decide scan/skip by intersecting the query range with the source's
  declared window.
- anti-overlap (O5, ibid:121-181): when nearline and historical sources are
  both live, historical scans are additionally filtered to
  ``timestamp < min(nearline.start)`` — overlap resolution is range-based,
  nearline wins; NOT row-level dedup.

In Spark the *intra*-source pruning (files, partitions, row groups) is native
once the timestamp filter is part of the plan; this module only decides which
sources enter the union at all — metadata-only work on the driver, O(#sources),
independent of data volume.
"""

from __future__ import annotations

import re
from typing import Optional

from fineo_readerator_spark.sources import HISTORICAL, NEARLINE, NEARLINE_ITEMS, SourceSpec, TimeRange

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<lparen>\()
      | (?P<rparen>\))
      | (?P<op><=|>=|<>|!=|=|<|>)
      | (?P<num>\d+)
      | (?P<str>'[^']*')
      | (?P<word>[A-Za-z_][A-Za-z0-9_.]*)
    )""",
    re.VERBOSE,
)


def _tokenize(text: str) -> list[str]:
    tokens, pos = [], 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if not m:
            raise ValueError(f"cannot tokenize predicate at: {text[pos:pos+20]!r}")
        tokens.append(m.group().strip())
        pos = m.end()
    return tokens


class RangeSet:
    """Disjunction of TimeRanges (possibly 'everything')."""

    def __init__(self, ranges: Optional[list[TimeRange]] = None, everything: bool = False):
        self.everything = everything
        self.ranges = ranges or []

    @classmethod
    def all(cls) -> "RangeSet":
        return cls(everything=True)

    @classmethod
    def of(cls, r: TimeRange) -> "RangeSet":
        return cls(ranges=[r])

    def intersect(self, other: "RangeSet") -> "RangeSet":
        if self.everything:
            return other
        if other.everything:
            return self
        out = []
        for a in self.ranges:
            for b in other.ranges:
                both = a.intersect(b)
                if both is not None:
                    out.append(both)
        return RangeSet(out)

    def union(self, other: "RangeSet") -> "RangeSet":
        if self.everything or other.everything:
            return RangeSet.all()
        return RangeSet(self.ranges + other.ranges)

    def overlaps(self, window: TimeRange) -> bool:
        if self.everything:
            return True
        return any(r.overlaps(window) for r in self.ranges)


class _Parser:
    """Recursive-descent parser for the reference's supported predicate shape:
    comparisons joined by AND/OR with parentheses (SURVEY §2.7).  Only
    ``timestamp <op> <int>`` leaves contribute range information; every other
    leaf is range-neutral (matches TimestampExpressionBuilder's scan-all
    degradation for unsupported expressions)."""

    def __init__(self, tokens: list[str], ts_field: str):
        self.tokens = tokens
        self.pos = 0
        self.ts_field = ts_field

    def peek(self) -> Optional[str]:
        return self.tokens[self.pos] if self.pos < len(self.tokens) else None

    def next(self) -> str:
        tok = self.tokens[self.pos]
        self.pos += 1
        return tok

    def parse(self) -> RangeSet:
        out = self.parse_or()
        if self.peek() is not None:
            raise ValueError(f"trailing tokens: {self.tokens[self.pos:]}")
        return out

    def parse_or(self) -> RangeSet:
        left = self.parse_and()
        while self.peek() is not None and self.peek().upper() == "OR":
            self.next()
            left = left.union(self.parse_and())
        return left

    def parse_and(self) -> RangeSet:
        left = self.parse_atom()
        while self.peek() is not None and self.peek().upper() == "AND":
            self.next()
            left = left.intersect(self.parse_atom())
        return left

    def parse_atom(self) -> RangeSet:
        tok = self.peek()
        if tok == "(":
            self.next()
            inner = self.parse_or()
            if self.next() != ")":
                raise ValueError("unbalanced parens")
            return inner
        return self.parse_leaf()

    def parse_leaf(self) -> RangeSet:
        lhs = self.next()
        nxt = self.peek()
        if nxt is not None and nxt.upper() == "BETWEEN":
            # col BETWEEN a AND b
            self.next()
            lo = self.next()
            if self.next().upper() != "AND":
                raise ValueError("BETWEEN without AND")
            hi = self.next()
            if lhs == self.ts_field and lo.isdigit() and hi.isdigit():
                return RangeSet.of(TimeRange(int(lo), int(hi) + 1))
            return RangeSet.all()
        if nxt is not None and nxt.upper() == "IS":
            # IS [NOT] NULL / IS TRUE — range-neutral
            self.next()
            if self.peek() is not None and self.peek().upper() == "NOT":
                self.next()
            self.next()  # NULL / TRUE / FALSE
            return RangeSet.all()
        if nxt in ("=", "<", "<=", ">", ">=", "<>", "!="):
            op = self.next()
            rhs = self.next()
            val, col = None, None
            if lhs == self.ts_field and rhs.isdigit():
                col, val = lhs, int(rhs)
            elif rhs == self.ts_field and lhs.isdigit():
                # literal <op> timestamp — mirror the op
                col, val = rhs, int(lhs)
                op = {"<": ">", "<=": ">=", ">": "<", ">=": "<="}.get(op, op)
            if col is None:
                return RangeSet.all()
            if op == "=":
                return RangeSet.of(TimeRange(val, val + 1))
            if op == "<":
                return RangeSet.of(TimeRange(None, val))
            if op == "<=":
                return RangeSet.of(TimeRange(None, val + 1))
            if op == ">":
                return RangeSet.of(TimeRange(val + 1, None))
            if op == ">=":
                return RangeSet.of(TimeRange(val, None))
            return RangeSet.all()  # <> / != → scan-all (TimestampExpressionBuilder)
        # bare identifier / unknown shape — range-neutral
        return RangeSet.all()


def ranges_from_predicate(predicate: Optional[str], ts_field: str = "timestamp") -> RangeSet:
    """Extract the timestamp include-range set from a SQL-ish predicate string.

    Unparseable or absent predicates → scan-all (O4 semantics)."""
    if not predicate or not predicate.strip():
        return RangeSet.all()
    try:
        return _Parser(_tokenize(predicate), ts_field).parse()
    except (ValueError, IndexError):
        return RangeSet.all()


def select_sources(
    sources: list[SourceSpec],
    query_ranges: RangeSet,
) -> tuple[list[SourceSpec], Optional[int]]:
    """Pick the sources whose declared window intersects the query range, and
    compute the anti-overlap cutover (min nearline window start) applied to
    historical scans (O3/O4/O5).

    The cutover comes from ALL registered nearline sources, not just the ones
    the query touches: nearline owns every timestamp ≥ its earliest window
    start, so historical rows there are never visible — which also means a
    historical source's *effective* window is capped at the cutover for
    pruning purposes (`ConvertFineoMarkerIntoFilteredInputTables.java:121-181`).

    Returns (live_sources, cutover_millis_or_None).
    """
    nearline_starts = [
        s.time_range.start
        for s in sources
        if s.kind in (NEARLINE, NEARLINE_ITEMS) and s.time_range.start is not None
    ]
    cutover = min(nearline_starts) if nearline_starts else None

    def effective(s: SourceSpec) -> Optional[TimeRange]:
        if s.kind != HISTORICAL or cutover is None:
            return s.time_range
        return s.time_range.intersect(TimeRange(None, cutover))

    live = []
    for s in sources:
        window = effective(s)
        if window is not None and query_ranges.overlaps(window):
            live.append(s)
    return live, cutover
