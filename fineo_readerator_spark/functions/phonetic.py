"""Phonetic blocking keys for entity resolution.

``operators.entity.entity_match`` refuses to run unblocked — its doctrine
says "add a phonetic/suffix/geography key".  This module makes the
phonetic option a one-liner: :func:`soundex_key` is Spark's native
``soundex`` (JVM builtin, whole-stage codegen — the blocking key costs
one projection), and :func:`soundex_oracle_expr` is an exact DuckDB
replay for the oracle side, because this DuckDB build ships NO soundex
function.

The replica reproduces Spark's American-Soundex refinement exactly
(verified by edge-case probes and a fuzz test against ``F.soundex``):

- the first letter is kept verbatim (uppercased) and its code collapses
  with an immediately-following same-code letter (Pfister → P236);
- H/W are transparent — same-code letters separated only by H/W collapse
  (Ashcraft → A261) — while vowels AND non-letters separate them
  (moses → M220, "s1s" → S200);
- strings whose first character is not ASCII [A-Za-z] are returned
  UNCHANGED (Spark returns "éclair" / "  spaced" / "" as-is);
- output is letter + exactly three digits, zero-padded/truncated.

Engine-portable construction (every step exists in both engines with
identical semantics): ``upper``/``substr``/``translate``/``replace``,
plus per-digit run-collapse ``regexp_replace('d{2,}' → 'd')`` — RE2-safe
(no backreferences), applied once per code digit 0–6 AFTER deleting the
transparent '7's, so H/W never separate a run while anything else does.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A..Z -> code; 0 = vowel-ish separator (AEIOUY), 7 = transparent (HW)
_SOUNDEX_CODES = "01230127022455012623017202"


def soundex_key(col: Column | str) -> Column:
    """Spark-side phonetic blocking key: native ``soundex`` (codegen'd)."""
    return F.soundex(col)


def soundex_oracle_expr(expr: str) -> str:
    """DuckDB scalar expression computing Spark's ``soundex(expr)``.

    Pure string pipeline over ``expr`` (any SQL expression): map letters
    to codes with non-letters as '0'-separators, delete transparent '7's,
    collapse per-digit runs, drop the first letter's own leading code,
    strip separators, pad to 3 digits behind the kept first letter.
    """
    # one uppercase copy; non-letters become '@' so original digits in the
    # input can never masquerade as soundex codes
    u = f"upper({expr})"
    mapped = (
        f"translate(regexp_replace({u}, '[^A-Z]', '@', 'g'), "
        f"'ABCDEFGHIJKLMNOPQRSTUVWXYZ@', '{_SOUNDEX_CODES}0')"
    )
    collapsed = f"replace({mapped}, '7', '')"
    for d in "0123456":
        collapsed = f"regexp_replace({collapsed}, '{d}{{2,}}', '{d}', 'g')"
    # the collapsed string leads with the first letter's code unless that
    # code was a deleted '7' (H/W first letters keep all their digits)
    first_code = f"substr('{_SOUNDEX_CODES}', ascii({u}) - 64, 1)"
    body = (
        f"CASE WHEN {first_code} = '7' THEN {collapsed} "
        f"ELSE substr({collapsed}, 2) END"
    )
    digits = f"replace({body}, '0', '')"
    return (
        f"CASE WHEN {expr} IS NULL THEN NULL "
        f"WHEN NOT regexp_matches(substr({expr}, 1, 1), '^[A-Za-z]$') THEN {expr} "
        f"ELSE substr({u}, 1, 1) || substr({digits} || '000', 1, 3) END"
    )
