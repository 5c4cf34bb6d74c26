#!/usr/bin/env python3
"""Unit test for oracle_check.split_stages — the function that guards
every contract-oracle row (round-15 advisor: the unanchored split could
tear a SQL string constant carrying the literal marker, and missed a
marker at end-of-script). Run: python3 tools/test_oracle_check.py"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from oracle_check import split_stages

def check(name, got, want):
    assert got == want, f"{name}: got {got!r} want {want!r}"
    print(f"  ok {name}")

# no marker: one stage, passthrough
check("no-marker", split_stages("SELECT 1"), ["SELECT 1"])

# plain two-stage split, marker on its own line
check("two-stage",
      split_stages("CREATE TEMP TABLE t AS SELECT 1\n;---STAGE---\nSELECT * FROM t"),
      ["CREATE TEMP TABLE t AS SELECT 1", "SELECT * FROM t"])

# indented marker (the QueriesExt triple-quoted form carries leading spaces)
check("indented-marker",
      split_stages("SELECT 1\n      ;---STAGE---\nSELECT 2"),
      ["SELECT 1", "SELECT 2"])

# trailing spaces/tabs after the marker still split
check("trailing-ws",
      split_stages("SELECT 1\n;---STAGE--- \t\nSELECT 2"),
      ["SELECT 1", "SELECT 2"])

# marker at END OF SCRIPT with no trailing newline: still a boundary
# (yields a trailing empty stage rather than a stage with the marker glued on)
check("eof-marker",
      split_stages("SELECT 1\n;---STAGE---"),
      ["SELECT 1", ""])

# the literal inside a string constant MID-LINE must NOT split
sql_lit = "SELECT ';---STAGE---' AS s FROM t"
check("mid-line-literal", split_stages(sql_lit), [sql_lit])

# multi-line string constant where the literal starts a line: out of scope
# by design (the anchor is the statement-boundary convention; builders
# never indent-break a string constant onto its own line) — documented,
# not asserted.

print("all split_stages cases pass")
