#!/usr/bin/env python
"""Append a dated, one-line measurement record to BENCH_NOTES.md.

Measurement discipline (VERDICT r4 #6): round 4 shipped five harnesses and
zero recorded numbers. Every harness run that produces a number worth citing
gets appended here — greppable, dated, append-only — so a cited number can
never exist without its record.

Usage:
  python tools/record_bench.py "<label>" "<result text>"
  # or from another tool:
  from tools.record_bench import record; record(label, text)
"""

import datetime
import os
import sys

_NOTES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BENCH_NOTES.md")
_HEADER = "## Measurement log (dated, append-only)"


def record(label: str, text: str, notes_path: str = _NOTES) -> str:
    stamp = datetime.date.today().isoformat()
    line = f"- {stamp} **{label}**: {text}\n"
    with open(notes_path, "a+") as f:
        f.seek(0)
        body = f.read()
        if _HEADER not in body:
            f.write(f"\n{_HEADER}\n\n")
        f.write(line)
    return line


if __name__ == "__main__":
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    sys.stdout.write(record(sys.argv[1], sys.argv[2]))
