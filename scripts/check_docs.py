#!/usr/bin/env python3
"""Doc-vs-artifact drift check (round-17 verdict task 2).

Three consecutive rounds a SCALING.md-quoted canonical bench number drifted
from the shipped BENCH.json (r15 stale series note, r16 146.2-vs-145.x,
r17 146.0-vs-145.194). This check kills the class: SCALING.md carries ONE
machine-readable canonical line,

    CANONICAL_BENCH code_fp=<fp> value=<sec> median_over=<n>

and this script fails (exit 1) unless that line matches BENCH.json's
(code_fp, value, median_over) exactly. Run it as part of
scripts/round_guards.sh; after a final-tree bench series, refresh the line
with `scripts/check_docs.py --write` (which edits SCALING.md in place) and
re-run the check.

Prose elsewhere in SCALING.md should say "see the CANONICAL_BENCH line /
BENCH.json" rather than re-quoting the number.
"""
import json
import re
import sys

BENCH = "BENCH.json"
DOC = "SCALING.md"
LINE_RE = re.compile(
    r"CANONICAL_BENCH code_fp=(\S+) value=([0-9.]+) median_over=(\d+)")


def main() -> int:
    write = "--write" in sys.argv[1:]
    with open(BENCH) as f:
        bench = json.load(f)
    fp = bench.get("code_fp")
    value = bench["value"]
    over = bench.get("median_over")
    if fp is None:
        print(f"[check_docs] FAIL: {BENCH} carries no code_fp "
              "(pre-r18 record?) — re-run graft.Bench on the current tree")
        return 1
    canonical = f"CANONICAL_BENCH code_fp={fp} value={value} median_over={over}"

    with open(DOC) as f:
        doc = f.read()
    m = LINE_RE.search(doc)

    if write:
        if m:
            doc = doc[:m.start()] + canonical + doc[m.end():]
        else:
            print(f"[check_docs] FAIL: no CANONICAL_BENCH line in {DOC} to "
                  "rewrite — add one (see module docstring)")
            return 1
        with open(DOC, "w") as f:
            f.write(doc)
        print(f"[check_docs] wrote: {canonical}")
        return 0

    if not m:
        print(f"[check_docs] FAIL: {DOC} has no CANONICAL_BENCH line; "
              f"expected: {canonical}")
        return 1
    doc_fp, doc_value, doc_over = m.group(1), float(m.group(2)), int(m.group(3))
    # exact match, not tolerance: the line is machine-written (--write), so
    # any difference means a human re-quoted a number by hand or the bench
    # re-ran without a doc refresh — both are the drift this check exists for
    if doc_fp != fp or doc_value != value or doc_over != over:
        print(f"[check_docs] FAIL: {DOC} quotes code_fp={doc_fp} "
              f"value={doc_value} median_over={doc_over} but {BENCH} ships "
              f"code_fp={fp} value={value} median_over={over} — refresh with "
              "scripts/check_docs.py --write")
        return 1
    print(f"[check_docs] OK: {DOC} canonical line matches {BENCH} "
          f"({fp} / {value} s / median_over {over})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
