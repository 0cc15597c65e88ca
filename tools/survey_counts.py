#!/usr/bin/env python3
"""Regenerate SURVEY.md's machine-written query-count line from a
graft.Verify output directory (the baseline_table.py pattern, applied
to the count header that drifted by hand twice).

Counts come from the artifacts the driver itself consumes — never from
prose: total = the per-query result directories Verify dumped, oracle =
keys of oracle_sql.json, rows-only = the difference.

Usage:
  python3 tools/survey_counts.py [VERIFY_OUT_DIR] [--apply]

Prints the block that belongs between the
`<!-- BEGIN query_counts ... -->` / `<!-- END query_counts -->` markers
in SURVEY.md; with --apply it rewrites that block in place. Refuses a
partial dump (SPARK_GRAFT_ONLY runs) by sanity-checking that every
oracle name has a dumped directory.
"""
import json
import os
import re
import sys

SURVEY = os.path.join(os.path.dirname(__file__), "..", "SURVEY.md")


def main(argv):
    out_dir = next((a for a in argv if not a.startswith("--")), "/tmp/verify_out")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = set(json.load(f))
    dumped = {d for d in os.listdir(out_dir)
              if os.path.isdir(os.path.join(out_dir, d))}
    missing = oracles - dumped
    if missing:
        raise SystemExit(f"partial dump: {len(missing)} oracle queries have no "
                         f"result dir (e.g. {sorted(missing)[:3]}) — run a full "
                         "graft.Verify first")
    n_total, n_oracle = len(dumped), len(oracles)
    block = (f"{n_total} harness queries total ({n_oracle} DuckDB-oracle "
             f"green, {n_total - n_oracle} rows-only with\npinned reasons in "
             "`ContractSpec.rowsOnlyByDesign`).")
    if "--apply" in argv:
        with open(SURVEY) as f:
            text = f.read()
        new, n = re.subn(
            r"(<!-- BEGIN query_counts[^>]*-->\n).*?(\n<!-- END query_counts -->)",
            lambda m: m.group(1) + block + m.group(2), text, flags=re.S)
        if n != 1:
            raise SystemExit(f"expected exactly one query_counts block, found {n}")
        with open(SURVEY, "w") as f:
            f.write(new)
        print(f"SURVEY.md updated: {block.splitlines()[0]}")
    else:
        print(block)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
