"""Gate ledger: union every CORRECTNESS_r*.json record and print, per
registered query, its recorded status — so a lost round record (the
r4 failure mode: the driver never wrote CORRECTNESS_r04.json) is
visible at a glance instead of reconstructed by hand each round.

Usage:
    python tools/gate_ledger.py            # summary + never-recorded list
    python tools/gate_ledger.py --full     # one line per query

A query counts as "recorded green" if ANY round's record shows
rows_match + schema_match with no err (hash_match may be null for the
rows-only streaming checks). Entries whose record only ever carried an
err (e.g. the r3 "no_oracle" placeholders) count as never-green.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_records() -> dict[str, dict[str, dict]]:
    """{query_name: {round: record_dict}} over all CORRECTNESS_r*.json."""
    out: dict[str, dict[str, dict]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = re.search(r"_r(\d+)\.json$", path).group(1)
        try:
            data = json.load(open(path))
        except (json.JSONDecodeError, OSError) as exc:  # corrupt record file
            print(f"WARN: unreadable {path}: {exc}", file=sys.stderr)
            continue
        for name, rec in data.items():
            if isinstance(rec, dict):
                out.setdefault(name, {})[rnd] = rec
    return out


def is_green(rec: dict) -> bool:
    return (
        rec.get("rows_match") is True
        and rec.get("schema_match") is True
        and rec.get("hash_match") in (True, None)
        and not rec.get("err")
    )


def main() -> None:
    sys.path.insert(0, REPO)
    from etl_java_spark import queries as Q

    records = load_records()
    rows = []
    for name in Q.QUERIES:
        per_round = records.get(name, {})
        greens = sorted(r for r, rec in per_round.items() if is_green(rec))
        errs = sorted(r for r, rec in per_round.items() if rec.get("err"))
        rows.append((name, greens, errs))

    green = [r for r in rows if r[1]]
    never = [r for r in rows if not r[1]]
    print(f"registered queries : {len(rows)}")
    print(f"recorded green     : {len(green)}")
    print(f"never recorded green: {len(never)}")
    if never:
        print("\nnever-green (lead _PRIORITY with these):")
        for name, _, errs in never:
            note = f"  (err rounds: {','.join(errs)})" if errs else ""
            print(f"  {name}{note}")
    if "--full" in sys.argv:
        print("\nfull ledger (query: green rounds | err rounds):")
        for name, greens, errs in rows:
            print(f"  {name}: {','.join(greens) or '-'} | {','.join(errs) or '-'}")
    stale = [r for r in green if r[1][-1] <= "01"]
    if stale:
        print(f"\nstalest (last green in r01): {len(stale)} queries")


if __name__ == "__main__":
    main()
