#!/usr/bin/env python3
"""Convert a scripts/check.py output log into the committed sf1.0
standing-gate artifact: a CORRECTNESS-style JSON keyed by query with
ok/rows fields, restricted to the queries actually swept.

Usage: sf1_artifact.py <check_output> <names_csv_file> <out_json>
"""
import json, re, sys

log, names_f, out = sys.argv[1], sys.argv[2], sys.argv[3]
names = set(open(names_f).read().strip().split(','))
res = {}
for line in open(log):
    m = re.match(r"OK   (\S+) \((\d+) rows\)", line)
    if m and m.group(1) in names:
        res[m.group(1)] = {"ok": True, "rows": int(m.group(2))}
        continue
    m = re.match(r"FAIL (\S+): (.*)", line)
    if m and m.group(1) in names:
        res[m.group(1)] = {"ok": False, "err": m.group(2)[:200]}
missing = sorted(names - set(res))
artifact = {
    "sf": 1.0,
    "queries": dict(sorted(res.items())),
    "n_ok": sum(1 for v in res.values() if v["ok"]),
    "n_fail": sum(1 for v in res.values() if not v["ok"]),
    "not_run": missing,
}
json.dump(artifact, open(out, "w"), indent=1)
print(f"{artifact['n_ok']} ok, {artifact['n_fail']} fail, "
      f"{len(missing)} not run -> {out}")
