#!/usr/bin/env python3
"""Merge a partial check.py log into an existing standing-gate
artifact: rows named in the log (restricted to names_csv) overwrite or
extend the artifact's queries; every other row carries over. Used for
late-op top-ups when the original Verify out-dir is gone (tmpfs reboot)
and only the changed/new rows were re-run.

Usage: merge_artifact.py <existing_json> <check_output> <names_csv> <out_json>
"""
import json, re, sys

base_f, log, names_f, out = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
base = json.load(open(base_f))
names = set(open(names_f).read().strip().split(','))
res = dict(base.get("queries", {}))
seen = set()
for line in open(log):
    m = re.match(r"OK   (\S+) \((\d+) rows\)", line)
    if m and m.group(1) in names:
        res[m.group(1)] = {"ok": True, "rows": int(m.group(2))}
        seen.add(m.group(1))
        continue
    m = re.match(r"FAIL (\S+): (.*)", line)
    if m and m.group(1) in names:
        res[m.group(1)] = {"ok": False, "err": m.group(2)[:200]}
        seen.add(m.group(1))
missing = sorted(names - set(res))
artifact = {
    "sf": base.get("sf", 1.0),
    "queries": dict(sorted(res.items())),
    "n_ok": sum(1 for v in res.values() if v["ok"]),
    "n_fail": sum(1 for v in res.values() if not v["ok"]),
    "not_run": missing,
}
json.dump(artifact, open(out, "w"), indent=1)
print(f"{artifact['n_ok']} ok, {artifact['n_fail']} fail, "
      f"{len(missing)} not run ({len(seen)} rows merged) -> {out}")
