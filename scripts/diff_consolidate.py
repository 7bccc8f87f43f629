#!/usr/bin/env python3
"""Diff reference vs Spark consolidation fixture outputs (dev harness)."""
import json
import sys

def load(path):
    j1, j2, cur = [], [], None
    for line in open(path, encoding="utf-8"):
        line = line.strip()
        if line == "== J1 ==":
            cur = j1
        elif line == "== J2 ==":
            cur = j2
        elif line.startswith("{"):
            cur.append(json.loads(line))
    return j1, j2

def norm(rows, keys):
    out = []
    for r in rows:
        d = {}
        for k in keys:
            v = r.get(k)
            if v in ("None", "NaT"):
                v = None
            d[k] = v
        out.append(d)
    return sorted(out, key=lambda d: json.dumps(d, sort_keys=True, ensure_ascii=False))

J1K = ["event_name", "event_datetime_local", "artist", "venue",
       "shotgun_tickets_sold", "dice_tickets_sold", "shotgun_event_id", "dice_event_id"]
J2K = ["canonical_event_key", "event_name", "event_datetime_local", "timezone",
       "tickets_sold_total_shotgun", "tickets_sold_total_dice",
       "scrape_ts_utc", "ingestion_run_id"]

ref_j1, ref_j2 = load(sys.argv[1])
sp_j1, sp_j2 = load(sys.argv[2])

ok = True
for name, keys, a, b in [("J1", J1K, ref_j1, sp_j1), ("J2", J2K, ref_j2, sp_j2)]:
    na, nb = norm(a, keys), norm(b, keys)
    if na == nb:
        print(f"{name}: MATCH ({len(na)} rows)")
    else:
        ok = False
        print(f"{name}: MISMATCH ref={len(na)} spark={len(nb)}")
        for r in na:
            if r not in nb:
                print("  only-ref:  ", json.dumps(r, sort_keys=True, ensure_ascii=False))
        for r in nb:
            if r not in na:
                print("  only-spark:", json.dumps(r, sort_keys=True, ensure_ascii=False))
sys.exit(0 if ok else 1)
