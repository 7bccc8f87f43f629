#!/usr/bin/env python3
"""Run the REFERENCE consolidation code on shared fixtures.

Emits JSON for diffing against the Spark engine's output on the same
fixtures (graft.VerifyConsolidate). Dev-harness only — never shipped;
the Scala engine does not depend on this.
"""
import json
import sys
from datetime import datetime

sys.path.insert(0, "/root/reference")

from concerts_etl.core.consolidate_events import consolidate_events  # noqa: E402
from concerts_etl.core.matching import merge_shotgun_dice  # noqa: E402
from concerts_etl.core.models import NormalizedEvent  # noqa: E402

SCRAPE = datetime(2026, 8, 1, 6, 0, 0)


def ev(provider, eid, name, dt, artist=None, venue=None, city=None, tickets=None):
    return NormalizedEvent(
        provider=provider, event_id_provider=eid, event_name=name,
        city=city, event_datetime_local=dt, timezone="Europe/Paris",
        status="on sale", tickets_sold_total=tickets,
        scrape_ts_utc=SCRAPE, ingestion_run_id="run-0",
        artist_name=artist, venue_name=venue)


SG = [
    ev("shotgun", "sg1", "Électro Fête @ Le Trianon", datetime(2026, 9, 10, 19, 30),
       artist="Électro Fête", venue="Le Trianon", tickets=100),
    ev("shotgun", "sg2", "DJ Snake Live", datetime(2026, 9, 10, 20, 0),
       city="Paris", tickets=200),
    ev("shotgun", "sg3", "Jazz Quartet", datetime(2026, 9, 11, 21, 0),
       artist="Jazz Quartet", tickets=50),
    ev("shotgun", "sg4", "Rock Night", None, tickets=5),
    ev("shotgun", "sg5", "Techno Bunker", datetime(2020, 1, 1, 23, 0), tickets=10),
    ev("shotgun", "sg6", "Mega Fest feat Alpha", datetime(2026, 9, 12, 18, 0),
       artist="Alpha & Beta", tickets=300),
    ev("shotgun", "sg7", "Beta Show Cover", datetime(2026, 9, 12, 20, 0),
       artist="Beta", tickets=60),
    # conflict pair: dc7 AND dc8 both prefer sg8; sequential greedy
    # hands the loser (dc8) its next-best (sg9)
    ev("shotgun", "sg8", "Gamma Delta Night", datetime(2026, 9, 13, 20, 0),
       artist="Gamma Delta", tickets=80),
    ev("shotgun", "sg9", "Gamma Solo", datetime(2026, 9, 13, 21, 0),
       artist="Gamma", tickets=20),
    # empty name: norm('')=='' and difflib ratio('','')==1.0, so an
    # empty-named DICE row within tolerance MUST match (matching.py
    # maps None/'' via `s or ''`)
    ev("shotgun", "sg10", "", datetime(2026, 9, 14, 20, 0), tickets=15),
    # cross-midnight: 23:50 vs next-day 00:10 is within 30 min but NOT
    # the same calendar day -> must NOT match in J2
    ev("shotgun", "sg11", "Midnight Run", datetime(2026, 9, 14, 23, 50),
       artist="Midnight Run", tickets=12),
]
DC = [
    ev("dice", "dc1", "Electro Fete", datetime(2026, 9, 10, 19, 35),
       artist="Electro Fête", tickets=90),
    ev("dice", "dc2", "Alpha", datetime(2026, 9, 12, 18, 0),
       artist="Alpha", tickets=80),
    ev("dice", "dc3", "Beta Show", datetime(2026, 9, 12, 19, 0),
       artist="Beta", tickets=70),
    ev("dice", "dc4", "Unknown Artist", datetime(2026, 9, 15, 21, 0), tickets=40),
    ev("dice", "dc5", "No Date", None, tickets=30),
    ev("dice", "dc6", "DJ Snake", datetime(2026, 9, 10, 20, 10), tickets=55),
    ev("dice", "dc7", "Gamma Delta", datetime(2026, 9, 13, 20, 5), tickets=45),
    ev("dice", "dc8", "Gamma Delta Show", datetime(2026, 9, 13, 20, 30), tickets=35),
    ev("dice", "dc9", "", datetime(2026, 9, 14, 20, 10), tickets=25),
    ev("dice", "dc10", "Midnight Run", datetime(2026, 9, 15, 0, 10), tickets=65),
    # canonical-key collision: same norm name, dts in the same 5-min
    # bucket -> same key; dict insert order means the LATER one wins
    ev("dice", "dc11", "Dup Key Show", datetime(2026, 9, 16, 21, 1), tickets=41),
    ev("dice", "dc12", "Dup Key Show", datetime(2026, 9, 16, 21, 3), tickets=42),
]

rows = consolidate_events(SG, DC)
print("== J1 ==")
for r in rows:
    print(json.dumps(r, sort_keys=True, ensure_ascii=False, default=str))

merged = merge_shotgun_dice(
    [e for e in SG], [e for e in DC], hour_tolerance_min=30, name_threshold=0.90)
print("== J2 ==")
for r in sorted(merged, key=lambda r: r.canonical_event_key):
    d = r.model_dump() if hasattr(r, "model_dump") else r.dict()
    d["event_datetime_local"] = str(d["event_datetime_local"])
    d["scrape_ts_utc"] = str(d["scrape_ts_utc"])
    print(json.dumps(d, sort_keys=True, ensure_ascii=False))
