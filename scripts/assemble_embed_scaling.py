#!/usr/bin/env python3
"""Assemble EMBED_INDEX_SCALING.json from EmbedIndexProbe's stdout
lines (two JSON lines per scale with SPARK_GRAFT_AUTOCOMPACT_SMOKE=1:
a strike row and an autocompact_smoke row), captured by
scripts/r12_chain_final.sh into /tmp/embed_probe_{sf01,x64}.jsonl."""
import json
import sys

def load(path):
    strike, smoke = None, None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            d = json.loads(line)
            if "autocompact_smoke" in d:
                smoke = d["autocompact_smoke"]
            else:
                strike = d
    if strike is None or smoke is None:
        sys.exit(f"{path}: missing strike or smoke line")
    return strike, smoke

s1, m1 = load("/tmp/embed_probe_sf01.jsonl")
s2, m2 = load("/tmp/embed_probe_x64.jsonl")

prev = json.load(open("EMBED_INDEX_SCALING.json"))
out = {
    "probe": "graft.queries.EmbedIndexProbe",
    "protocol": prev["protocol"],
    "geometry": prev["geometry"],
    "strikes": [s1, s2],
    "autocompact_smoke": [m1, m2],
    "note": prev["note"],
}
json.dump(out, open("EMBED_INDEX_SCALING.json", "w"), indent=1)
print("strike sf0.1 ratio", s1.get("ratio"), "| x64 ratio", s2.get("ratio"),
      "| smoke x64 probe plain/auto",
      m2.get("probe_p50_plain"), m2.get("probe_p50_autocompacted"))
