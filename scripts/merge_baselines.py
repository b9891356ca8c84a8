#!/usr/bin/env python3
"""Fold a warm full-suite BENCH_SUMMARY into BASELINE_QUERIES.json by
per-key MIN (the record only ever tightens): the baseline file is the
regression gate's reference, so it must hold the best time each key
has demonstrated under the warm-suite protocol — solo runs are +-50%
noisy and must never be merged (see the A/B protocol note in the
repo memory/VERDICT history).

Keys present only in the summary are added; keys that vanished from
the suite are dropped (the gate would otherwise flag forever against
a retired spelling); keys whose IMPLEMENTATION changed this round
must be passed via --reset so their baseline is REPLACED, not
min-merged — the protocol's rule is that every recorded min is
attainable by the code it gates, and a retired implementation's min
is not. Usage:
  python3 scripts/merge_baselines.py <BENCH_SUMMARY.json> \
      [--reset k1,k2,...] [note]
"""
import json
import sys

args = sys.argv[1:]
RESET = set()
if "--reset" in args:
    i = args.index("--reset")
    RESET = set(args[i + 1].split(","))
    args = args[:i] + args[i + 2:]
SUMMARY = args[0]
NOTE = args[1] if len(args) > 1 else None
BASE = "/root/repo/BASELINE_QUERIES.json"


def main():
    s = json.load(open(SUMMARY))
    b = json.load(open(BASE))
    if s.get("sf") != b.get("sf"):
        sys.exit(f"sf mismatch: summary {s.get('sf')} vs base {b.get('sf')}")
    old = b["queries"]
    new = s["queries"]
    # a typo'd --reset key would silently min-merge the key it was
    # meant to replace, pinning a retired implementation's unattainable
    # minimum — refuse instead
    unknown = sorted(RESET - set(new))
    if unknown:
        sys.exit(f"--reset keys not in the summary: {unknown}")
    merged = {k: (new[k] if k in RESET or k not in old
                  else min(old[k], new[k]))
              for k in sorted(new)}
    dropped = sorted(set(old) - set(new))
    tightened = sorted(k for k in merged
                       if k in old and merged[k] < old[k] - 1e-9)
    b["queries"] = merged
    b["total"] = round(sum(merged.values()), 3)
    # record the MIN of the merging runs' scheduling floors so the
    # bench's floor-aware baseline comparison can difference each side
    # by its own floor. Min, not latest: per-key times are per-round
    # MINS, so most recorded values were set under the smallest floor
    # seen — carrying a later, larger floor would subtract too much
    # from the baseline side and one-sidedly overstate regressions.
    if s.get("floor_sec") is not None:
        b["floor_sec"] = (s["floor_sec"] if b.get("floor_sec") is None
                          else min(b["floor_sec"], s["floor_sec"]))
    if NOTE:
        b["note"] = NOTE
    elif b.pop("note", None) is not None:
        # a carried-forward note would describe a STALE round's
        # adjudication next to freshly merged numbers — drop it and say so
        print("note: previous round's note dropped (none supplied)")
    json.dump(b, open(BASE, "w"), indent=1)
    print(f"merged {len(new)} keys: {len(tightened)} tightened, "
          f"{len(dropped)} dropped ({dropped}), total={b['total']}")


if __name__ == "__main__":
    main()
