#!/usr/bin/env python3
"""Regenerate correctness-count claims in COVERAGE.md / SURVEY.md from the
newest CORRECTNESS_r*.json, so a red driver row can never coexist with a
green doc header (round-10 verdict item #2: the hand-written "163/163" and
"162/162" claims contradicted the driver's own output).

Usage: python3 tools/update_counts.py   (run from the repo root)

The docs carry `<!-- corr:begin -->` / `<!-- corr:end -->` markers; the text
between them is REPLACED with a sentence derived from the JSON. Run this
after every driver round (or after a local full Verify) before editing docs.
"""
import glob, json, re, sys

def latest_correctness():
    rounds = []
    for p in glob.glob("CORRECTNESS_r*.json"):
        m = re.match(r"CORRECTNESS_r(\d+)\.json$", p)
        if m:
            rounds.append((int(m.group(1)), p))
    if not rounds:
        sys.exit("no CORRECTNESS_r*.json found")
    return max(rounds)

def summarize(path):
    d = json.load(open(path))
    total = len(d)
    red = sorted(k for k, v in d.items()
                 if not (v.get("rows_match") and v.get("schema_match")
                         and v.get("hash_match")))
    return total, red

def splice(path, text):
    src = open(path).read()
    pat = re.compile(r"(<!-- corr:begin -->).*?(<!-- corr:end -->)", re.S)
    if not pat.search(src):
        sys.exit(f"{path}: corr markers missing")
    open(path, "w").write(pat.sub(lambda m: m.group(1) + text + m.group(2), src))
    print(f"updated {path}")

def main():
    rnd, path = latest_correctness()
    total, red = summarize(path)
    green = total - len(red)
    if red:
        tail = (f"; RED: {', '.join(red)} — fix before claiming the "
                "surface green")
    else:
        tail = ""
    sentence = (f"{green}/{total} catalog queries value-exact vs DuckDB at "
                f"sf0.01 per the driver's round-{rnd} gate "
                f"(CORRECTNESS_r{rnd}.json{tail})")
    splice("COVERAGE.md", sentence)
    splice("SURVEY.md", sentence)

if __name__ == "__main__":
    main()
