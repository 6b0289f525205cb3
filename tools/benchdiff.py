#!/usr/bin/env python3
"""Mechanize the round-over-round bench comparison SURVEY §16 quotes.

Usage: benchdiff.py BENCH_rA.json BENCH_rB.json [--threshold 0.5]

Compares per-query seconds between two driver bench artifacts, both
raw and normalized by each run's calib_sec (the fixed CPU probe that
separates machine drift from code changes — single-shot totals on the
shared build box swing +-50%, so only the calib-normalized view is
meaningful across days). Exit code = number of queries regressed by
more than the threshold in RAW seconds AND also regressed after calib
normalization — the standing zero-regression discipline: such a row
is a punch item, not noise.
"""
import json
import sys


def load(path):
    # Accepts: the driver's BENCH_r{N}.json (one object, bench line
    # wrapped under "parsed"), a raw single-line capture, or a raw
    # MULTI-line capture — graft.Bench prints the contract line (full
    # per-query map) and a summary line (calib_sec/views/slowest, with
    # only a slow-list excerpt under "queries"). Base = the line with
    # the LARGEST queries map; scalar fields the base lacks (calib_sec)
    # are adopted from the other lines.
    with open(path) as f:
        text = f.read()
    try:
        objs = [json.loads(text)]  # one (possibly pretty-printed) object
    except json.JSONDecodeError:
        objs = [json.loads(l) for l in text.splitlines() if l.strip().startswith("{")]
    objs = [o.get("parsed", o) for o in objs]
    if not objs:
        sys.exit(f"{path}: no JSON object lines")
    base = max(objs, key=lambda o: len(o.get("queries", {})))
    for o in objs:
        for k, v in o.items():
            if k != "queries" and k not in base:
                base[k] = v
    return base


def main():
    argv = sys.argv[1:]
    args = []
    thr = 0.5
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--threshold"):
            if "=" in a:
                thr = float(a.split("=", 1)[1])
            elif i + 1 < len(argv):  # space-separated form from the usage line
                i += 1
                thr = float(argv[i])
            else:
                sys.exit(__doc__)
        else:
            args.append(a)
        i += 1
    if len(args) != 2:
        sys.exit(__doc__)
    a, b = load(args[0]), load(args[1])
    qa, qb = a["queries"], b["queries"]
    ca, cb = a.get("calib_sec"), b.get("calib_sec")
    shared = sorted(set(qa) & set(qb))
    only_a = sorted(set(qa) - set(qb))
    only_b = sorted(set(qb) - set(qa))
    print(f"A: {args[0]}  total={a['value']:.1f}s  calib={ca}  n={len(qa)}")
    print(f"B: {args[1]}  total={b['value']:.1f}s  calib={cb}  n={len(qb)}")
    if ca and cb:
        print(f"total_per_calib: A={a['value']/ca:.1f}  B={b['value']/cb:.1f}"
              f"  (B/A={b['value']/cb/(a['value']/ca):.3f})")
    regressed = []
    rows = []
    for q in shared:
        d = qb[q] - qa[q]
        dn = (qb[q] / cb - qa[q] / ca) if ca and cb else None
        rows.append((d, dn, q))
        # raw AND normalized regression over threshold => real
        if d > thr and (dn is None or dn * min(ca, cb) > thr / 2):
            regressed.append((d, q))
    rows.sort(reverse=True)
    print(f"\nlargest deltas (B - A), raw s / calib-units ({len(shared)} shared):")
    shown = rows[:10] + [r for r in rows[-5:] if r not in rows[:10]]
    for d, dn, q in shown:
        print(f"  {d:+7.2f}  {('%+7.2f' % dn) if dn is not None else '    n/a'}  {q}")
    if only_a:
        print(f"\nonly in A ({len(only_a)}): {', '.join(only_a[:8])}")
    if only_b:
        print(f"only in B ({len(only_b)}): {', '.join(only_b[:8])}")
    if regressed:
        print(f"\nREGRESSED (> {thr}s raw, confirmed by calib view): ")
        for d, q in sorted(regressed, reverse=True):
            print(f"  +{d:.2f}s  {q}")
    else:
        print(f"\nno confirmed regression > {thr}s")
    # POSIX truncates exit codes mod 256: a count of exactly 256 would
    # read as success. Any regression => nonzero, capped.
    sys.exit(min(len(regressed), 255))


if __name__ == "__main__":
    main()
