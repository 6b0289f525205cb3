#!/bin/bash
# Round-close freeze guard (VERDICT r14 #4): the shipped tree must be
# the tested tree. sql_native_fns landed AFTER the r14 closing battery
# and shipped without a full sf0.1 re-sweep — this script makes that
# process hole mechanical:
#
#   1. Regenerates REGISTRY.md from the CURRENT tree (RegistryDump).
#      A non-empty `git diff REGISTRY.md` afterwards means the registry
#      changed since the last dump — i.e. code landed after the battery
#      that stamped it. The battery section of SURVEY must quote the
#      row count this script prints.
#   2. Fails (exit 1) if the working tree is dirty beyond REGISTRY.md
#      itself — the battery commit must be the LAST code commit of the
#      round.
#
# Usage: tools/freeze_check.sh   (from the repo root, after the battery)
set -euo pipefail
cd "$(dirname "$0")/.."

# a failed dump must fail LOUDLY (a non-compiling tree is exactly the
# drifted-tree case this guard exists for), never die silently with
# its diagnostics discarded
dump_log=$(mktemp)
if ! sbt -batch "runMain graft.RegistryDump" >"$dump_log" 2>&1; then
  echo "FREEZE VIOLATION: RegistryDump failed on this tree — sbt output:"
  tail -30 "$dump_log"
  rm -f "$dump_log"
  exit 1
fi
rm -f "$dump_log"

if ! git diff --quiet -- REGISTRY.md; then
  echo "FREEZE VIOLATION: REGISTRY.md changed on regeneration — the"
  echo "registry drifted since the last dump. Re-run the closing"
  echo "battery on this tree, commit, and re-check."
  git --no-pager diff --stat -- REGISTRY.md
  # leave the tree as we found it: a regenerated-but-different
  # REGISTRY.md left modified would confuse the next run's dirty
  # check (ADVICE r15)
  git checkout -- REGISTRY.md
  exit 1
fi

# Dirty check via pathspec excludes, not a porcelain-line grep: the
# old `grep -v '^.. REGISTRY.md$'` missed rename/copy porcelain lines
# ('R  old -> REGISTRY.md') (ADVICE r15). Driver-written per-round
# artifacts (BENCH/CORRECTNESS/LEAKCHECK) land AFTER the battery
# commit by design — a judge running this guard on the shipped tree
# must not see them as drift (VERDICT r15 #6); they carry no code.
dirty=$(git status --porcelain -- . \
  ':(exclude)REGISTRY.md' \
  ':(exclude)BENCH_r*.json' \
  ':(exclude)BENCH_DETAIL.json' \
  ':(exclude)CORRECTNESS_r*.json' \
  ':(exclude)LEAKCHECK.json' \
  ':(exclude)COPYCHECK.json' \
  ':(exclude)VERDICT.md' \
  ':(exclude)ADVICE.md')
if [ -n "$dirty" ]; then
  echo "FREEZE VIOLATION: uncommitted changes beyond REGISTRY.md and"
  echo "driver-written artifacts — the battery commit must be the last"
  echo "code commit of the round:"
  echo "$dirty"
  exit 1
fi

rows=$(grep -c '^- ' REGISTRY.md || true)
if [ "$rows" -eq 0 ]; then
  echo "FREEZE VIOLATION: REGISTRY.md lists zero rows — dump format drift?"
  exit 1
fi

# SURVEY header pin (VERDICT r16 #2): the top CURRENT STATE block must
# quote the live registry count — it drifted in r12 AND r16, each time
# misleading the next fresh-context reader. The first bold
# "N registry queries" line in the file IS the header's claim.
hdr=$(grep -oEm1 '\*\*[0-9]+ registry queries' SURVEY.md | grep -oE '[0-9]+' || true)
if [ -z "$hdr" ]; then
  echo "FREEZE VIOLATION: SURVEY.md header has no '**N registry queries' claim to pin"
  exit 1
fi
if [ "$hdr" -ne "$rows" ]; then
  echo "FREEZE VIOLATION: SURVEY.md header claims $hdr registry queries but"
  echo "REGISTRY.md lists $rows — update the CURRENT STATE block (it may not drift)."
  exit 1
fi

echo "FREEZE OK: registry rows = $rows (SURVEY header pinned at $hdr; the count"
echo "must equal len(CORRECTNESS_r{N}) when the driver artifact lands)"
