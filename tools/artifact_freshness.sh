#!/bin/bash
# Artifact-freshness guard: a committed scale artifact must postdate the
# newest commit touching the engine source it measures. The r15 snapshot
# shipped a CORRECTNESS_sf10_subset.json carrying q163's PRE-fix pair
# count because the fixture fix (2053ede) landed after the last sf10
# oracle run — committed evidence contradicting committed prose. This
# guard makes that class mechanical: run standalone before committing
# scale artifacts, and the gate scripts run it after writing theirs.
#
# Usage: tools/artifact_freshness.sh ARTIFACT [ARTIFACT ...]
# Exit 1 if any named artifact exists on disk but is older than the
# newest commit touching src/main/scala (engine + fixture code).
set -e -o pipefail
cd "$(dirname "$0")/.."

newest_commit_ts=$(git log -1 --format=%ct -- src/main/scala 2>/dev/null || echo 0)
rc=0
# Uncommitted engine edits are invisible to the commit-timestamp check
# (and a fresh checkout resets file mtimes), so a dirty src/main/scala
# fails outright: an artifact can only be certified fresh against a
# tree whose state a commit hash names. (r16 advice finding.)
if [ -n "$(git status --porcelain src/main/scala 2>/dev/null)" ]; then
  echo "[freshness] FAIL: src/main/scala has uncommitted changes —" \
       "commit the engine state first, then regenerate/recheck artifacts"
  exit 1
fi
for f in "$@"; do
  [ -f "$f" ] || continue   # absent artifact = nothing to be stale
  file_ts=$(stat -c %Y "$f")
  if [ "$file_ts" -lt "$newest_commit_ts" ]; then
    echo "[freshness] STALE: $f ($(date -u -d @"$file_ts" +%FT%TZ))" \
         "predates the newest src/main/scala commit" \
         "($(git log -1 --format='%h %s' -- src/main/scala))" \
         "— regenerate before committing"
    rc=1
  else
    echo "[freshness] OK: $f"
  fi
done
exit $rc
