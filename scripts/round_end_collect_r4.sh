#!/bin/bash
# Safety net: when the RD refit sweep and the perf window both finish,
# copy the perf-window measurements into the repo and commit the round-4
# evidence artifacts, so a session/round cutover cannot strand them in
# /tmp.  Skips the commit if a human (or agent) session holds staged
# changes at that moment.
set -u
cd /root/repo
LOG=/tmp/collect_r4.log
say() { echo "[collect] $(date -u +%H:%M:%S) $*" >> "$LOG"; }

for pidfile in /tmp/refits.pid /tmp/fit_current.pid /tmp/perfwin.pid; do
  while kill -0 "$(cat $pidfile 2>/dev/null)" 2>/dev/null; do sleep 60; done
done
say "refits + perf window done"

mkdir -p artifacts/perf_r4
cp -r /tmp/perfwin/. artifacts/perf_r4/ 2>/dev/null || true

if ! git diff --cached --quiet; then
  say "index busy — leaving commit to the live session"
  exit 0
fi
git add artifacts/rd_r4 artifacts/perf_r4 2>/dev/null
git commit -q -m "Round-4 RD refit sweep artifacts and perf-window measurements" \
  && say "committed" || say "nothing to commit"
