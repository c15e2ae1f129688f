#!/bin/bash
# Watch for the TPU relay (127.0.0.1:8082) to come back and run the
# queued round-4 measurement sequence (r4_measure.sh) exactly once.
# The relay is externally owned and has been connection-refused since
# mid-round-3; this lets the measurements start unattended the moment
# it returns. Probe is a bare socket connect (never a jax client — a
# jax touch of a half-up relay can wedge it; see
# .claude/skills/verify/SKILL.md).
# Usage: nohup bash benchmarks/relay_watch.sh [outdir] & echo $! > /tmp/relay_watch.pid
set -u
OUT=${1:-/tmp/r4_measure}
cd "$(dirname "$0")/.."

probe() { (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null && exec 3>&- ; }

while true; do
  if probe; then
    sleep 30            # let a just-restarted relay finish initialising
    if probe; then
      date -u +%FT%TZ > /tmp/relay_up.marker
      # long CPU evidence jobs register their PID here; stop them so the
      # measurement's host-side timings (decode/save pipeline) are clean
      if [ -f /tmp/r4_cpu_job.pid ]; then
        kill "$(cat /tmp/r4_cpu_job.pid)" 2>/dev/null
        rm -f /tmp/r4_cpu_job.pid
        sleep 5
      fi
      bash benchmarks/r4_measure.sh "$OUT" > /tmp/r4_measure_run.log 2>&1
      date -u +%FT%TZ > /tmp/r4_measure_done.marker
      exit 0
    fi
  fi
  sleep 60
done
