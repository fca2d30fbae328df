#!/bin/bash
# stallguard.sh <wall_timeout_s> <cpu_stall_s> -- cmd args...
#
# Runs cmd; kills it if EITHER the wall timeout expires OR the process's
# cumulative CPU time stops advancing for cpu_stall_s seconds (the axon
# tunnel's wedge signature: the client blocks forever in tcp_recvmsg
# while a fresh connection works fine — r5, 2026-08-20).  Exit 124 on
# wall timeout, 125 on stall-kill, else the command's status.
set -u
WALL=$1; STALL=$2; shift 2
[ "$1" = "--" ] && shift
"$@" &
PID=$!
START=$(date +%s)
last_cpu=""
last_change=$(date +%s)
while kill -0 $PID 2>/dev/null; do
  sleep 15
  now=$(date +%s)
  if [ $((now - START)) -ge "$WALL" ]; then
    echo "stallguard: wall timeout ${WALL}s — killing $PID" >&2
    kill $PID 2>/dev/null; sleep 2; kill -9 $PID 2>/dev/null
    wait $PID 2>/dev/null
    exit 124
  fi
  # whole-process CPU in SECONDS (ticks/100): background gRPC keepalive
  # threads burn a few ticks per minute even when wedged, so require a
  # full second of CPU progress to count as alive (r5: a wedge survived
  # the tick-granularity check for 25+ min)
  cpu=$(awk '{printf "%d", ($14+$15)/100}' /proc/$PID/stat 2>/dev/null || echo "")
  if [ -n "$cpu" ]; then
    if [ "$cpu" != "$last_cpu" ]; then
      last_cpu=$cpu
      last_change=$now
    elif [ $((now - last_change)) -ge "$STALL" ]; then
      echo "stallguard: CPU frozen ${STALL}s (wedged tunnel) — killing $PID" >&2
      kill $PID 2>/dev/null; sleep 2; kill -9 $PID 2>/dev/null
      wait $PID 2>/dev/null
      exit 125
    fi
  fi
done
wait $PID
exit $?
