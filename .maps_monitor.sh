#!/bin/bash
# monitor pytest's map count while the suite runs
while true; do
  pid=$(pgrep -f "pytest tests" | head -1)
  if [ -n "$pid" ]; then
    echo "$(date +%s) pid=$pid maps=$(wc -l < /proc/$pid/maps 2>/dev/null) fds=$(ls /proc/$pid/fd 2>/dev/null | wc -l)"
  fi
  sleep 20
done
