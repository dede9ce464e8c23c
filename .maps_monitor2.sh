#!/bin/bash
while true; do
  for p in $(pgrep -f "python -m pytest"); do
    exe=$(readlink /proc/$p/exe 2>/dev/null)
    case "$exe" in
      *python*) echo "$(date +%s) pid=$p maps=$(wc -l < /proc/$p/maps 2>/dev/null) fds=$(ls /proc/$p/fd 2>/dev/null | wc -l) rss=$(awk '/VmRSS/{print $2}' /proc/$p/status 2>/dev/null)";;
    esac
  done
  sleep 20
done
