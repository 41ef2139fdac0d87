#!/bin/bash
# Run graft.Verify in the warm sbt tmux session ("sbt"), wait for it to
# finish (oracle_sql.json is written last), then diff against DuckDB.
# usage: tools/rv.sh <sfDir> <outDir> [query ...]
set -u
sf=$1; out=$2; shift 2
rm -f "$out/oracle_sql.json"
tmux clear-history -t sbt
tmux send-keys -t sbt "runMain graft.Verify $sf $out $*" Enter
for _ in $(seq 1 200); do [ -f "$out/oracle_sql.json" ] && break; sleep 2; done
if [ ! -f "$out/oracle_sql.json" ]; then
  echo "TIMEOUT or compile error; last pane lines:"
  tmux capture-pane -t sbt -p | tail -30
  exit 2
fi
sleep 2
fails=""
[ -n "$fails" ] && echo "$fails"
exec python3 "$(dirname "$0")/diff.py" "$sf" "$out" "$@"
