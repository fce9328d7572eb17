#!/bin/bash
# Run a command in the sbt tmux shell with SPARK_GRAFT_CONF overrides, wait
# for a result line matching $2 (regex) to appear after a unique run marker,
# print the newest. The marker (not a before/after match count) makes
# completion detection immune to old matches scrolling out of tmux history,
# and capture-pane -J rejoins wrapped lines so a ~3 KB Bench JSON line comes
# back intact instead of as an 80-column fragment.
CONF="$1"; PAT="$2"; shift 2; CMD="$*"
MARK="sbtrun_$(date +%s)_$$"
tmux send-keys -t sbt "set run / envVars := Map(\"SPARK_GRAFT_SF_DIR\" -> \"/root/testdata/sf0.1\", \"SPARK_GRAFT_CONF\" -> \"$CONF\") ; eval println(\"$MARK\") ; $CMD" Enter
for i in $(seq 1 60); do
  sleep 5
  OUT=$(tmux capture-pane -t sbt -p -J -S -5000 | sed -n "/$MARK/,\$p")
  if echo "$OUT" | grep -q "$PAT"; then
    echo "$OUT" | grep "$PAT" | tail -1; exit 0
  fi
done
echo "TIMEOUT"; exit 1
