#!/bin/bash
# Run a command in the sbt tmux shell with SPARK_GRAFT_CONF overrides, wait for a
# result line matching $2 (regex) to appear COUNT+1 times, print the newest.
CONF="$1"; PAT="$2"; shift 2; CMD="$*"
BEFORE=$(tmux capture-pane -t sbt -p -S -5000 | grep -c "$PAT")
tmux send-keys -t sbt "set run / envVars := Map(\"SPARK_GRAFT_SF_DIR\" -> \"/root/testdata/sf0.1\", \"SPARK_GRAFT_CONF\" -> \"$CONF\") ; $CMD" Enter
for i in $(seq 1 60); do
  sleep 5
  NOW=$(tmux capture-pane -t sbt -p -S -5000 | grep -c "$PAT")
  if [ "$NOW" -gt "$BEFORE" ]; then
    tmux capture-pane -t sbt -p -S -5000 | grep "$PAT" | tail -1; exit 0
  fi
done
echo "TIMEOUT"; exit 1
